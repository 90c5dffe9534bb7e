"""ES aggregation builders beyond the core set (B10-B16): histogram,
range, filters, rare_terms, and terms-with-sub-aggregations — each a thin
declarative composition over DataFrame groupBy/agg so Catalyst keeps
partial aggregation (map-side combine), predicate pushdown, and
whole-stage codegen on the scale path. No collects, no UDFs.

ES semantics notes (Elasticsearch aggs reference):

  * ``histogram``: bucket key = floor(value / interval) * interval;
    buckets with < min_doc_count docs are dropped (ES default
    min_doc_count=0 materializes empty buckets only within bounds — we
    keep the sparse behavior, min_doc_count >= 1).
  * ``range``: ``from`` inclusive, ``to`` exclusive, unbounded ends
    allowed; a doc lands in every range containing it (ranges may
    overlap in ES — each range is an independent filter).
  * ``filters``: named independent predicates, one bucket each.
  * ``rare_terms``: terms with doc_count <= max_doc_count, ordered
    doc_count ASC (the long tail the terms agg's size-cap hides).
  * ``terms`` + sub-aggs: per-bucket metric aggregations; ``order_by``
    may name a sub-agg (ES "order": {"my_avg": "desc"}) — the bucket
    ranking the plain terms agg cannot express.

These run over any DataFrame — a raw table or a query match set
(BM25Searcher.match_docs), which is how ES couples "query" + "aggs" in
one request."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def histogram(
    df: DataFrame,
    field: str,
    interval: float,
    min_doc_count: int = 1,
    metrics: dict[str, Column] | None = None,
) -> DataFrame:
    """ES histogram agg: fixed-interval numeric buckets. Returns
    (bucket, doc_count, *metrics) with bucket = floor(field/interval) *
    interval (double, the ES key), ordered bucket asc."""
    bucket = (F.floor(F.col(field) / F.lit(interval)) * F.lit(interval)).cast(
        "double"
    )
    aggs = [F.count("*").alias("doc_count")] + [
        c.alias(n) for n, c in (metrics or {}).items()
    ]
    out = df.groupBy(bucket.alias("bucket")).agg(*aggs)
    if min_doc_count > 0:
        out = out.filter(F.col("doc_count") >= min_doc_count)
    return out.orderBy("bucket")


def range_agg(
    df: DataFrame,
    field: str,
    ranges: list[tuple[str, float | None, float | None]],
    metrics: dict[str, Column] | None = None,
) -> DataFrame:
    """ES range agg: ``ranges`` = (key, from_inclusive, to_exclusive),
    None = unbounded. Each range is an independent filter bucket (they
    may overlap), evaluated in ONE pass: every range becomes a
    conditional aggregate over the same scan, then unpivots to (key,
    doc_count, *metrics) rows in the given range order."""
    branches = []
    for key, lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(field) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(field) < F.lit(hi))
        branches.append((key, cond))
    named = _as_masked(metrics)
    aggs = []
    for key, cond in branches:
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"__c_{key}"))
        for n, fn in named:
            aggs.append(fn(cond).alias(f"__m_{key}_{n}"))
    rows = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(key).alias("key"),
            F.col(f"__c_{key}").cast("long").alias("doc_count"),
            *[F.col(f"__m_{key}_{n}").alias(n) for n, _ in named],
        )
        for key, _ in branches
    ]
    return rows.select(F.explode(F.array(*structs)).alias("b")).select("b.*")


def _as_masked(metrics: dict[str, Column] | None):
    """Metric specs for range/filters aggs are CALLABLES cond -> Column
    (e.g. ``lambda c: F.avg(F.when(c, F.col("value")))``) so one scan
    serves every bucket; plain Columns are not maskable per-bucket."""
    if not metrics:
        return []
    out = []
    for n, c in metrics.items():
        if not callable(c):
            raise TypeError(
                f"range/filters metric '{n}' must be a callable cond -> "
                "aggregate Column (single-pass conditional aggregation)"
            )
        out.append((n, c))
    return out


def filters_agg(
    df: DataFrame,
    filters: dict[str, Column],
    metrics=None,
) -> DataFrame:
    """ES filters agg: one named bucket per independent predicate, all
    evaluated in ONE aggregate pass (conditional sums), emitted in the
    given order as (key, doc_count, *metrics)."""
    names = [n for n, _ in _as_masked(metrics)]
    aggs = []
    for key, cond in filters.items():
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"__c_{key}"))
        for n, fn in _as_masked(metrics):
            aggs.append(fn(cond).alias(f"__m_{key}_{n}"))
    rows = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(key).alias("key"),
            F.col(f"__c_{key}").cast("long").alias("doc_count"),
            *[F.col(f"__m_{key}_{n}").alias(n) for n in names],
        )
        for key in filters
    ]
    return rows.select(F.explode(F.array(*structs)).alias("b")).select("b.*")


def rare_terms(
    df: DataFrame, field: str, max_doc_count: int = 1
) -> DataFrame:
    """ES rare_terms agg: buckets whose doc_count <= max_doc_count,
    ordered (doc_count asc, key asc) — the inverse of the terms agg's
    head. Exact (one groupBy); ES's CuckooFilter approximation is a
    memory optimization we don't need with spillable aggregation."""
    return (
        df.groupBy(F.col(field).alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .filter(F.col("doc_count") <= max_doc_count)
        .orderBy(F.asc("doc_count"), F.asc("key"))
    )


def terms_agg(
    df: DataFrame,
    field: str,
    size: int = 10,
    subaggs: dict[str, Column] | None = None,
    order_by: tuple[str, str] = ("_count", "desc"),
) -> DataFrame:
    """ES terms agg with sub-aggregations: per-bucket metrics computed in
    the same groupBy pass; ``order_by`` ranks buckets by ``_count``,
    ``_key``, or any sub-agg NAME (the ES "order": {"sub": "desc"}
    shape), ties broken by key asc for a total order; top ``size``."""
    aggs = [F.count("*").alias("doc_count")] + [
        c.alias(n) for n, c in (subaggs or {}).items()
    ]
    out = df.groupBy(F.col(field).alias("key")).agg(*aggs)
    name, direction = order_by
    col = {"_count": F.col("doc_count"), "_key": F.col("key")}.get(
        name, F.col(name)
    )
    ordered = [col.desc() if direction == "desc" else col.asc(), F.asc("key")]
    return out.orderBy(*ordered).limit(size)
