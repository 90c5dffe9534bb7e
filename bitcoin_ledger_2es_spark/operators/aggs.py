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
    # internal aliases are INDEX-based: user keys (e.g. the ES-default
    # "*-50.0" / "50.0-150.0" forms) may contain dots or backticks that
    # F.col would misparse as struct accessors
    for i, (_, cond) in enumerate(branches):
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"__c_{i}"))
        for j, (_, fn) in enumerate(named):
            aggs.append(fn(cond).alias(f"__m_{i}_{j}"))
    rows = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(key).alias("key"),
            F.col(f"__c_{i}").cast("long").alias("doc_count"),
            *[F.col(f"__m_{i}_{j}").alias(n) for j, (n, _) in enumerate(named)],
        )
        for i, (key, _) in enumerate(branches)
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
    named = _as_masked(metrics)
    aggs = []
    # index-based internal aliases — see range_agg (user keys may contain
    # characters F.col would misparse)
    for i, (_, cond) in enumerate(filters.items()):
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"__c_{i}"))
        for j, (_, fn) in enumerate(named):
            aggs.append(fn(cond).alias(f"__m_{i}_{j}"))
    rows = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(key).alias("key"),
            F.col(f"__c_{i}").cast("long").alias("doc_count"),
            *[F.col(f"__m_{i}_{j}").alias(n) for j, (n, _) in enumerate(named)],
        )
        for i, key in enumerate(filters)
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


def extended_stats(df: DataFrame, field: str, sigma: float = 2.0) -> DataFrame:
    """ES extended_stats agg: one row with count, min, max, avg, sum,
    sum_of_squares, variance (population — the ES default, and exactly
    ES's own formula: sum_of_squares/count - avg^2), std_deviation and
    the sigma bounds (avg +/- sigma * std). One aggregate pass; only
    plain sums, so map-side partials survive. The derived moments are
    CLOSED FORMS over (count, sum, sum_of_squares) rather than
    var_pop/stddev_pop, so an oracle computing the same expressions over
    the same sums reproduces them bit-for-bit (for integer-valued fields
    the sums themselves are exact, hence order-independent)."""
    c = F.col(field).cast("double")
    row = df.agg(
        F.count(c).alias("count"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.sum(c).alias("sum"),
        F.sum(c * c).alias("sum_of_squares"),
    )
    avg = F.col("sum") / F.col("count")
    var = F.col("sum_of_squares") / F.col("count") - avg * avg
    s = F.lit(float(sigma))
    return (
        row.withColumn("avg", avg)
        .withColumn("variance", var)
        .withColumn("std_deviation", F.sqrt(var))
        .withColumn("std_upper", F.col("avg") + s * F.col("std_deviation"))
        .withColumn("std_lower", F.col("avg") - s * F.col("std_deviation"))
        .select(
            "count", "min", "max", "avg", "sum", "sum_of_squares",
            "variance", "std_deviation", "std_upper", "std_lower",
        )
    )


def value_count_missing(df: DataFrame, col: Column) -> DataFrame:
    """ES value_count + missing aggs in one pass over a (possibly
    computed) column: (value_count, missing) counts of non-null / null."""
    return df.agg(
        F.count(col).alias("value_count"),
        F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("long").alias("missing"),
    )


def adjacency_matrix(df: DataFrame, filters: dict[str, Column]) -> DataFrame:
    """ES adjacency_matrix agg: a bucket per named filter plus one per
    PAIRWISE intersection (key "a&b" in ES's key order), all from ONE
    conditional-aggregation pass — n + n(n-1)/2 sums over a single scan,
    never a self-join. Empty intersection buckets are dropped (ES
    behavior). Returns (key, doc_count) in filter order then pair order."""
    names = list(filters)
    cells: list[tuple[str, Column]] = [(n, filters[n]) for n in names]
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            cells.append((f"{a}&{b}", filters[a] & filters[b]))
    rows = df.agg(*[
        F.sum(F.when(cond, 1).otherwise(0)).alias(f"__c_{i}")
        for i, (_, cond) in enumerate(cells)
    ])
    structs = [
        F.struct(
            F.lit(key).alias("key"),
            F.col(f"__c_{i}").cast("long").alias("doc_count"),
        )
        for i, (key, _) in enumerate(cells)
    ]
    return (
        rows.select(F.explode(F.array(*structs)).alias("b"))
        .select("b.*")
        .filter(F.col("doc_count") > 0)
    )


# ---- pipeline aggregations over a bucketed frame (ES parent/sibling
# pipelines: the input is the OUTPUT of a histogram/terms agg — tiny
# relative to the corpus, so window functions over it are scale-free)


def moving_fn(
    df: DataFrame, order_col: str, value_col: str, window: int,
    fn: str = "avg", out: str = "moving_fn",
) -> DataFrame:
    """ES moving_fn pipeline agg (shift=0 default): ``fn`` over the
    ``window`` buckets BEFORE the current one, exclusive — [i-window, i).
    Null while the window is empty (first bucket), like ES's
    MovingFunctions on an empty window. fn: avg | sum | min | max."""
    from pyspark.sql import Window as W

    agg = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}[fn]
    w = W.orderBy(order_col).rowsBetween(-window, -1)
    return df.withColumn(out, agg(F.col(value_col)).over(w))


def serial_diff(
    df: DataFrame, order_col: str, value_col: str, lag: int = 1,
    out: str = "serial_diff",
) -> DataFrame:
    """ES serial_diff pipeline agg: value minus the value ``lag`` buckets
    earlier (null until the lag is available)."""
    from pyspark.sql import Window as W

    w = W.orderBy(order_col)
    return df.withColumn(
        out, F.col(value_col) - F.lag(value_col, lag).over(w)
    )


def bucket_selector(df: DataFrame, cond: Column) -> DataFrame:
    """ES bucket_selector pipeline agg: drop buckets failing the
    predicate — evaluated AFTER sibling pipelines (derivative etc.), so
    call it last; it is a plain filter over the bucket frame."""
    return df.filter(cond)


def bucket_sort(
    df: DataFrame, sort: list[tuple[str, str]], size: int | None = None,
    from_: int = 0,
) -> DataFrame:
    """ES bucket_sort pipeline agg: re-order buckets by any columns
    (including pipeline outputs) with from/size truncation. Callers
    should include a tie-breaking unique column for a total order."""
    cols = [F.col(c).desc() if d == "desc" else F.col(c).asc() for c, d in sort]
    out = df.orderBy(*cols)
    if from_ or size is not None:
        out = out.offset(from_) if from_ else out
        if size is not None:
            out = out.limit(size)
    return out


def significant_text(
    fg_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    cfg=None,
    size: int = 10,
    min_doc_count: int = 3,
) -> DataFrame:
    """ES significant_text agg: terms from the FREE TEXT of a query's
    match set (``fg_docs`` — any frame with a doc_id column, e.g.
    BM25Searcher.match_docs output) that are unusually frequent vs the
    background ``corpus`` (doc_id, text). JLH heuristic, doc-frequency
    based on DISTINCT (doc, term) pairs — exactly significant_terms but
    with the foreground defined by a query and the terms produced by the
    ANALYZER over text instead of a keyword field. One corpus
    tokenization serves both frequencies (the foreground reuses it via a
    semi join), one term-keyed aggregation each — no re-analysis of the
    match set, no driver-side text. Returns (term, fg_df, bg_df, jlh),
    top ``size`` by (jlh desc, term asc)."""
    from ..config import DEFAULT
    from ..functions.analyze import tokenize_sql_builtin

    cfg = cfg or DEFAULT
    tok = corpus.select(
        "doc_id",
        F.explode(
            F.array_distinct(tokenize_sql_builtin(F.col(text_col), cfg))
        ).alias("term"),
    )
    fg_ids = fg_docs.select("doc_id").distinct()
    n_bg = corpus.count()
    n_fg = fg_ids.count()
    if n_fg == 0:
        return corpus.sparkSession.createDataFrame(
            [], "term string, fg_df long, bg_df long, jlh double"
        )
    bg = tok.groupBy("term").agg(F.count("*").alias("bg_df"))
    fg = (
        tok.join(fg_ids, "doc_id", "semi")
        .groupBy("term")
        .agg(F.count("*").alias("fg_df"))
    )
    fgp = F.col("fg_df") / F.lit(float(n_fg))
    bgp = F.col("bg_df") / F.lit(float(n_bg))
    return (
        fg.join(bg, "term")
        .filter(F.col("fg_df") >= min_doc_count)
        .withColumn("jlh", (fgp - bgp) * (fgp / bgp))
        .orderBy(F.desc("jlh"), F.asc("term"))
        .limit(size)
        .select("term", "fg_df", "bg_df", "jlh")
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
