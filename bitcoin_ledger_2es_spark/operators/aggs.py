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


def change_point(
    df: DataFrame, order_col: str, value_col: str, min_seg: int = 2,
) -> DataFrame:
    """ES change_point sibling pipeline agg (8.10+, x-pack ml-aggs) —
    DETERMINISTIC step-change reading. ES runs a battery of statistical
    tests (spike / dip / step_change / trend_change / distribution_change)
    whose p-values come from iterative numeric approximations; this
    engine implements the step-change detector as a pure function of the
    bucket series (the documented-deviation convention of
    categorize_text / sampler): for every split i in
    [min_seg, n - min_seg]

        stat(i) = |mean(v[1..i]) - mean(v[i+1..n])| * sqrt(i*(n-i)/n)

    (the two-sample z-numerator; means are exact ratios when the metric
    is integer-valued, so the f64 expression is bit-mirrorable by any
    SQL oracle), and the change point is the FIRST bucket of the right
    segment at the argmax split — ties broken toward the smallest i.

    Input is an already-bucketed frame with UNIQUE ``order_col`` keys
    (a duplicate key would make the row_number sequence nondeterministic
    — the caller owns bucketing, same as every pipeline agg above); the
    unpartitioned windows are scale-free because the series is k rows by
    construction.

    Returns ONE row: (``order_col`` of the change point,
    type='step_change', statistic, left_mean, right_mean); a series
    shorter than 2*min_seg yields type='indeterminable' with null
    key/statistic (ES answers the same way on too-short input)."""
    from pyspark.sql import Window as W

    w = W.orderBy("__key")
    tot = df.agg(
        F.count("*").cast("long").alias("__n"),
        F.sum(F.col(value_col).cast("double")).alias("__tot"),
    )
    splits = (
        df.select(
            F.col(order_col).alias("__key"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .withColumn("__i", F.row_number().over(w).cast("long"))
        .withColumn("__ps", F.sum("__v").over(w))
        .withColumn("__next", F.lead("__key").over(w))
        .crossJoin(F.broadcast(tot))
        .filter(
            (F.col("__i") >= F.lit(min_seg))
            & (F.col("__i") <= F.col("__n") - F.lit(min_seg))
        )
        .select(
            F.col("__next").alias("key"),
            F.lit("step_change").alias("type"),
            (
                F.abs(
                    F.col("__ps") / F.col("__i")
                    - (F.col("__tot") - F.col("__ps"))
                    / (F.col("__n") - F.col("__i"))
                )
                * F.sqrt(
                    (F.col("__i") * (F.col("__n") - F.col("__i")))
                    .cast("double") / F.col("__n")
                )
            ).alias("statistic"),
            (F.col("__ps") / F.col("__i")).alias("left_mean"),
            (
                (F.col("__tot") - F.col("__ps"))
                / (F.col("__n") - F.col("__i"))
            ).alias("right_mean"),
            F.col("__i").alias("__split"),
            F.lit(0).alias("__fb"),
        )
    )
    key_t = df.schema[order_col].dataType.simpleString()
    fallback = tot.select(
        F.lit(None).cast(key_t).alias("key"),
        F.lit("indeterminable").alias("type"),
        F.lit(None).cast("double").alias("statistic"),
        F.lit(None).cast("double").alias("left_mean"),
        F.lit(None).cast("double").alias("right_mean"),
        F.lit(0).cast("long").alias("__split"),
        F.lit(1).alias("__fb"),
    )
    # top-1 on (real-before-fallback, stat desc, split asc): the argmax
    # split if any split exists, else the indeterminable row
    return (
        splits.unionByName(fallback)
        .orderBy(F.asc("__fb"), F.desc("statistic"), F.asc("__split"))
        .limit(1)
        .drop("__split", "__fb")
    )


def bucket_script(df: DataFrame, expr: Column, out: str = "bucket_script") -> DataFrame:
    """ES bucket_script pipeline agg: a per-bucket computed metric from
    the bucket's other metrics (a parent pipeline — evaluated per bucket
    BEFORE bucket_selector, exactly like derivative). A plain projection
    over the bucket frame; ES's Painless script becomes a Column
    expression, which also makes it oracle-mirrorable."""
    return df.withColumn(out, expr)


def percentiles_bucket(
    df: DataFrame, metric_col: str, percents: list[float] = (25.0, 50.0, 75.0)
) -> DataFrame:
    """ES percentiles_bucket sibling pipeline agg: EXACT interpolated
    percentiles of a metric across the buckets of an aggregated frame
    (ES computes these exactly too — sibling inputs are the complete,
    small bucket list, no TDigest involved). One row, one column per
    percent (p25, p50, ...); feed integer-exact bucket metrics and the
    quantile_cont twin mirrors bit-for-bit."""
    c = F.col(metric_col).cast("double")
    return df.agg(*[
        F.percentile(c, F.lit(float(p) / 100.0)).alias(f"p{p:g}")
        for p in percents
    ])


def extended_stats_bucket(df: DataFrame, metric_col: str, sigma: float = 2.0) -> DataFrame:
    """ES extended_stats_bucket sibling pipeline agg: the full
    extended_stats moment set computed ACROSS buckets — exactly
    extended_stats applied to the bucket frame (same closed forms over
    (count, sum, sum_of_squares), same oracle recipe)."""
    return extended_stats(df, metric_col, sigma=sigma)


def min_bucket(df: DataFrame, key_col: str, metric_col: str) -> DataFrame:
    """ES min_bucket sibling pipeline agg: the minimum of a metric across
    buckets PLUS the list of bucket keys attaining it (ES returns
    ``keys``, plural — ties are real). One row (value, keys) with keys
    sorted ascending and comma-joined, so it string-mirrors in SQL twins
    (DuckDB: string_agg over the min-filtered frame). Two tiny aggregates
    over an already-bucket-bounded frame — no window, no collect."""
    return _extreme_bucket(df, key_col, metric_col, F.min)


def max_bucket(df: DataFrame, key_col: str, metric_col: str) -> DataFrame:
    """ES max_bucket sibling pipeline agg: max across buckets + attaining
    keys (sorted asc, comma-joined). See :func:`min_bucket`."""
    return _extreme_bucket(df, key_col, metric_col, F.max)


def _extreme_bucket(df: DataFrame, key_col: str, metric_col: str, agg) -> DataFrame:
    ext = df.agg(agg(F.col(metric_col)).alias("value"))
    return (
        df.join(F.broadcast(ext), F.col(metric_col) == F.col("value"))
        .groupBy("value")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.col(key_col).cast("string"))), ","
            ).alias("keys")
        )
        .select("value", "keys")
    )


def sum_bucket(df: DataFrame, metric_col: str) -> DataFrame:
    """ES sum_bucket sibling pipeline agg — the sum column of
    :func:`stats_bucket` (kept as a named ES-parity surface)."""
    return df.agg(F.sum(F.col(metric_col)).alias("value"))


def avg_bucket(df: DataFrame, metric_col: str) -> DataFrame:
    """ES avg_bucket sibling pipeline agg — closed-form sum/count like
    :func:`stats_bucket` (mirror the division in oracles, not avg())."""
    c = F.col(metric_col)
    return df.agg((F.sum(c).cast("double") / F.count(c)).alias("value"))


def moving_percentiles(
    df: DataFrame, order_col: str, value_col: str, window: int,
    percents: list[float] = (50.0,), prefix: str = "mov_p",
) -> DataFrame:
    """ES moving_percentiles pipeline agg (shift=0): exact interpolated
    percentiles over the ``window`` buckets BEFORE the current one,
    exclusive — the same [i-window, i) frame as :func:`moving_fn` (ES
    computes these from the window's TDigest; bucket windows are tiny,
    so exact interpolation is both stronger and oracle-mirrorable —
    DuckDB twin: quantile_cont(x, p) OVER (ORDER BY ... ROWS BETWEEN
    window PRECEDING AND 1 PRECEDING)). Null while the window is empty
    (first bucket)."""
    from pyspark.sql import Window as W

    w = W.orderBy(order_col).rowsBetween(-window, -1)
    out = df
    for p in percents:
        out = out.withColumn(
            f"{prefix}{p:g}",
            F.percentile(F.col(value_col).cast("double"), F.lit(p / 100.0)).over(w),
        )
    return out


def significant_text(
    fg_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    cfg=None,
    size: int = 10,
    min_doc_count: int = 3,
    heuristic: str = "jlh",
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
    match set, no driver-side text. Returns (term, fg_df, bg_df,
    <heuristic>), top ``size`` by (score desc, term asc).

    ``heuristic`` selects the ES significance scorer, each the STANDARD
    statistical formula over the 2x2 contingency table a = fg_df,
    b = n_fg - a, c = bg_df - a, d = n_bg - n_fg - c (ES's
    background_is_superset=true reading — the foreground is part of the
    background):

      * ``jlh``: (fgp - bgp) * (fgp / bgp) — the ES default blend of
        absolute and relative change.
      * ``chi_square``: N * (ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d)) —
        Pearson's chi-squared on the table.
      * ``mutual_information``: sum over the four cells of
        p(x,y) * log2(p(x,y) / (p(x) p(y))), empty cells contribute 0.
      * ``percentage``: a / bg_df — foreground share of the term's
        documents.

    All are pure column arithmetic over the same two aggregates —
    switching heuristics never changes the plan."""
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
    if heuristic == "jlh":
        score = (fgp - bgp) * (fgp / bgp)
    elif heuristic in ("chi_square", "mutual_information"):
        a = F.col("fg_df").cast("double")
        b = F.lit(float(n_fg)) - a
        c = F.col("bg_df").cast("double") - a
        d = F.lit(float(n_bg - n_fg)) - c
        n = F.lit(float(n_bg))
        if heuristic == "chi_square":
            num = n * (a * d - b * c) * (a * d - b * c)
            den = (a + b) * (c + d) * (a + c) * (b + d)
            score = F.when(den > 0, num / den)
        else:
            ln2 = 0.6931471805599453

            def _cell(joint, mx, my):
                p = joint / n
                return F.when(
                    joint > 0,
                    p * (F.log(p / ((mx / n) * (my / n))) / F.lit(ln2)),
                ).otherwise(F.lit(0.0))

            score = (
                _cell(a, a + b, a + c) + _cell(b, a + b, b + d)
                + _cell(c, c + d, a + c) + _cell(d, c + d, b + d)
            )
    elif heuristic == "percentage":
        score = F.col("fg_df").cast("double") / F.col("bg_df").cast("double")
    else:
        raise ValueError(f"unknown significance heuristic: {heuristic}")
    return (
        fg.join(bg, "term")
        .filter(F.col("fg_df") >= min_doc_count)
        .withColumn(heuristic, score)
        .orderBy(F.desc(heuristic), F.asc("term"))
        .limit(size)
        .select("term", "fg_df", "bg_df", heuristic)
    )


def multi_terms(
    df: DataFrame,
    fields: list[str],
    size: int = 10,
    subaggs: dict[str, Column] | None = None,
    order_by: tuple[str, str] = ("_count", "desc"),
    sep: str = "|",
) -> DataFrame:
    """ES multi_terms agg: buckets keyed by the COMBINATION of several
    fields (ES emits a key array; we emit the values joined by ``sep``,
    ES's own ``key_as_string`` uses the same join). One groupBy over the
    composite key — identical shuffle shape to a single-field terms agg;
    ordered by doc_count (or a sub-agg) desc, key asc ties, top ``size``."""
    key = F.concat_ws(sep, *[F.col(f).cast("string") for f in fields])
    aggs = [F.count("*").alias("doc_count")] + [
        c.alias(n) for n, c in (subaggs or {}).items()
    ]
    out = df.groupBy(key.alias("key")).agg(*aggs)
    name, direction = order_by
    col = {"_count": F.col("doc_count"), "_key": F.col("key")}.get(
        name, F.col(name)
    )
    ordered = [col.desc() if direction == "desc" else col.asc(), F.asc("key")]
    return out.orderBy(*ordered).limit(size)


def weighted_avg(df: DataFrame, value: Column, weight: Column) -> DataFrame:
    """ES weighted_avg agg: sum(value * weight) / sum(weight), one row
    (weighted_avg, value_count). Rows where either side is null are
    skipped entirely (ES default missing behavior: the document is
    ignored). f64 plain sums — map-side partials survive, and the same
    two sums are mirrorable exactly in SQL."""
    both = F.when(value.isNotNull() & weight.isNotNull(), F.lit(True))
    v = F.when(both, value.cast("double"))
    w = F.when(both, weight.cast("double"))
    return df.agg(
        (F.sum(v * w) / F.sum(w)).alias("weighted_avg"),
        F.count(v).alias("value_count"),
    )


def percentile_ranks(
    df: DataFrame, field: str, values: list[float]
) -> DataFrame:
    """ES percentile_ranks agg, EXACT: for each threshold, the percent of
    observed values <= threshold (the CDF ES's t-digest approximates;
    with the digest replaced by exact conditional counts the result is
    deterministic and oracle-mirrorable). One conditional-aggregation
    pass; returns (key, percent) in the given threshold order."""
    c = F.col(field)
    n = F.count(c)
    aggs = [n.alias("__n")] + [
        F.sum(F.when(c <= F.lit(float(v)), 1).otherwise(0)).alias(f"__le_{i}")
        for i, v in enumerate(values)
    ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(str(float(v))).alias("key"),
            (F.col(f"__le_{i}") * 100.0 / F.col("__n")).alias("percent"),
        )
        for i, v in enumerate(values)
    ]
    return row.select(F.explode(F.array(*structs)).alias("b")).select("b.*")


def string_stats(df: DataFrame, col: Column) -> DataFrame:
    """ES string_stats agg (with show_distribution's entropy): one row of
    (count, min_length, max_length, avg_length, entropy). Entropy is
    Shannon base-2 over the CHARACTER distribution of all collected
    values (ES's definition). Lengths come from one aggregate pass;
    the char distribution is a second pass that explodes characters
    ((?s). regex so newlines count) then folds -sum(p*log2(p)) over the
    tiny per-char count table. Both passes are plain map-side-partial
    aggregations; no UDFs."""
    lens = df.agg(
        F.count(col).alias("count"),
        F.min(F.length(col)).cast("long").alias("min_length"),
        F.max(F.length(col)).cast("long").alias("max_length"),
        F.avg(F.length(col)).alias("avg_length"),
    )
    chars = (
        df.select(F.explode(F.regexp_extract_all(col, F.lit("(?s)."), 0)).alias("ch"))
        .groupBy("ch")
        .agg(F.count("*").alias("n"))
    )
    # -sum(p log2 p) = log2(total) - sum(n*log2 n)/total: one aggregate
    # over the tiny per-char table, no second pass for the total
    ent = chars.agg(
        (
            F.log2(F.sum("n"))
            - F.sum(F.col("n") * F.log2(F.col("n"))) / F.sum("n")
        ).alias("entropy")
    )
    return lens.crossJoin(ent)


def top_metrics(
    df: DataFrame,
    sort_field: str,
    metrics: list[str],
    size: int = 1,
    desc: bool = True,
    tiebreak: str | None = None,
) -> DataFrame:
    """ES top_metrics agg: the metric values carried by the row(s) with
    the largest (or smallest) ``sort_field``. Spark TakeOrdered top-k —
    no global sort materializes. ES breaks ties arbitrarily; pass
    ``tiebreak`` (asc) for the deterministic total order the contract
    requires."""
    order = [F.col(sort_field).desc() if desc else F.col(sort_field).asc()]
    if tiebreak:
        order.append(F.asc(tiebreak))
    return df.orderBy(*order).limit(size).select(sort_field, *metrics)


def median_absolute_deviation(df: DataFrame, field: str) -> DataFrame:
    """ES median_absolute_deviation agg, EXACT: median(|x - median(x)|)
    with interpolated medians (Spark ``percentile(0.5)``, the same
    interpolation DuckDB's ``median`` uses on numerics — so the oracle
    mirrors bit-for-bit on exact inputs). Two aggregate passes; the
    1-row median frame is broadcast back over the scan, never collected
    to python."""
    c = F.col(field).cast("double")
    med = df.agg(F.percentile(c, F.lit(0.5)).alias("__median"))
    return (
        df.crossJoin(F.broadcast(med))
        .agg(
            F.percentile(
                F.abs(c - F.col("__median")), F.lit(0.5)
            ).alias("mad"),
            F.first("__median").alias("median"),
        )
    )


def matrix_stats(df: DataFrame, fields: list[str]) -> DataFrame:
    """ES matrix_stats agg over numeric fields: per-field count, mean,
    variance, skewness, kurtosis and per-pair covariance, correlation.
    ONE aggregate pass collecting raw power/cross sums; every output is
    a CLOSED FORM over those sums (population moments, like
    extended_stats) so an oracle computing the same expressions over the
    same sums reproduces them bit-for-bit on exact inputs. (ES uses
    streaming one-pass updates — same moments, different fold order; our
    contract pins the closed-form definition.) Kurtosis is the plain
    fourth standardized moment m4/m2^2 (not excess). Returns long-form
    rows (stat, key, value): per-field stats keyed by field name, pair
    stats keyed 'a,b' in given field order."""
    cols = {f: F.col(f).cast("double") for f in fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f, c in cols.items():
        aggs += [
            F.sum(c).alias(f"__s1_{f}"),
            F.sum(c * c).alias(f"__s2_{f}"),
            F.sum(c * c * c).alias(f"__s3_{f}"),
            F.sum(c * c * c * c).alias(f"__s4_{f}"),
        ]
    for i, a in enumerate(fields):
        for b in fields[i + 1:]:
            aggs.append(F.sum(cols[a] * cols[b]).alias(f"__sxy_{a}_{b}"))
    row = df.agg(*aggs)
    n = F.col("__n").cast("double")

    def moments(f):
        m = F.col(f"__s1_{f}") / n
        m2 = F.col(f"__s2_{f}") / n - m * m  # population variance
        m3 = F.col(f"__s3_{f}") / n - 3 * m * F.col(f"__s2_{f}") / n + 2 * m * m * m
        m4 = (
            F.col(f"__s4_{f}") / n
            - 4 * m * F.col(f"__s3_{f}") / n
            + 6 * m * m * F.col(f"__s2_{f}") / n
            - 3 * m * m * m * m
        )
        return m, m2, m3, m4

    structs = []
    for f in fields:
        m, m2, m3, m4 = moments(f)
        for stat, val in (
            ("count", n),
            ("mean", m),
            ("variance", m2),
            # sqrt is IEEE correctly-rounded in every engine (pow is
            # not): m2^1.5 as sqrt(m2*m2*m2) keeps oracles bit-identical
            ("skewness", m3 / F.sqrt(m2 * m2 * m2)),
            ("kurtosis", m4 / (m2 * m2)),
        ):
            structs.append(
                F.struct(
                    F.lit(stat).alias("stat"), F.lit(f).alias("key"),
                    val.cast("double").alias("value"),
                )
            )
    for i, a in enumerate(fields):
        for b in fields[i + 1:]:
            ma = F.col(f"__s1_{a}") / n
            mb = F.col(f"__s1_{b}") / n
            cov = F.col(f"__sxy_{a}_{b}") / n - ma * mb
            va = F.col(f"__s2_{a}") / n - ma * ma
            vb = F.col(f"__s2_{b}") / n - mb * mb
            corr = cov / F.sqrt(va * vb)
            for stat, val in (("covariance", cov), ("correlation", corr)):
                structs.append(
                    F.struct(
                        F.lit(stat).alias("stat"),
                        F.lit(f"{a},{b}").alias("key"),
                        val.cast("double").alias("value"),
                    )
                )
    return row.select(F.explode(F.array(*structs)).alias("b")).select("b.*")


def scripted_metric(
    df: DataFrame,
    map_combine,
    reduce_fn,
    partial_schema: str,
    out_schema: str,
) -> DataFrame:
    """ES scripted_metric agg: user map/combine per shard, reduce on the
    coordinator. Spark shape: ``map_combine(pdf) -> pdf`` runs per Arrow
    batch inside ``mapInPandas`` (the map+combine script — emit ONE
    small row per batch), then the tiny partial frame coalesces to one
    task where ``reduce_fn(pdf) -> pdf`` folds it (the reduce script).
    Like ES, the scripts must be commutative/associative over batches —
    batch boundaries are not part of the determinism contract, so only
    order-insensitive folds (sums, counts, min/max) yield stable
    results. No driver collect: the reduce runs as a 1-task stage over
    rows proportional to the batch count, not the data."""
    import pandas as pd

    def _map(batches):
        for pdf in batches:
            if len(pdf):
                yield map_combine(pdf)

    partials = df.mapInPandas(_map, partial_schema)

    def _reduce(batches):
        rows = [p for p in batches if len(p)]
        pdf = pd.concat(rows) if rows else None
        yield reduce_fn(pdf)

    return partials.coalesce(1).mapInPandas(_reduce, out_schema)


#: ES auto_date_histogram rounding ladder, fixed-length steps
#: (second..week); wider spans fall to calendar month/quarter/year
AUTO_DH_LADDER = (1, 5, 10, 30, 60, 300, 600, 1800,
                  3600, 10800, 43200, 86400, 604800)


def auto_date_histogram(
    df: DataFrame, ts_col: str, target_buckets: int = 10
) -> DataFrame:
    """ES auto_date_histogram agg: pick the smallest interval from the
    rounding ladder such that the bucket count fits ``target_buckets``,
    then histogram on it. Fixed-length steps bucket on
    floor(epoch_seconds / interval); spans too wide for a week step
    fall to calendar month / quarter / year via ``date_trunc`` (ES
    continues with year multiples — documented simplification: year is
    our final fallback). The min/max probe is a 2-value collect; the
    choice is a pure function of (min, max, target), so an oracle
    recomputing the same ladder picks the same interval. Returns
    (interval, bucket, doc_count) with bucket formatted
    'yyyy-MM-dd HH:mm:ss' in the session timezone (UTC)."""
    row = df.agg(F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")).collect()[0]
    lo, hi = row["lo"], row["hi"]
    spark = df.sparkSession
    if lo is None:
        return spark.createDataFrame(
            [], "interval string, bucket string, doc_count long"
        )
    import calendar

    lo_s = calendar.timegm(lo.timetuple())
    hi_s = calendar.timegm(hi.timetuple())
    fmt = "yyyy-MM-dd HH:mm:ss"
    interval = None
    for s in AUTO_DH_LADDER:
        if hi_s // s - lo_s // s + 1 <= target_buckets:
            interval = str(s)
            bucket = F.date_format(
                F.timestamp_seconds(
                    (F.floor(F.unix_timestamp(F.col(ts_col)) / s) * s).cast("long")
                ),
                fmt,
            )
            break
    if interval is None:
        dm = (hi.year * 12 + hi.month) - (lo.year * 12 + lo.month)
        dq = (hi.year * 4 + (hi.month - 1) // 3) - (
            lo.year * 4 + (lo.month - 1) // 3
        )
        if dm + 1 <= target_buckets:
            interval = "month"
        elif dq + 1 <= target_buckets:
            interval = "quarter"
        else:
            interval = "year"
        bucket = F.date_format(F.date_trunc(interval, F.col(ts_col)), fmt)
    return (
        df.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("doc_count"))
        .select(F.lit(interval).alias("interval"), "bucket", "doc_count")
        .orderBy("bucket")
    )


_KNUTH = 2654435761
_M32 = 1 << 32


def _knuth_hash(id_col: Column, seed: int = 0) -> Column:
    """The repo's overflow-safe Knuth multiplicative hash (the same
    split-product construction as train_val_split / random_score_col):
    deterministic per id, exactly SQL-expressible — which is why the
    sampler aggs use it instead of xxhash64 (DuckDB cannot mirror
    Spark's xxhash64, and a sample that the oracle cannot reproduce is
    untestable)."""
    x = F.pmod(F.pmod(id_col, F.lit(_M32)) + F.lit(int(seed)), F.lit(_M32))
    hi, lo = F.floor(x / F.lit(1 << 16)), x % F.lit(1 << 16)
    return F.pmod(
        F.pmod(hi * F.lit(_KNUTH), F.lit(_M32)) * F.lit(1 << 16)
        + lo * F.lit(_KNUTH),
        F.lit(_M32),
    )


def sampler(
    df: DataFrame, size: int, id_col: str, seed: int = 0
) -> DataFrame:
    """ES sampler agg, made DETERMINISTIC: the ``size`` rows with the
    lowest Knuth hash of ``id_col`` (ties impossible below 2^32 ids per
    hash value in practice; id asc breaks them anyway). ES's sampler
    takes the first shard_size docs per shard in score order — a
    nondeterministic memory cap; ours is a uniform pseudo-random sample
    that is stable across parallelism, input order and resume (the repo
    determinism contract) and that an oracle can reproduce exactly.
    Downstream aggs run over the returned frame. Top-k by hash via
    orderBy+limit — TakeOrdered, no global sort."""
    h = _knuth_hash(F.col(id_col), seed)
    return (
        df.withColumn("_h", h)
        .orderBy(F.asc("_h"), F.asc(id_col))
        .limit(size)
        .drop("_h")
    )


def diversified_sampler(
    df: DataFrame,
    size: int,
    id_col: str,
    dedup_field: str,
    max_docs_per_value: int = 1,
    seed: int = 0,
) -> DataFrame:
    """ES diversified_sampler agg (deterministic, like ``sampler``): at
    most ``max_docs_per_value`` rows per ``dedup_field`` value — the
    de-biasing ES uses to stop one author/source dominating a sample —
    then the ``size`` lowest-hash rows overall. One window per dedup
    value (partitioned — scales) + TakeOrdered."""
    from pyspark.sql import Window as W

    h = _knuth_hash(F.col(id_col), seed)
    w = W.partitionBy(dedup_field).orderBy(F.asc("_h"), F.asc(id_col))
    return (
        df.withColumn("_h", h)
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_docs_per_value)
        .orderBy(F.asc("_h"), F.asc(id_col))
        .limit(size)
        .drop("_h", "_r")
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


def boxplot(df: DataFrame, field: str) -> DataFrame:
    """ES boxplot agg, EXACT: (count, min, q1, q2, q3, max) in one
    aggregate pass. ES computes approximate quartiles with TDigest; we
    pin EXACT interpolated percentiles (Spark ``percentile``, the same
    linear interpolation DuckDB's ``quantile_cont`` uses) — deterministic
    across parallelism and exactly oracle-mirrorable, which TDigest's
    merge-order-dependent centroids are not. One shuffle-to-one
    aggregate; percentile state is O(values) per group at the driver-free
    exec side — fine for the single global box; bucket the frame first
    for per-bucket boxes."""
    c = F.col(field).cast("double")
    return df.agg(
        F.count(c).alias("count"),
        F.min(c).alias("min"),
        F.percentile(c, F.lit(0.25)).alias("q1"),
        F.percentile(c, F.lit(0.5)).alias("q2"),
        F.percentile(c, F.lit(0.75)).alias("q3"),
        F.max(c).alias("max"),
    )


def t_test(df: DataFrame, value: Column, in_group_a: Column) -> DataFrame:
    """ES t_test agg (two-sample, unpaired): Welch ('heteroscedastic')
    and pooled ('homoscedastic') t statistics between the rows where
    ``in_group_a`` is true and the rest. ONE conditional-aggregate pass
    collects per-group (n, sum, sum_sq); means, unbiased variances and
    both statistics are CLOSED FORMS over those sums — feed integer
    values (e.g. cents) and the oracle mirrors bit-for-bit, the same
    recipe as extended_stats/matrix_stats. (ES reports the p-value;
    inverting the t CDF needs the incomplete beta, which neither SQL
    engine pins — the statistic is the deterministic, testable part and
    p follows from it with df_welch/df_pooled.) Returns one row:
    (n_a, n_b, mean_a, mean_b, t_welch, t_pooled)."""
    v = value.cast("double")
    a, b = in_group_a, ~in_group_a
    row = df.agg(
        F.sum(F.when(a, 1).otherwise(0)).cast("double").alias("na"),
        F.sum(F.when(b, 1).otherwise(0)).cast("double").alias("nb"),
        F.sum(F.when(a, v).otherwise(0.0)).alias("sa"),
        F.sum(F.when(b, v).otherwise(0.0)).alias("sb"),
        F.sum(F.when(a, v * v).otherwise(0.0)).alias("qa"),
        F.sum(F.when(b, v * v).otherwise(0.0)).alias("qb"),
    )
    na, nb = F.col("na"), F.col("nb")
    ma, mb = F.col("sa") / na, F.col("sb") / nb
    # unbiased sample variance from power sums: (q - s*s/n) / (n - 1)
    va = (F.col("qa") - F.col("sa") * F.col("sa") / na) / (na - F.lit(1.0))
    vb = (F.col("qb") - F.col("sb") * F.col("sb") / nb) / (nb - F.lit(1.0))
    welch = (ma - mb) / F.sqrt(va / na + vb / nb)
    pooled_var = ((na - F.lit(1.0)) * va + (nb - F.lit(1.0)) * vb) / (
        na + nb - F.lit(2.0)
    )
    pooled = (ma - mb) / F.sqrt(pooled_var * (F.lit(1.0) / na + F.lit(1.0) / nb))
    return row.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        welch.alias("t_welch"),
        pooled.alias("t_pooled"),
    )


def rate_agg(
    df: DataFrame, ts_col: str, value: Column, unit: str = "day"
) -> DataFrame:
    """ES rate agg inside a calendar-month date_histogram: per month,
    sum(value) normalized to a per-``unit`` rate (unit='day' divides by
    the month's actual day count, 'month' is the plain sum). Pure
    groupBy — the day count is derived from the bucket key itself
    (datediff to the next month), not from a calendar UDF. Returns
    (month, doc_count, value_sum, rate) ordered month asc."""
    if unit not in ("day", "month"):
        raise ValueError(f"unsupported rate unit: {unit}")
    m = F.date_trunc("month", F.col(ts_col))
    out = (
        df.groupBy(m.alias("__m"))
        .agg(F.count("*").alias("doc_count"), F.sum(value).alias("value_sum"))
        .withColumn(
            "__days",
            F.datediff(F.add_months(F.col("__m"), 1), F.col("__m")).cast("double"),
        )
    )
    rate = (
        F.col("value_sum") / F.col("__days")
        if unit == "day"
        else F.col("value_sum").cast("double")
    )
    return (
        out.select(
            F.date_format("__m", "yyyy-MM").alias("month"),
            "doc_count",
            "value_sum",
            rate.alias("rate"),
        )
        .orderBy("month")
    )


def stats_bucket(df: DataFrame, metric_col: str) -> DataFrame:
    """ES stats_bucket sibling pipeline agg: (count, min, max, sum, avg)
    of a metric ACROSS the buckets of an already-aggregated frame (feed
    it the output of histogram/date_histogram/terms_agg). Bucket counts
    are calendar/cardinality-bounded, so this second aggregate is tiny;
    avg is the closed form sum/count over exact bucket sums — mirror the
    division, not a separate avg(), in oracles."""
    c = F.col(metric_col)
    return df.agg(
        F.count(c).alias("count"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.sum(c).alias("sum"),
        (F.sum(c).cast("double") / F.count(c)).alias("avg"),
    )


def normalize_percent_of_sum(df: DataFrame, metric_col: str) -> DataFrame:
    """ES normalize pipeline agg, method=percent_of_sum: each bucket's
    metric as a percentage of the total across buckets, appended as a
    ``percent`` column (the rest of the bucket frame passes through).
    The total is a 1-row aggregate broadcast back over the
    (bucket-count-bounded) frame — no global window, no collect. Feed
    exact integer metrics and the division mirrors bit-for-bit."""
    total = df.agg(F.sum(F.col(metric_col)).alias("__total"))
    return (
        df.crossJoin(F.broadcast(total))
        .withColumn(
            "percent",
            F.col(metric_col).cast("double")
            * F.lit(100.0)
            / F.col("__total").cast("double"),
        )
        .drop("__total")
    )


def cumulative_cardinality(
    df: DataFrame, ts_col: str, id_col: str
) -> DataFrame:
    """ES cumulative_cardinality pipeline agg over a calendar-month
    date_histogram: per month, how many DISTINCT ids have been seen up
    to and including that month. Exact and scale-safe: a distinct id's
    contribution is pinned to its FIRST month (min-aggregate per id —
    one key-partitioned shuffle), months with no new ids still appear
    (left join against the month spine), and the running sum's window
    runs over the month spine only — calendar-bounded rows, not data
    rows. Returns (month, new_ids, cumulative) ordered month asc."""
    from pyspark.sql import Window as W

    m = F.date_format(F.date_trunc("month", F.col(ts_col)), "yyyy-MM")
    first = (
        df.select(F.col(id_col).alias("__id"), m.alias("__m"))
        .groupBy("__id")
        .agg(F.min("__m").alias("__m"))
        .groupBy("__m")
        .agg(F.count("*").alias("new_ids"))
    )
    spine = df.select(m.alias("__m")).distinct()
    w = W.orderBy("__m").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        spine.join(first, "__m", "left")
        .withColumn("new_ids", F.coalesce(F.col("new_ids"), F.lit(0)))
        .withColumn("cumulative", F.sum("new_ids").over(w))
        .select(F.col("__m").alias("month"), "new_ids", "cumulative")
        .orderBy("month")
    )


def date_range_agg(
    df: DataFrame,
    ts_field: str,
    ranges: list[tuple[str, str | None, str | None]],
    metrics: dict | None = None,
) -> DataFrame:
    """ES date_range agg: ``ranges`` = (key, from_inclusive,
    to_exclusive) with ISO date/timestamp strings (None = unbounded) —
    the same independent-filter-bucket semantics as ``range_agg``
    (buckets may overlap), evaluated in ONE conditional-aggregation
    pass. ES resolves date math driver-side; here the bounds arrive
    already-resolved as literals, cast to timestamp once."""
    branches = []
    for key, lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(ts_field) >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            cond = cond & (F.col(ts_field) < F.lit(hi).cast("timestamp"))
        branches.append((key, cond))
    named = _as_masked(metrics)
    aggs = []
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


def _ip_to_num(col: Column) -> Column:
    """Dotted-quad IPv4 -> int64 (big-endian octet fold) as a pure
    column expression — stays in whole-stage codegen."""
    parts = F.split(col, r"\.")
    out = F.lit(0).cast("long")
    for i in range(4):
        out = out * F.lit(256) + parts.getItem(i).cast("long")
    return out


def parse_cidr(cidr: str) -> tuple[int, int]:
    """CIDR 'a.b.c.d/m' -> numeric [from, to) half-open bounds (ES
    ip_range mask form). Driver-side, pure."""
    ip, mask = cidr.split("/")
    octets = [int(x) for x in ip.split(".")]
    num = 0
    for o in octets:
        num = num * 256 + o
    m = int(mask)
    size = 1 << (32 - m)
    lo = (num >> (32 - m)) << (32 - m)
    return lo, lo + size


def ip_range_agg(
    df: DataFrame,
    ip_field: str,
    ranges: list[tuple[str, str | None, str | None]],
    metrics: dict | None = None,
) -> DataFrame:
    """ES ip_range agg over a dotted-quad IPv4 string column:
    ``ranges`` = (key, from_ip_inclusive, to_ip_exclusive) — pass a
    CIDR through :func:`parse_cidr` to get the ES mask form. Ordering
    is numeric (big-endian octet fold), matching ES's ip ordering, NOT
    lexicographic. One conditional-aggregation pass, all JVM-side."""
    num = _ip_to_num(F.col(ip_field))
    branches = []
    for key, lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            lo_n = lo if isinstance(lo, int) else parse_cidr(lo + "/32")[0]
            cond = cond & (num >= F.lit(int(lo_n)))
        if hi is not None:
            hi_n = hi if isinstance(hi, int) else parse_cidr(hi + "/32")[0]
            cond = cond & (num < F.lit(int(hi_n)))
        branches.append((key, cond))
    named = _as_masked(metrics)
    aggs = []
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


def variable_width_histogram(
    df: DataFrame, field: str, buckets: int
) -> DataFrame:
    """ES variable_width_histogram, DETERMINISTIC variant: ES clusters
    with an order-sensitive streaming algorithm (its docs warn the
    buckets are approximate and shard-order dependent); that is
    unreproducible across parallelism, so this engine pins the
    equal-depth reading — bucket boundaries at the EXACT interpolated
    percentiles i/buckets (the boxplot/percentiles parity machinery:
    Spark ``percentile`` == DuckDB ``quantile_cont``), values assigned
    by boundary count (value >= b_i), half-open on the left. Returns
    per bucket (bucket, doc_count, min, max, avg) — min/key/max is the
    ES response shape (ES's key IS the bucket average). Two passes over
    the column (one tiny boundary aggregate + one bucketed aggregate);
    the boundary row is k-1 doubles — broadcast-safe at any scale."""
    c = F.col(field).cast("double")
    qs = [i / buckets for i in range(1, buckets)]
    brow = df.agg(
        *[F.percentile(c, F.lit(q)).alias(f"b{i}") for i, q in enumerate(qs)]
    ).collect()[0]
    bounds = [float(brow[f"b{i}"]) for i in range(len(qs))]
    bucket = F.lit(0)
    for b_ in bounds:
        bucket = bucket + F.when(c >= F.lit(b_), 1).otherwise(0)
    return (
        df.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("doc_count"),
            F.min(c).alias("min"),
            F.max(c).alias("max"),
            F.avg(c).alias("avg"),
        )
        .orderBy("bucket")
    )


def global_agg(df: DataFrame, metrics: dict | None = None) -> DataFrame:
    """ES ``global`` agg: one bucket spanning the ENTIRE corpus,
    deliberately ignoring the surrounding query context (ES runs it
    against all documents of the search scope). Callers pass the full
    corpus frame; the result is a single row (doc_count + metrics) —
    one map-side-combined aggregation, no shuffle beyond the final
    single-row reduce."""
    named = list((metrics or {}).items())
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("doc_count"),
        *[c.alias(n) for n, c in named],
    )


def random_sampler(
    df: DataFrame, probability: float, id_col: str, seed: int = 0
) -> DataFrame:
    """ES ``random_sampler`` agg (8.2+, probability-based sampling for
    cheap approximate aggs), made DETERMINISTIC like :func:`sampler`:
    a row survives iff knuth_hash(id) < probability * 2^32 — stable
    across parallelism, input order and resume, and exactly
    reproducible by the split-hash SQL twin (ES's own sampler is
    random and unreproducible; the repo contract forbids unseeded
    RNG). A pure filter: no shuffle, predicate stays in codegen."""
    if not (0.0 <= probability <= 1.0):
        raise ValueError("probability must be in [0, 1]")
    return df.filter(
        _knuth_hash(F.col(id_col), seed)
        < F.lit(int(probability * _M32))
    )


def ip_prefix_agg(
    df: DataFrame,
    ip_field: str,
    prefix_length: int,
    metrics: dict | None = None,
) -> DataFrame:
    """ES ``ip_prefix`` agg (8.2+, IPv4): buckets keyed by the first
    ``prefix_length`` bits of the address, key rendered as the masked
    network address ``a.b.c.d/len`` (the ES keyed form). The mask and
    the octet re-rendering are pure integer arithmetic on the numeric
    big-endian fold (:func:`_ip_to_num`) — whole-stage codegen, one
    hash aggregation, exactly SQL-mirrorable."""
    if not (0 <= int(prefix_length) <= 32):
        raise ValueError("prefix_length must be in [0, 32]")
    named = list((metrics or {}).items())
    num = _ip_to_num(F.col(ip_field))
    shift = 32 - int(prefix_length)
    masked = num - F.pmod(num, F.lit(1 << shift)) if shift else num
    octs = [
        F.floor(masked / F.lit(1 << 24)).cast("long"),
        F.pmod(F.floor(masked / F.lit(1 << 16)), F.lit(256)).cast("long"),
        F.pmod(F.floor(masked / F.lit(1 << 8)), F.lit(256)).cast("long"),
        F.pmod(masked, F.lit(256)).cast("long"),
    ]
    key = F.concat(
        F.concat_ws(".", *[o.cast("string") for o in octs]),
        F.lit(f"/{int(prefix_length)}"),
    )
    return (
        df.withColumn("_ipp_key", key)
        .groupBy("_ipp_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("doc_count"),
            *[c.alias(n) for n, c in named],
        )
        .withColumnRenamed("_ipp_key", "key")
    )


def children_agg(
    parent_buckets: DataFrame,
    children: DataFrame,
    join_key: str,
    metrics: dict | None = None,
) -> DataFrame:
    """ES ``children`` agg over a join-field hierarchy: for each PARENT
    bucket, aggregate over that parent's CHILD documents (the classic
    per-conversation rollup of per-turn metrics). ``parent_buckets``
    carries one row per parent bucket (its ``join_key`` column is the
    parent identity); ``children`` carries the child docs with the same
    key. One equi-join (Catalyst broadcasts a small parent side) + one
    map-side-combined aggregation — the same join-field fan-in ES pays.
    The inverse direction (ES ``parent`` agg) is the same join with the
    frames swapped."""
    named = list((metrics or {}).items())
    return (
        children.join(
            parent_buckets.select(join_key).distinct(), join_key
        )
        .groupBy(join_key)
        .agg(
            F.count(F.lit(1)).cast("long").alias("doc_count"),
            *[c.alias(n) for n, c in named],
        )
    )


def categorize_text(
    df: DataFrame,
    text_col: str,
    max_tokens: int = 5,
    size: int = 10,
    token_pattern: str = "[a-z0-9_]+",
) -> DataFrame:
    """ES categorize_text agg, DETERMINISTIC variant: ES categorizes
    log-like messages with an order-sensitive streaming drain tree (its
    docs call the result approximate and re-runnable-different); that is
    unreproducible across parallelism, so this engine pins the
    reproducible reading — the category key is the first ``max_tokens``
    analyzer tokens with pure-number tokens dropped (ES's categorization
    tokenizer likewise excludes numerics from category definitions),
    joined by single spaces. Buckets ordered (doc_count desc, key asc),
    capped at ``size``. Pure column expressions — codegen end to end."""
    toks = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
        F.lit(token_pattern), 0,
    )
    kept = F.filter(toks, lambda t: ~t.rlike("^[0-9]+$"))
    key = F.array_join(F.slice(kept, 1, max_tokens), " ")
    return (
        df.groupBy(key.alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
    )


def composite_pages(
    df: DataFrame,
    sources: list[str],
    size: int = 10,
    after: tuple | None = None,
    metrics: dict[str, Column] | None = None,
) -> DataFrame:
    """ES composite agg with ``after_key`` pagination: buckets are the
    distinct tuples of ``sources`` in ascending tuple order; a page is
    the first ``size`` buckets strictly AFTER the ``after`` tuple (ES's
    after_key cursor — the stateless deep-pagination contract, the same
    shape as this engine's search_after). The after filter is a
    lexicographic tuple comparison pushed below the aggregation, so a
    deep page never materializes earlier pages. Returns the source
    columns + doc_count + metrics, ordered by the source tuple."""
    if not sources:
        raise ValueError("composite needs at least one source")
    out = df
    if after is not None:
        if len(after) != len(sources):
            raise ValueError("after must have one value per source")
        cond = F.lit(False)
        eq = F.lit(True)
        for col, val in zip(sources, after):
            cond = cond | (eq & (F.col(col) > F.lit(val)))
            eq = eq & (F.col(col) == F.lit(val))
        out = out.filter(cond)
    aggs = [F.count("*").alias("doc_count")] + [
        c.alias(n) for n, c in (metrics or {}).items()
    ]
    return (
        out.groupBy(*[F.col(c) for c in sources])
        .agg(*aggs)
        .orderBy(*[F.asc(c) for c in sources])
        .limit(size)
    )


def frequent_item_sets(
    df: DataFrame,
    item_col: str,
    basket_col: str,
    min_support: float = 0.1,
    max_size: int = 3,
    size: int = 10,
    max_basket_items: int = 1024,
    metrics_out: dict | None = None,
) -> DataFrame:
    """ES ``frequent_item_sets`` agg, computed EXACTLY (ES uses a
    sampled/ECLAT approximation; exact a-priori gives the same answer
    deterministically and an oracle can mirror it): itemsets of up to
    ``max_size`` items that co-occur in at least ``min_support`` of the
    baskets (a basket = the DISTINCT items of one ``basket_col`` value).
    Returns the top ``size`` rows of (key = comma-joined sorted itemset,
    set_size, doc_count, support) under the unique total order
    (doc_count desc, key asc) — support = doc_count / n_baskets in ONE
    f64 division of exact integers, oracle-mirrorable.

    Scale shape (a-priori): level k+1 candidates join level-k winners
    with frequent singles INSIDE the same basket — every join keys on
    the basket column (co-partitioned, narrow per-basket work), and the
    support filter after each level bounds the candidate set before the
    next, which is what makes a-priori tractable at 10^9 baskets. The
    per-basket distinct-items list is never collected or exploded into
    cross products wider than the surviving candidate frontier.

    ``max_basket_items`` is the explicit per-basket skew guard: the level-2
    self-join emits F^2/2 pair rows for a basket holding F frequent
    singletons, so a basket whose frequent-item count exceeds the cap is
    dropped from the size>=2 candidate generation entirely (singleton
    counts are unaffected) rather than quadratically exploding one task.
    Pass ``metrics_out={}`` to make the truncation OBSERVABLE — it is
    filled with dropped_baskets / dropped_basket_item_rows (one tiny extra
    aggregation job), same discipline as minhash_lsh_pairs' max_bucket."""
    if max_size < 1 or max_size > 3:
        raise ValueError("frequent_item_sets supports max_size 1..3")
    items = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    n_baskets = items.select("b").distinct().count()
    floor = min_support * n_baskets
    lvl1 = (
        items.groupBy("i").agg(F.count("*").alias("doc_count"))
        .filter(F.col("doc_count") >= floor)
    )
    out = lvl1.select(
        F.col("i").alias("key"), F.lit(1).alias("set_size"), "doc_count"
    )
    # a-priori prune: only baskets' items that are frequent alone can
    # appear in any larger frequent itemset
    fitems = items.join(lvl1.select("i"), "i", "left_semi")
    if max_size >= 2:
        bsizes = fitems.groupBy("b").agg(F.count("*").alias("_n"))
        if metrics_out is not None:
            row = (
                bsizes.filter(F.col("_n") > max_basket_items)
                .agg(
                    F.count("*").alias("b"),
                    F.coalesce(F.sum("_n"), F.lit(0)).alias("r"),
                )
                .collect()[0]
            )
            metrics_out["dropped_baskets"] = int(row["b"])
            metrics_out["dropped_basket_item_rows"] = int(row["r"])
        fitems = fitems.join(
            bsizes.filter(F.col("_n") <= max_basket_items).select("b"),
            "b", "left_semi",
        )
    if max_size >= 2:
        pairs = (
            fitems.alias("a")
            .join(fitems.alias("c"), "b")
            .filter(F.col("a.i") < F.col("c.i"))
            .groupBy(F.col("a.i").alias("i1"), F.col("c.i").alias("i2"))
            .agg(F.count("*").alias("doc_count"))
            .filter(F.col("doc_count") >= floor)
        )
        out = out.unionByName(pairs.select(
            F.concat_ws(",", "i1", "i2").alias("key"),
            F.lit(2).alias("set_size"), "doc_count",
        ))
    if max_size >= 3:
        pair_baskets = (
            fitems.alias("a")
            .join(fitems.alias("c"), "b")
            .filter(F.col("a.i") < F.col("c.i"))
            .select("b", F.col("a.i").alias("i1"), F.col("c.i").alias("i2"))
            .join(pairs.select("i1", "i2"), ["i1", "i2"], "left_semi")
        )
        triples = (
            pair_baskets
            .join(fitems.alias("d"), "b")
            .filter(F.col("d.i") > F.col("i2"))
            .groupBy("i1", "i2", F.col("d.i").alias("i3"))
            .agg(F.count("*").alias("doc_count"))
            .filter(F.col("doc_count") >= floor)
        )
        out = out.unionByName(triples.select(
            F.concat_ws(",", "i1", "i2", "i3").alias("key"),
            F.lit(3).alias("set_size"), "doc_count",
        ))
    return (
        out.withColumn(
            "support",
            F.col("doc_count").cast("double") / F.lit(float(n_baskets)),
        )
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
    )


def nested_agg(
    df: DataFrame,
    nested_col: str,
    by: "list[str] | None" = None,
    metrics: "dict[str, Column] | None" = None,
) -> DataFrame:
    """ES ``nested`` agg: step INTO a nested field (here an
    ``array<struct>`` column, the nested_query document model) and
    aggregate over the CHILD documents — ``doc_count`` counts children,
    not parents (the defining difference from a plain agg on the
    parent). One explode + one map-side-combined groupBy; ``by`` names
    child struct fields to bucket on (the terms-inside-nested shape),
    ``metrics`` are Columns over the exploded child fields."""
    child = df.select(F.explode(F.col(nested_col)).alias("_c")).select("_c.*")
    named = list((metrics or {}).items())
    grouped = child.groupBy(*[F.col(c) for c in (by or [])]) if by \
        else child.groupBy()
    return grouped.agg(
        F.count(F.lit(1)).cast("long").alias("doc_count"),
        *[c.alias(n) for n, c in named],
    )


def reverse_nested_agg(
    df: DataFrame,
    nested_col: str,
    parent_cols: "list[str]",
    by: "list[str]",
    metrics: "dict[str, Column] | None" = None,
) -> DataFrame:
    """ES ``reverse_nested`` agg: from inside a nested (child) bucket,
    step BACK to the parent documents — per child-field bucket,
    ``doc_count`` counts each PARENT once no matter how many of its
    children land in the bucket. ``parent_cols[0]`` must be a unique
    parent identity; further parent_cols ride along for parent-level
    ``metrics``. Lowered as explode -> distinct (one row per
    (bucket, parent)) -> groupBy: two exchanges on the same key, both
    map-side combined — no window, no collect."""
    if not parent_cols:
        raise ValueError("reverse_nested_agg needs parent_cols")
    pairs = df.select(
        *[F.col(c) for c in parent_cols],
        F.explode(F.col(nested_col)).alias("_c"),
    ).select(
        *parent_cols, *[F.col(f"_c.{k}").alias(k) for k in by]
    ).distinct()
    named = list((metrics or {}).items())
    return pairs.groupBy(*[F.col(c) for c in by]).agg(
        F.count(F.lit(1)).cast("long").alias("doc_count"),
        *[c.alias(n) for n, c in named],
    )


def parent_agg(
    children: DataFrame,
    parents: DataFrame,
    join_key: str,
    by: "list[str]",
    metrics: "dict[str, Column] | None" = None,
) -> DataFrame:
    """ES ``parent`` agg over a join-field hierarchy (the inverse of
    ``children_agg``): bucket the CHILD docs by child fields ``by``,
    then aggregate each bucket's PARENT docs — every parent counted
    ONCE per bucket even when several of its children match (ES
    de-duplicates through the join field). Lowered as a distinct
    (bucket, key) projection of the child side joined to the parent
    table: the distinct side is small (buckets x parents), so Catalyst
    broadcasts it under AQE; metrics are parent-column aggregates."""
    keys = children.select(*[F.col(c) for c in by], F.col(join_key)).distinct()
    named = list((metrics or {}).items())
    return (
        parents.join(keys, join_key)
        .groupBy(*[F.col(c) for c in by])
        .agg(
            F.count(F.lit(1)).cast("long").alias("doc_count"),
            *[c.alias(n) for n, c in named],
        )
    )


def bucket_correlation(
    df: DataFrame, x: Column, y: Column,
) -> DataFrame:
    """ES ``bucket_correlation`` pipeline agg (7.14, function
    ``count_correlation``): Pearson correlation between the bucket
    doc_count series and a caller-supplied indicator series. Computed
    CLOSED-FORM from single-pass power sums (n, sx, sy, sxx, syy, sxy)
    — never ``corr()`` — so with integer-exact inputs every
    intermediate is an exact f64 and a SQL oracle mirroring the same
    expression is bit-identical (the matrix_stats recipe). Returns one
    row: (n, correlation)."""
    xd, yd = x.cast("double"), y.cast("double")
    row = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(xd).alias("sx"), F.sum(yd).alias("sy"),
        F.sum(xd * xd).alias("sxx"), F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    return row.select(
        "n",
        F.when(
            (vx > 0) & (vy > 0), cov / (F.sqrt(vx) * F.sqrt(vy))
        ).alias("correlation"),
    )


def bucket_count_ks_test(
    df: DataFrame, key_col: str, count_col: str,
) -> DataFrame:
    """ES ``bucket_count_ks_test`` pipeline agg (7.14), deterministic
    two-sided statistic against the UNIFORM alternative: buckets are
    ordered by ``key_col`` and the statistic is
    ``max_i |ecdf_counts(i) - i/n|`` — the Kolmogorov-Smirnov distance
    between the doc_count mass and the uniform spread over buckets.
    (ES returns resampled p-values from its ml module; the statistic is
    the deterministic core, the change_point reading.) A pipeline agg
    runs over BUCKETS — a frame already reduced to one row per bucket —
    so the single-partition ordered window here is bounded by bucket
    cardinality, not corpus size (same shape as change_point /
    cumulative_cardinality). Integer counts keep the running sums exact
    in f64; the two ratios and the abs-difference mirror bit-identically
    in SQL. Returns one row: (n_buckets, total, statistic)."""
    from pyspark.sql import Window as W

    w = W.orderBy(key_col).rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.orderBy(key_col).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing)
    cnt = F.col(count_col).cast("long")
    stepped = df.select(
        F.sum(cnt).over(w).alias("cum"),
        F.row_number().over(W.orderBy(key_col)).alias("i"),
        F.sum(cnt).over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("nb"),
    ).select(
        "nb", "total",
        F.abs(
            F.col("cum").cast("double") / F.col("total").cast("double")
            - F.col("i").cast("double") / F.col("nb").cast("double")
        ).alias("d"),
    )
    return stepped.groupBy().agg(
        F.max("nb").cast("long").alias("n_buckets"),
        F.max("total").cast("long").alias("total"),
        F.max("d").alias("statistic"),
    )
