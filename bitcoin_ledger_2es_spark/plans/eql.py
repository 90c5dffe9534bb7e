"""EQL: the ES Event Query Language ``sequence`` surface over an event
table (ES exposes it at ``GET /<index>/_eql/search``; semantics from the
public EQL docs — sequences of matching events, optionally keyed
``by`` a field, bounded ``with maxspan=``, aborted by ``until``).

Deterministic reading pinned here (the repo's documented-reading
discipline, like vw_histogram/categorize_text): a candidate sequence
starts at EVERY step-1 match, and each later step binds the EARLIEST
event STRICTLY AFTER the previous binding — in ascending
``(ts, tiebreak)`` order within the ``by`` key — that matches the
step's condition. No backtracking: if the earliest continuation leads
nowhere (or is an ``until`` event), that candidate dies rather than
re-binding a later event. ES's state machine behaves exactly this way
for each pending state; what it adds is multiple simultaneous pending
states whose matches this greedy reading can miss only when two
candidates from the SAME start compete — the pinned semantics are a
deterministic subset, documented, and mirrored verbatim by the SQL twin
(contract.py, window_lag entry's eql kind).

Spark shape (why this scales): a k-step sequence is k-1 WINDOW passes
over the SAME (partitionBy ``by``, orderBy ts/tiebreak) spec — Catalyst
plans ONE Exchange + ONE sort, every pass reuses them, no self-joins,
no per-row Python. Each pass computes, per row, the earliest FOLLOWING
match of the next step as a struct-min over the
``rowsBetween(1, unboundedFollowing)`` frame; the struct's leading
fields are (ts, tiebreak), so the lexicographic min IS the earliest
event, and deeper continuations ride along as trailing struct fields
bound at that row. 10^12 events partition by key like any groupBy —
skewed keys cost what any per-key window costs, nothing more."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def eql_sequence(
    events: DataFrame,
    steps: "list[Column]",
    by: str = "user_id",
    maxspan_s: float | None = None,
    until: Column | None = None,
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """ES EQL ``sequence by <by> [step1] [step2] ... with maxspan``
    under the module's pinned earliest-continuation reading.

    Returns one row per completed sequence: ``by``, then per step i
    (1-based) ``e{i}_id`` and ``e{i}_ts``, plus ``span_us`` (integer
    microseconds, last.ts - first.ts — exact on both engine and oracle
    sides). Ordered (by, e1_ts, e1_id). ``maxspan_s`` keeps sequences
    with span <= maxspan (ES: inclusive). ``until`` (a filter Column)
    kills a candidate when the earliest following (step-match OR until)
    event is the until one — the ES ``until`` expiry."""
    if len(steps) < 2:
        raise ValueError("eql_sequence needs at least two steps")
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col(tiebreak).asc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    df = events
    k = len(steps)
    # backward: _s{i} = earliest following step-(i+1) match, carrying its
    # own continuation struct (computed in the previous iteration).
    for i in range(k - 1, 0, -1):
        fields = [F.col(ts).alias("ts"), F.col(tiebreak).alias("eid")]
        if until is not None:
            # an until event competes for "earliest": if it wins, the
            # candidate must die, so it enters the min with a kill flag.
            fields.append(
                (~steps[i]).cast("boolean").alias("killed")
            )
        if i < k - 1:
            fields.append(F.col(f"_s{i + 1}").alias("nxt"))
        cond = steps[i] | until if until is not None else steps[i]
        df = df.withColumn(
            f"_s{i}", F.min(F.when(cond, F.struct(*fields))).over(w)
        )
    out_cols = [F.col(by)]
    first = df.filter(steps[0])
    cur = None  # path into the nested continuation struct
    chain_ok = F.lit(True)
    last_ts = F.col(ts)
    for i in range(1, k):
        cur = F.col("_s1") if cur is None else cur["nxt"]
        chain_ok = chain_ok & cur.isNotNull()
        if until is not None:
            chain_ok = chain_ok & ~F.coalesce(cur["killed"], F.lit(False))
        last_ts = cur["ts"]
    # integer microseconds end-to-end (unix_micros), never float seconds:
    # exact on both the engine and the DuckDB (epoch_us) oracle side.
    # Parquet timestamps arrive as TIMESTAMP_NTZ; the session pins
    # spark.sql.session.timeZone=UTC (session.py), so the cast below is
    # a pure linear reinterpretation — no DST step, differences exact.
    span = (
        F.unix_micros(last_ts.cast("timestamp"))
        - F.unix_micros(F.col(ts).cast("timestamp"))
    )
    m = first.filter(chain_ok)
    sel = [F.col(by),
           F.col(tiebreak).alias("e1_id"), F.col(ts).alias("e1_ts")]
    cur = None
    for i in range(1, k):
        cur = F.col("_s1") if cur is None else cur["nxt"]
        sel += [cur["eid"].alias(f"e{i + 1}_id"),
                cur["ts"].alias(f"e{i + 1}_ts")]
    sel.append(span.alias("span_us"))
    m = m.select(*sel)
    if maxspan_s is not None:
        m = m.filter(F.col("span_us") <= int(maxspan_s * 1_000_000))
    return m.orderBy(by, "e1_ts", "e1_id")


def eql_sample(
    events: DataFrame,
    conds: "list[Column]",
    by: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """ES EQL ``sample by <key> [cond1] [cond2] ...``: one event per
    condition sharing the join key, NO time ordering between them (the
    un-sequenced sibling of ``sequence``). Deterministic reading pinned
    here: each slot binds the key's EARLIEST matching event in
    ``(ts, tiebreak)`` order; a key emits a sample iff every condition
    has at least one match.

    Spark shape: ONE groupBy(by) with a struct-min aggregate per
    condition — partial (map-side) aggregation applies, one narrow
    shuffle of <= n_keys * k rows, no window, no join. Output: ``by``,
    per-slot ``e{i}_id``/``e{i}_ts``, and ``spread_us`` = max - min of
    the bound timestamps (integer microseconds, exact both sides)."""
    if not conds:
        raise ValueError("eql_sample needs at least one condition")
    aggs = [
        F.min(
            F.when(c, F.struct(F.col(ts).alias("ts"),
                               F.col(tiebreak).alias("eid")))
        ).alias(f"_m{i}")
        for i, c in enumerate(conds)
    ]
    g = events.groupBy(by).agg(*aggs)
    for i in range(len(conds)):
        g = g.filter(F.col(f"_m{i}").isNotNull())
    micros = [
        F.unix_micros(F.col(f"_m{i}")["ts"].cast("timestamp"))
        for i in range(len(conds))
    ]
    spread = F.greatest(*micros) - F.least(*micros) if len(micros) > 1 else F.lit(0).cast("long")
    sel = [F.col(by)]
    for i in range(len(conds)):
        sel += [F.col(f"_m{i}")["eid"].alias(f"e{i + 1}_id"),
                F.col(f"_m{i}")["ts"].alias(f"e{i + 1}_ts")]
    sel.append(spread.alias("spread_us"))
    return g.select(*sel).orderBy(by)
