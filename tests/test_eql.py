"""EQL sequence (plans/eql.py): pinned earliest-continuation semantics —
hand-built fixtures for greediness/no-backtracking/until/maxspan, plus a
seeded randomized differential against a brute-force pandas oracle."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark.plans.eql import eql_sequence

DDL = "event_id long, ts timestamp, user_id long, event_type string"
T0 = dt.datetime(2024, 1, 1)


def _ev(eid, minutes, user, etype):
    return (eid, T0 + dt.timedelta(minutes=minutes), user, etype)


def _steps():
    return [F.col("event_type") == t for t in ("a", "b", "c")]


def test_earliest_continuation_no_backtracking(spark):
    # user 1: a(0) b(1) c(2)  -> one full chain
    # user 2: a(0) b(1) [no c] b(3) ... greedy binds b(1); a later b never
    #         rebinds, but c AFTER the bound b still completes the chain
    # user 3: a(0) c(1) b(2)  -> b binds at 2, no c after -> no match
    rows = [
        _ev(0, 0, 1, "a"), _ev(1, 1, 1, "b"), _ev(2, 2, 1, "c"),
        _ev(3, 0, 2, "a"), _ev(4, 1, 2, "b"), _ev(5, 3, 2, "b"),
        _ev(6, 4, 2, "c"),
        _ev(7, 0, 3, "a"), _ev(8, 1, 3, "c"), _ev(9, 2, 3, "b"),
    ]
    df = spark.createDataFrame(rows, DDL)
    got = eql_sequence(df, _steps(), by="user_id").toPandas()
    assert got["user_id"].tolist() == [1, 2]
    assert got[got.user_id == 1][["e1_id", "e2_id", "e3_id"]].values.tolist() == [[0, 1, 2]]
    # user 2: b binds EARLIEST (id 4, not 5); c(6) completes
    assert got[got.user_id == 2][["e1_id", "e2_id", "e3_id"]].values.tolist() == [[3, 4, 6]]
    assert got[got.user_id == 1]["span_us"].iloc[0] == 2 * 60 * 1_000_000


def test_every_step1_match_starts_a_candidate(spark):
    # two a's share the same b,c continuation (ES: one match per state)
    rows = [_ev(0, 0, 1, "a"), _ev(1, 1, 1, "a"),
            _ev(2, 2, 1, "b"), _ev(3, 3, 1, "c")]
    df = spark.createDataFrame(rows, DDL)
    got = eql_sequence(df, _steps(), by="user_id").toPandas()
    assert got[["e1_id", "e2_id", "e3_id"]].values.tolist() == [[0, 2, 3], [1, 2, 3]]


def test_maxspan_inclusive(spark):
    rows = [_ev(0, 0, 1, "a"), _ev(1, 5, 1, "b"), _ev(2, 10, 1, "c")]
    df = spark.createDataFrame(rows, DDL)
    assert eql_sequence(df, _steps(), maxspan_s=600).count() == 1  # == span
    assert eql_sequence(df, _steps(), maxspan_s=599).count() == 0


def test_until_kills_pending_candidate(spark):
    # until event 'x' lands between a and b -> candidate dies; the
    # variant where x comes after the full chain doesn't affect it
    rows = [
        _ev(0, 0, 1, "a"), _ev(1, 1, 1, "x"), _ev(2, 2, 1, "b"), _ev(3, 3, 1, "c"),
        _ev(4, 0, 2, "a"), _ev(5, 1, 2, "b"), _ev(6, 2, 2, "c"), _ev(7, 3, 2, "x"),
    ]
    df = spark.createDataFrame(rows, DDL)
    got = eql_sequence(
        df, _steps(), by="user_id", until=F.col("event_type") == "x"
    ).toPandas()
    assert got["user_id"].tolist() == [2]


def _brute(pdf: pd.DataFrame, step_types, maxspan_us=None):
    out = []
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        for i in g.index[g["event_type"] == step_types[0]]:
            chain = [i]
            pos = i
            ok = True
            for st in step_types[1:]:
                nxt = g.index[(g.index > pos) & (g["event_type"] == st)]
                if len(nxt) == 0:
                    ok = False
                    break
                pos = nxt[0]
                chain.append(pos)
            if not ok:
                continue
            span = (g.loc[chain[-1], "ts"] - g.loc[chain[0], "ts"]) // np.timedelta64(1, "us")
            if maxspan_us is not None and span > maxspan_us:
                continue
            out.append((uid, *[int(g.loc[c, "event_id"]) for c in chain], int(span)))
    return sorted(out)


def test_randomized_differential_vs_bruteforce(spark):
    rng = np.random.default_rng(7)
    n = 600
    pdf = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.Timestamp(T0) + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
        "user_id": rng.integers(0, 12, n).astype(np.int64),
        "event_type": rng.choice(list("abcx"), n, p=[0.3, 0.3, 0.3, 0.1]),
    })
    df = spark.createDataFrame(pdf)
    got = eql_sequence(df, _steps(), by="user_id", maxspan_s=200_000).toPandas()
    got_t = sorted(
        (int(r.user_id), int(r.e1_id), int(r.e2_id), int(r.e3_id), int(r.span_us))
        for r in got.itertuples()
    )
    exp = _brute(pdf, ["a", "b", "c"], maxspan_us=200_000 * 1_000_000)
    assert got_t == exp and len(exp) > 20


def test_single_exchange_plan(spark):
    rng = np.random.default_rng(1)
    n = 200
    pdf = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.Timestamp(T0) + pd.to_timedelta(rng.integers(0, 10**5, n), unit="s"),
        "user_id": rng.integers(0, 5, n).astype(np.int64),
        "event_type": rng.choice(list("abc"), n),
    })
    df = spark.createDataFrame(pdf)
    plan = eql_sequence(df, _steps(), by="user_id")._jdf.queryExecution().executedPlan().toString()
    # all k-1 window passes share one hashpartitioning Exchange (the
    # final orderBy adds its range exchange; no join anywhere)
    assert plan.count("hashpartitioning") <= 1
    assert "Join" not in plan


def test_sample_earliest_per_condition(spark):
    rows = [
        # user 1 has all three types -> sample of the earliest each
        _ev(0, 5, 1, "a"), _ev(1, 1, 1, "a"), _ev(2, 3, 1, "b"), _ev(3, 2, 1, "c"),
        # user 2 misses 'c' -> no sample
        _ev(4, 0, 2, "a"), _ev(5, 1, 2, "b"),
    ]
    from bitcoin_ledger_2es_spark.plans.eql import eql_sample

    df = spark.createDataFrame(rows, DDL)
    got = eql_sample(df, _steps(), by="user_id").toPandas()
    assert got["user_id"].tolist() == [1]
    # earliest a is id 1 (minute 1), NOT id 0 (minute 5); no ordering
    # between slots (c binds at minute 2 < b's minute 3)
    assert got[["e1_id", "e2_id", "e3_id"]].values.tolist() == [[1, 2, 3]]
    assert got["spread_us"].iloc[0] == 2 * 60 * 1_000_000  # minutes 1..3


def test_sample_single_condition_spread_zero(spark):
    from bitcoin_ledger_2es_spark.plans.eql import eql_sample

    df = spark.createDataFrame([_ev(0, 0, 1, "a")], DDL)
    got = eql_sample(df, [F.col("event_type") == "a"]).toPandas()
    assert got["spread_us"].tolist() == [0]
