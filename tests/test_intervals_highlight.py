"""Interval-aware highlighting + the token-level evaluator face: the
intervals a highlighter marks must be exactly the intervals the shard
kernel scores (same kernels, point sources from token positions)."""

import numpy as np
import pytest

from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.functions.analyze import analyze_query, analyze_tokens
from bitcoin_ledger_2es_spark.operators.intervals import (
    Iv,
    eval_over_tokens,
    merge_token_ranges,
)

CFG = DEFAULT


def _an(t):
    return analyze_query(t, CFG)


def test_eval_over_tokens_basics():
    toks = "a x b a b c a".split()
    # ordered a..b within gaps 1: chains (0,2 g1), (3,4 g0); minimal keeps both
    ivl = eval_over_tokens(Iv.match("a b", max_gaps=1, ordered=True), toks, _an)
    assert list(zip(ivl.l, ivl.r)) == [(0, 2), (3, 4)]
    # not_containing x kills (0,2)
    ivl2 = eval_over_tokens(
        Iv.match("a b", max_gaps=1, ordered=True).not_containing(Iv.match("x")),
        toks, _an,
    )
    assert list(zip(ivl2.l, ivl2.r)) == [(3, 4)]
    # prefix expansion against the doc's own vocab
    ivl3 = eval_over_tokens(Iv.prefix("a"), toks, _an)
    assert ivl3.l.tolist() == [0, 3, 6]
    # fuzzy: 'b'~1 matches a, b, c, x (all 1 edit) — every position
    ivl4 = eval_over_tokens(Iv.fuzzy("b", 1), toks, _an)
    assert ivl4.l.tolist() == list(range(7))
    # OOV match -> empty
    assert eval_over_tokens(Iv.match("zzz"), toks, _an).doc.size == 0


def test_merge_token_ranges():
    from bitcoin_ledger_2es_spark.operators.intervals import Ivl

    def ivl(rows):
        a = np.asarray(rows, dtype=np.int64).reshape(-1, 4)
        return Ivl(a[:, 0], a[:, 1], a[:, 2], a[:, 3])

    # overlapping + adjacent merge; disjoint stays split
    got = merge_token_ranges(ivl([[0, 0, 2, 1], [0, 2, 4, 1], [0, 6, 7, 1]]))
    assert got == [(0, 4), (6, 7)]
    assert merge_token_ranges(ivl([]).__class__(
        np.empty(0, np.int64), np.empty(0, np.int64),
        np.empty(0, np.int64), np.empty(0, np.int64))) == []


def test_intervals_highlight_col(spark):
    from pyspark.sql import functions as F

    from bitcoin_ledger_2es_spark.functions.highlight import intervals_highlight_col

    df = spark.createDataFrame(
        [(0, "the big data table wins"), (1, "table before big data"),
         (2, "no hits here")],
        "doc_id long, text string",
    )
    spec = Iv.all_of([Iv.match("big data", ordered=True), Iv.match("table")],
                     max_gaps=2, ordered=True)
    out = (
        df.withColumn("hl", intervals_highlight_col(F.col("text"), spec, CFG))
        .orderBy("doc_id").toPandas()
    )
    # doc 0: big data .. table in order within 2 gaps -> one merged span
    assert out.loc[0, "hl"] == "the <em>big data table</em> wins"
    # doc 1: table comes FIRST -> ordered all_of cannot match
    assert out.loc[1, "hl"] == "table before big data"
    assert out.loc[2, "hl"] == "no hits here"


def test_analyze_tokens_api():
    got = analyze_tokens("Hello, World_2 again", CFG)
    assert [t["token"] for t in got] == ["hello", "world_2", "again"]
    assert [(t["start_offset"], t["end_offset"]) for t in got] == [
        (0, 5), (7, 14), (15, 20)
    ]
    assert [t["position"] for t in got] == [0, 1, 2]
    assert analyze_tokens(None, CFG) == []
