"""Round-5 query-family additions (public ES semantics):

* ``has_parent`` — parents are the ROLLUP docs (turns concatenated in
  turn order, indexed alongside the turns with shared statistics — the
  one-index ES parent/child model). Children carry the parent's f32
  score verbatim (score=True) or constant 1.0 (score=False, filter
  context). Exact vs a PandasOracle over the union (turns + rollups)
  corpus; raises on an index built without rollups.
* ``parent_id`` — all live children of one parent, constant 1.0.
* ``sparse_vector_query`` — dot product of query token weights and the
  documented deterministic doc-weight stand-in tf(token, doc); exact vs
  a pandas dot product; duplicate expansion tokens sum their weights;
  OOV tokens contribute nothing; multi-token input raises.
* ``distance_feature`` — boost*pivot/(pivot+|field-origin|) added in
  f64 onto the verbatim f32 BM25 score, f32 emit; docs missing the
  source row contribute 0. Exact vs oracle + numpy recompute.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark import BM25Searcher, PandasOracle, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT

CFG_ROLL = DEFAULT.with_(docs_per_shard=128, block_size=32, index_rollups=True)
CFG_FLAT = DEFAULT.with_(docs_per_shard=128, block_size=32, index_rollups=False)

QUERY = "w0000 w0002"


@pytest.fixture(scope="module")
def env_roll(spark, tiny_df, tiny_pdf):
    ix = build_index(tiny_df, CFG_ROLL)
    s = BM25Searcher(ix)
    dm = ix.docmap.select(
        "doc_id", "conv_id", "turn_idx", "is_rollup"
    ).toPandas()
    turns = dm[~dm["is_rollup"]].merge(tiny_pdf, on=["conv_id", "turn_idx"])
    # rollup text: turn texts joined by single spaces in turn order
    roll_text = (
        tiny_pdf.sort_values(["conv_id", "turn_idx"])
        .groupby("conv_id")["text"].agg(" ".join).reset_index()
    )
    rolls = dm[dm["is_rollup"]].merge(roll_text, on="conv_id")
    union = pd.concat(
        [turns[["doc_id", "text"]], rolls[["doc_id", "text"]]],
        ignore_index=True,
    )
    oracle = PandasOracle(union, CFG_ROLL)
    return s, dm, turns, rolls, oracle


def test_has_parent_scores_exact(env_roll):
    s, dm, turns, rolls, oracle = env_roll
    got = s.has_parent(QUERY, mode="or", score=True).toPandas()
    full = oracle.top_k(QUERY, k=1_000_000, mode="or")
    pscore = rolls.merge(full, on="doc_id")[["conv_id", "score"]]
    exp = turns.merge(pscore, on="conv_id")[["doc_id", "score"]]
    assert len(got) == len(exp)
    m = got.merge(exp, on="doc_id", suffixes=("_g", "_e"))
    assert len(m) == len(exp)
    # parent f32 score propagates bit-verbatim
    assert np.array_equal(
        m["score_g"].to_numpy(np.float32), m["score_e"].to_numpy(np.float32)
    )


def test_has_parent_filter_context(env_roll):
    s, dm, turns, rolls, oracle = env_roll
    got = s.has_parent(QUERY, mode="or", score=False).toPandas()
    assert (got["score"] == np.float32(1.0)).all()
    full = oracle.top_k(QUERY, k=1_000_000, mode="or")
    convs = set(rolls.merge(full, on="doc_id")["conv_id"])
    exp_ids = set(turns[turns["conv_id"].isin(convs)]["doc_id"])
    assert set(got["doc_id"]) == exp_ids


def test_has_parent_topk_rank(env_roll):
    s, dm, turns, rolls, oracle = env_roll
    got = s.has_parent(QUERY, mode="or", score=True, k=10).toPandas()
    assert got["rank"].tolist() == list(range(1, 11))
    full = s.has_parent(QUERY, mode="or", score=True).toPandas()
    exp = full.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(10)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()


def test_has_parent_requires_rollups(spark, tiny_df):
    s = BM25Searcher(build_index(tiny_df, CFG_FLAT))
    with pytest.raises(ValueError, match="index_rollups"):
        s.has_parent(QUERY)


def test_parent_id(env_roll):
    s, dm, turns, rolls, oracle = env_roll
    conv = turns["conv_id"].iloc[0]
    got = s.parent_id(conv).toPandas()
    exp = turns[turns["conv_id"] == conv]
    assert set(got["doc_id"]) == set(exp["doc_id"])
    assert (got["score"] == np.float32(1.0)).all()


@pytest.fixture(scope="module")
def env_flat(spark, tiny_df, tiny_pdf):
    ix = build_index(tiny_df, CFG_FLAT)
    s = BM25Searcher(ix)
    dm = ix.docmap.select("doc_id", "conv_id", "turn_idx").toPandas()
    src = dm.merge(tiny_pdf, on=["conv_id", "turn_idx"])
    oracle = PandasOracle(
        pd.DataFrame({"doc_id": src["doc_id"], "text": src["text"]}),
        CFG_FLAT,
    )
    return s, src, oracle


def test_sparse_vector_exact(env_flat):
    s, src, oracle = env_flat
    weights = {"w0000": 2.5, "w0002": 0.75, "zzz_not_in_vocab": 9.0}
    got = s.sparse_vector_query(weights).toPandas()
    # pandas twin: tf per (doc, term) from the oracle postings
    from bitcoin_ledger_2es_spark.functions.analyze import tokenize_series

    toks = tokenize_series(src["text"], CFG_FLAT)
    rows = []
    for did, ts in zip(src["doc_id"], toks):
        acc = 0.0
        c = pd.Series(ts).value_counts()
        for t in sorted(weights):  # ascending term order fold
            if t in c.index:
                acc += weights[t] * float(c[t])
        if acc > 0.0:
            rows.append((did, np.float32(acc)))
    exp = pd.DataFrame(rows, columns=["doc_id", "score"])
    m = got.merge(exp, on="doc_id", suffixes=("_g", "_e"))
    assert len(m) == len(exp) == len(got)
    assert np.array_equal(
        m["score_g"].to_numpy(np.float32), m["score_e"].to_numpy(np.float32)
    )


def test_sparse_vector_duplicate_and_errors(env_flat):
    s, src, oracle = env_flat
    a = s.sparse_vector_query({"w0000": 1.0, "W0000": 2.0}).toPandas()
    b = s.sparse_vector_query({"w0000": 3.0}).toPandas()
    m = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert len(m) == len(a) == len(b)
    assert np.array_equal(
        m["score_a"].to_numpy(np.float32), m["score_b"].to_numpy(np.float32)
    )
    with pytest.raises(ValueError, match="single term"):
        s.sparse_vector_query({"two words": 1.0})
    assert s.sparse_vector_query({"zzzz_oov": 1.0}).count() == 0


def test_distance_feature_exact(env_flat, tiny_df):
    s, src, oracle = env_flat
    origin_us = int(pd.Timestamp("2024-01-01").value // 1_000)
    pivot_us = 7 * 24 * 3600 * 1_000_000.0
    got = s.distance_feature(
        QUERY, tiny_df, "unix_micros(cast(ts as timestamp))",
        origin=origin_us, pivot=pivot_us, boost=1.5, mode="or",
    ).toPandas()
    full = oracle.top_k(QUERY, k=1_000_000, mode="or")
    j = full.merge(src[["doc_id", "ts"]], on="doc_id")
    ts_us = (
        pd.to_datetime(j["ts"]).astype("datetime64[us, UTC]")
        .astype("int64").to_numpy()
    )
    dist = np.abs(ts_us.astype(np.float64) - float(origin_us))
    # boost * (pivot / (pivot + dist)) — the distance_feature_col assoc
    contrib = 1.5 * (pivot_us / (pivot_us + dist))
    exp_score = (
        j["score"].to_numpy(np.float32).astype(np.float64) + contrib
    ).astype(np.float32)
    exp = pd.DataFrame({"doc_id": j["doc_id"], "score": exp_score})
    m = got.merge(exp, on="doc_id", suffixes=("_g", "_e"))
    assert len(m) == len(exp) == len(got)
    assert np.array_equal(
        m["score_g"].to_numpy(np.float32), m["score_e"].to_numpy(np.float32)
    )


def test_distance_feature_missing_field_contributes_zero(env_flat, spark):
    s, src, oracle = env_flat
    # a source frame covering NO docs: every contribution coalesces to 0
    empty_src = spark.createDataFrame(
        [], "conv_id string, turn_idx int, ts timestamp"
    )
    got = s.distance_feature(
        QUERY, empty_src, "unix_micros(cast(ts as timestamp))",
        origin=0.0, pivot=1.0, boost=1.0,
    ).toPandas()
    full = oracle.top_k(QUERY, k=1_000_000, mode="or")
    m = got.merge(full, on="doc_id", suffixes=("_g", "_e"))
    assert len(m) == len(got) == len(full)
    assert np.array_equal(
        m["score_g"].to_numpy(np.float32), m["score_e"].to_numpy(np.float32)
    )
