"""Reciprocal Rank Fusion (ES rrf retriever): exact contribution math,
retriever-order f64 fold, rank_window cutoff, tie handling."""

import pytest

from bitcoin_ledger_2es_spark.plans.query import rrf_fuse


def test_rrf_fuse_exact_math(spark):
    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(3, 1), (1, 2), (9, 3)], "doc_id long, rank int"
    )
    got = rrf_fuse([a, b], rank_constant=60, k=10).toPandas()
    # mirror the engine's fold: acc = 0.0, retriever 0 first, then 1
    exp = {
        1: (0.0 + 1.0 / 61) + 1.0 / 62,
        2: (0.0 + 1.0 / 62),
        3: (0.0 + 1.0 / 63) + 1.0 / 61,
        9: (0.0 + 1.0 / 63),
    }
    order = sorted(exp, key=lambda d: (-exp[d], d))
    assert got["doc_id"].tolist() == order
    assert got["rrf"].tolist() == [exp[d] for d in order]
    assert got["rank"].tolist() == [1, 2, 3, 4]


def test_rrf_fuse_rank_window_and_k(spark):
    a = spark.createDataFrame(
        [(i, i) for i in range(1, 31)], "doc_id long, rank int"
    )
    got = rrf_fuse([a], rank_constant=60, rank_window=20, k=5).toPandas()
    # ranks > 20 contribute nothing; top-5 by rrf = original top-5
    assert got["doc_id"].tolist() == [1, 2, 3, 4, 5]
    assert got["rrf"].tolist() == [1.0 / (60 + r) for r in range(1, 6)]


def test_rrf_fuse_tie_breaks_doc_id_asc(spark):
    a = spark.createDataFrame([(7, 1)], "doc_id long, rank int")
    b = spark.createDataFrame([(4, 1)], "doc_id long, rank int")
    got = rrf_fuse([a, b], k=10).toPandas()
    assert got["doc_id"].tolist() == [4, 7]  # equal rrf -> id asc


def test_rrf_fuse_empty_input_list_raises(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_linear_fuse_minmax_weighted(spark):
    from bitcoin_ledger_2es_spark.plans.query import linear_fuse

    a = spark.createDataFrame(
        [(1, 1, 10.0), (2, 2, 6.0), (3, 3, 2.0)],
        "doc_id long, rank int, score float",
    )
    b = spark.createDataFrame(
        [(3, 1, 0.9), (1, 2, 0.5), (9, 3, 0.1)],
        "doc_id long, rank int, score float",
    )
    got = linear_fuse([a, b], weights=[0.7, 0.3], k=10).toPandas()
    # minmax over each window: a -> (10,2), b -> (0.9,0.1)
    import numpy as np

    f32 = lambda x: float(np.float32(x))
    na = lambda s: (f32(s) - f32(2.0)) / (f32(10.0) - f32(2.0))
    nb = lambda s: (f32(s) - f32(0.1)) / (f32(0.9) - f32(0.1))
    exp = {
        1: (0.0 + 0.7 * na(10.0)) + 0.3 * nb(0.5),
        2: 0.0 + 0.7 * na(6.0),
        3: (0.0 + 0.7 * na(2.0)) + 0.3 * nb(0.9),
        9: 0.0 + 0.3 * nb(0.1),
    }
    order = sorted(exp, key=lambda d: (-exp[d], d))
    assert got["doc_id"].tolist() == order
    assert got["score"].tolist() == [exp[d] for d in order]


def test_linear_fuse_degenerate_window_and_rank_window(spark):
    from bitcoin_ledger_2es_spark.plans.query import linear_fuse

    a = spark.createDataFrame(
        [(7, 1, 5.0), (8, 2, 1.0)], "doc_id long, rank int, score float"
    )
    # rank_window=1 leaves one row -> max==min -> norm 1.0
    got = linear_fuse([a], rank_window=1, k=5).toPandas()
    assert got["doc_id"].tolist() == [7]
    assert got["score"].tolist() == [1.0]
    # normalizer='none' sums raw scores
    got2 = linear_fuse([a], normalizer="none", k=5).toPandas()
    assert got2["score"].tolist() == [5.0, 1.0]


def test_linear_fuse_validation(spark):
    from bitcoin_ledger_2es_spark.plans.query import linear_fuse

    a = spark.createDataFrame([(1, 1, 1.0)], "doc_id long, rank int, score float")
    with pytest.raises(ValueError, match="at least one"):
        linear_fuse([])
    with pytest.raises(ValueError, match="normalizer"):
        linear_fuse([a], normalizer="zscore")
    with pytest.raises(ValueError, match="weights"):
        linear_fuse([a], weights=[1.0, 2.0])
