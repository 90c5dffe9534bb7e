"""ES retriever-tree API (plans/retriever.py): a pure dispatcher onto
existing surfaces — every node pinned result-identical to calling the
underlying surface directly."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.plans.query import linear_fuse, rrf_fuse
from bitcoin_ledger_2es_spark.plans.retriever import retriever_search

CFG = DEFAULT.with_(docs_per_shard=128, block_size=32)


@pytest.fixture(scope="module")
def s(spark, tiny_df):
    return BM25Searcher(build_index(tiny_df, CFG))


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "vec_id": range(50),
        "embedding": list(rng.normal(size=(50, 8))),
    })
    return spark.createDataFrame(pdf)


def test_standard_string_is_query_string(s):
    got = retriever_search(s, {"standard": {"query": "w0001 w0003"}}, k=5)
    exp = s.query_string("w0001 w0003", k=5, with_meta=False)
    assert got.toPandas()[["rank", "doc_id"]].values.tolist() == \
        exp.toPandas()[["rank", "doc_id"]].values.tolist()


def test_standard_dsl_dict_is_wrapper_dispatch(s):
    got = retriever_search(
        s, {"standard": {"query": {"match": {"text": "w0001 w0003"}}}}, k=5)
    exp = s.top_k("w0001 w0003", k=5, with_meta=False)
    assert got.toPandas()[["rank", "doc_id"]].values.tolist() == \
        exp.toPandas()[["rank", "doc_id"]].values.tolist()


def test_rrf_tree_matches_manual_fuse(s):
    tree = {"rrf": {
        "retrievers": [
            {"standard": {"query": "w0001"}},
            {"standard": {"query": "w0005"}},
        ],
        "rank_constant": 60, "rank_window_size": 8,
    }}
    got = retriever_search(s, tree, k=5).toPandas()
    a = s.query_string("w0001", k=8, with_meta=False)
    b = s.query_string("w0005", k=8, with_meta=False)
    exp = rrf_fuse([a, b], rank_constant=60, rank_window=8, k=5).toPandas()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert np.array_equal(got["score"].to_numpy(), exp["rrf"].to_numpy())


def test_linear_tree_matches_manual_fuse(s):
    tree = {"linear": {
        "retrievers": [
            {"retriever": {"standard": {"query": "w0001"}}, "weight": 0.7},
            {"retriever": {"standard": {"query": "w0005"}}, "weight": 0.3},
        ],
        "rank_window_size": 8,
    }}
    got = retriever_search(s, tree, k=5).toPandas()
    a = s.query_string("w0001", k=8, with_meta=False)
    b = s.query_string("w0005", k=8, with_meta=False)
    exp = linear_fuse([a, b], weights=[0.7, 0.3], rank_window=8,
                      k=5).toPandas()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert np.array_equal(got["score"].to_numpy(), exp["score"].to_numpy())


def test_knn_node_and_hybrid_rrf(s, vecs):
    qv = [0.5] * 8
    knn_node = {"knn": {"query_vector": qv, "k": 10, "num_candidates": 20}}
    got = retriever_search(s, knn_node, k=10, knn_vectors=vecs).toPandas()
    from bitcoin_ledger_2es_spark.operators.similarity import knn_search

    queries = vecs.sparkSession.createDataFrame(
        [(0, qv)], "q_id long, q_vec array<double>")
    exp = knn_search(vecs, queries, k=10, num_candidates=20).toPandas()
    assert got["doc_id"].tolist() == exp["neighbor_id"].tolist()
    hybrid = {"rrf": {"retrievers": [
        {"standard": {"query": "w0001"}}, knn_node,
    ], "rank_window_size": 10}}
    hp = retriever_search(s, hybrid, k=5, knn_vectors=vecs).toPandas()
    assert len(hp) == 5 and list(hp.columns) == ["rank", "doc_id", "score"]


def test_pinned_node_matches_surface(s):
    tree = {"pinned": {"ids": [7, 3],
                       "retriever": {"standard": {"query": "w0001"}}}}
    got = retriever_search(s, tree, k=6).toPandas()
    exp = s.pinned([7, 3], "w0001", k=6, with_meta=False).toPandas()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["doc_id"].tolist()[:2] == [7, 3]


def test_rescorer_node(s):
    fn = lambda pdf: pdf["doc_id"].to_numpy(np.float64) % 3
    tree = {"rescorer": {
        "rescore": {"window_size": 12},
        "retriever": {"standard": {"query": "w0001 w0003"}},
    }}
    got = retriever_search(s, tree, k=5, rescore_fn=fn).toPandas()
    exp = s.rescore_top_k("w0001 w0003", fn, k=5, window=12).toPandas()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert np.array_equal(got["score"].to_numpy(),
                          exp["final_score"].to_numpy())


def test_retriever_misuse_raises(s, vecs):
    with pytest.raises(ValueError, match="single-key"):
        retriever_search(s, {"rrf": {}, "linear": {}})
    with pytest.raises(ValueError, match="unsupported retriever"):
        retriever_search(s, {"made_up": {}})
    with pytest.raises(ValueError, match="inference model"):
        retriever_search(s, {"text_similarity_reranker": {}})
    with pytest.raises(ValueError, match="filter"):
        retriever_search(
            s, {"standard": {"query": "x", "filter": {"term": {}}}})
    with pytest.raises(ValueError, match=">= 2 retrievers"):
        retriever_search(
            s, {"rrf": {"retrievers": [{"standard": {"query": "x"}}]}})
    with pytest.raises(ValueError, match="knn_vectors"):
        retriever_search(s, {"knn": {"query_vector": [0.0] * 8}})
    with pytest.raises(ValueError, match="rescore_fn"):
        retriever_search(s, {"rescorer": {
            "retriever": {"standard": {"query": "x"}}}})
    with pytest.raises(ValueError, match="needs a standard retriever"):
        retriever_search(s, {"pinned": {
            "ids": [1],
            "retriever": {"rrf": {"retrievers": [
                {"standard": {"query": "a"}},
                {"standard": {"query": "b"}}]}}}})
    with pytest.raises(ValueError, match="one normalizer"):
        retriever_search(s, {"linear": {"retrievers": [
            {"retriever": {"standard": {"query": "a"}},
             "normalizer": "minmax"},
            {"retriever": {"standard": {"query": "b"}},
             "normalizer": "none"},
        ]}})


def test_rule_node_matches_surface(s):
    ruleset = [
        {"type": "pinned",
         "criteria": [{"type": "exact", "metadata": "q", "values": ["w0001"]}],
         "ids": [7, 3]},
        {"type": "exclude", "criteria": [{"type": "always"}], "ids": [5]},
    ]
    tree = {"rule": {"ruleset": ruleset, "match_criteria": {"q": "w0001"},
                     "retriever": {"standard": {"query": "w0001"}}}}
    got = retriever_search(s, tree, k=6).toPandas()
    exp = s.rule_query(ruleset, {"q": "w0001"}, "w0001", k=6,
                       with_meta=False).toPandas()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["doc_id"].tolist()[:2] == [7, 3]
    assert 5 not in got["doc_id"].tolist()
    with pytest.raises(ValueError, match="rule retriever needs"):
        retriever_search(s, {"rule": {"retriever":
                                      {"standard": {"query": "x"}}}}, k=3)
