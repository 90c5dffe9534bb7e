"""M2 gate: the engine's indexed top-k must be rank-identical — (doc_id,
score_f32) sequences — to the brute-force pandas oracle on the full
reference query set (FIXTURES.md §2), for both the vectorized-exact and
the block-max-WAND scorers."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark import BM25Searcher, PandasOracle, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.sources.synth import gen_query_set


@pytest.fixture(scope="module")
def small_cfg():
    # tiny shards so the 200-conv corpus spans multiple shards
    return DEFAULT.with_(docs_per_shard=256, block_size=32)


@pytest.fixture(scope="module")
def ix(spark, tiny_df, small_cfg):
    return build_index(tiny_df, small_cfg)


def corpus_docs_pdf(src: pd.DataFrame) -> pd.DataFrame:
    """First-principles (doc_id, text): turns ranked by (conv_id, turn_idx),
    then rollup docs (turn texts joined by ' ') ranked by conv_id — the
    docID spec the engine must match, computed independently in pandas."""
    t = src.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    turns = pd.DataFrame({"doc_id": np.arange(len(t), dtype=np.int64), "text": t["text"]})
    roll = t.groupby("conv_id", sort=True)["text"].apply(" ".join).reset_index()
    roll["doc_id"] = len(t) + np.arange(len(roll), dtype=np.int64)
    return pd.concat([turns, roll[["doc_id", "text"]]], ignore_index=True)


@pytest.fixture(scope="module")
def oracle(tiny_pdf, small_cfg):
    return PandasOracle(corpus_docs_pdf(tiny_pdf), small_cfg)


@pytest.fixture(scope="module")
def queries():
    return gen_query_set()


def test_batch_matches_oracle(ix, oracle, queries):
    """top_k_batch (msearch analogue) is rank-identical to the oracle for
    the whole query set, answered in one job."""
    res = BM25Searcher(ix).top_k_batch(queries).toPandas()
    for q in queries.itertuples(index=False):
        golden = oracle.top_k(q.query_text, k=int(q.k), mode=q.mode)
        got = res[res["query_id"] == q.query_id].sort_values("rank")
        assert got["doc_id"].tolist() == golden["doc_id"].tolist(), (q.query_text, q.mode)
        np.testing.assert_array_equal(
            got["score"].to_numpy(np.float32), golden["score"].to_numpy(np.float32)
        )


def test_rank_identical_vs_oracle(ix, oracle, queries):
    searcher_w = BM25Searcher(ix, use_wand=True)
    searcher_e = BM25Searcher(ix, use_wand=False)
    for q in queries.itertuples(index=False):
        golden = oracle.top_k(q.query_text, k=int(q.k), mode=q.mode)
        for s in (searcher_w, searcher_e):
            got = (
                s.top_k(q.query_text, k=int(q.k), mode=q.mode)
                .select("rank", "doc_id", "score")
                .toPandas()
            )
            assert got["doc_id"].tolist() == golden["doc_id"].tolist(), (
                q.query_text, q.mode, q.k, s is searcher_w)
            np.testing.assert_array_equal(
                got["score"].to_numpy(np.float32), golden["score"].to_numpy(np.float32)
            )
