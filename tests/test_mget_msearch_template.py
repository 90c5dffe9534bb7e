"""ES _mget (batched GET by id) and _msearch/template (rendered batch
search): request-order fidelity, found=false reporting, tombstone
interaction, and rank-identity of both msearch_template dispatch paths
(plain -> top_k_batch single-scan; operator syntax -> query_string)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT

CFG = DEFAULT.with_(docs_per_shard=512, block_size=32, store_positions=True)


@pytest.fixture(scope="module")
def searcher(spark, tiny_df):
    return BM25Searcher(build_index(tiny_df, CFG))


def test_mget_order_duplicates_and_missing(searcher):
    ids = [5, 10**12, 5, 0]  # dup + an id far beyond the corpus
    got = searcher.mget(ids).toPandas()
    assert got["req_idx"].tolist() == [0, 1, 2, 3]
    assert got["doc_id"].tolist() == ids
    assert got["found"].tolist() == [True, False, True, True]
    # missing id carries null metadata, found rows carry real metadata
    assert got.loc[1, "conv_id"] is None or pd.isna(got.loc[1, "conv_id"])
    assert got.loc[0, "conv_id"] == got.loc[2, "conv_id"] != ""
    # metadata agrees with the docmap fetch the search surfaces use
    hit = searcher.ix.docmap.filter(F.col("doc_id") == 5).toPandas()
    assert got.loc[0, "conv_id"] == hit["conv_id"].iloc[0]
    assert got.loc[0, "turn_idx"] == hit["turn_idx"].iloc[0]


def test_mget_reads_tombstones_as_not_found(spark, tiny_df):
    s = BM25Searcher(build_index(tiny_df, CFG))
    doc = int(s.top_k("w0001", k=1).toPandas()["doc_id"].iloc[0])
    assert s.mget([doc]).toPandas()["found"].iloc[0]
    assert s.delete_by_query(doc_filter=F.col("doc_id") == doc) >= 1
    got = s.mget([doc, 0]).toPandas()
    assert got["found"].tolist()[0] is np.False_ or not got["found"].iloc[0]
    assert got["found"].iloc[1]  # unrelated doc unaffected
    s.discard_deletes()


def test_mget_empty_request_raises(searcher):
    with pytest.raises(ValueError, match="at least one"):
        searcher.mget([])


def test_msearch_template_mixed_batch_rank_identity(searcher):
    templates = [
        ("{{q}}", {"q": "w0001 w0005"}),                # plain -> batch path
        ('"{{a}} {{b}}"', {"a": "w0001", "b": "w0002"}),  # phrase -> qs path
        ("{{#join}}terms{{/join}}", {"terms": ["w0003", "w0007"]}),  # plain
    ]
    got = searcher.msearch_template(templates, k=8).toPandas()
    assert set(got["query_id"]) <= {0, 1, 2}
    for qid, expect in (
        (0, searcher.top_k("w0001 w0005", k=8, with_meta=False)),
        (1, searcher.query_string('"w0001 w0002"', k=8, with_meta=False)),
        (2, searcher.top_k("w0003 w0007", k=8, with_meta=False)),
    ):
        g = got[got["query_id"] == qid].reset_index(drop=True)
        e = expect.toPandas()
        assert g["doc_id"].tolist() == e["doc_id"].tolist(), qid
        assert np.array_equal(
            g["score"].to_numpy(np.float32), e["score"].to_numpy(np.float32)
        ), qid


def test_msearch_template_plain_batch_is_one_scan(searcher):
    # two plain templates must go through top_k_batch together: assert
    # via the job-count discipline the msearch surface already uses —
    # the plan contains ONE postings scan for the union of terms.
    df = searcher.msearch_template(
        [("{{q}}", {"q": "w0001"}), ("{{q}}", {"q": "w0002"})], k=5
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("postings") <= 2  # one scan (+reuse line)
    got = df.toPandas()
    assert set(got["query_id"]) == {0, 1}
