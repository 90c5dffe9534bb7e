"""Partition-aligned (zero-exchange) query path: scoring inside the scan
stage must return results identical to the groupBy path, with one fewer
shuffle in the plan."""

import pandas as pd
import pytest

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.plans.build import read_index, write_index

CFG = DEFAULT.with_(docs_per_shard=128, block_size=32, store_positions=True)

QUERIES = [
    ("w0000 w0003", "or", 10),
    ("w0001", "or", 5),
    ("w0000 w0002", "and", 10),
    ("w0400 w0000 w0777", "or", 50),
]


@pytest.fixture(scope="module")
def on_disk(spark, tiny_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("aligned") / "ix")
    write_index(build_index(tiny_df, CFG), path)
    return read_index(spark, path, CFG)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_aligned_identical_to_grouped(spark, on_disk):
    base = BM25Searcher(on_disk, aligned=False)
    fast = BM25Searcher(on_disk, aligned=True)
    for q, mode, k in QUERIES:
        a = base.top_k(q, k=k, mode=mode, with_meta=False).toPandas()
        b = fast.top_k(q, k=k, mode=mode, with_meta=False).toPandas()
        pd.testing.assert_frame_equal(a, b)
    # phrase path too
    pa_ = base.phrase_query("w0000 w0001", k=10).toPandas()
    pb = fast.phrase_query("w0000 w0001", k=10).toPandas()
    pd.testing.assert_frame_equal(pa_, pb)


def test_aligned_removes_shard_exchange(spark, on_disk):
    base = BM25Searcher(on_disk, aligned=False).top_k("w0000 w0003", k=5, with_meta=False)
    fast = BM25Searcher(on_disk, aligned=True).top_k("w0000 w0003", k=5, with_meta=False)
    p_base, p_fast = _plan(base), _plan(fast)
    assert "FlatMapGroupsInPandas" in p_base and "MapInPandas" in p_fast
    assert "FlatMapGroupsInPandas" not in p_fast
    # the aligned plan drops exactly the shard_id hash exchange
    assert p_fast.count("Exchange") == p_base.count("Exchange") - 1


def test_aligned_guard_oversized_file(spark, on_disk, tiny_df):
    """A postings file larger than maxPartitionBytes would be SPLIT across
    scan tasks -> partial shard scores. The guard must refuse aligned=True,
    auto mode must fall back to the grouped path, and with a normal
    threshold auto mode must pick the aligned path for on-disk indexes."""
    from bitcoin_ledger_2es_spark.plans.query import aligned_layout_ok

    assert aligned_layout_ok(on_disk)
    assert BM25Searcher(on_disk).aligned  # auto: on-disk layout -> aligned
    # in-memory index: no on-disk layout -> grouped, aligned=True refused
    mem = build_index(tiny_df, CFG)
    assert not BM25Searcher(mem).aligned
    with pytest.raises(ValueError, match="aligned=True requires"):
        BM25Searcher(mem, aligned=True)
    # shrink the split threshold below the postings file size
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "64")
        assert not aligned_layout_ok(on_disk)
        assert not BM25Searcher(on_disk).aligned  # auto falls back
        with pytest.raises(ValueError, match="maxPartitionBytes"):
            BM25Searcher(on_disk, aligned=True)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_aligned_msearch_identical(spark, on_disk):
    qset = pd.DataFrame(
        {
            "query_id": [0, 1, 2],
            "query_text": ["w0000 w0003", "w0001", "w0000 w0002"],
            "k": [10, 5, 10],
            "mode": ["or", "or", "and"],
        }
    )
    a = (
        BM25Searcher(on_disk, aligned=False)
        .top_k_batch(qset)
        .orderBy("query_id", "rank")
        .toPandas()
    )
    b = (
        BM25Searcher(on_disk, aligned=True)
        .top_k_batch(qset)
        .orderBy("query_id", "rank")
        .toPandas()
    )
    pd.testing.assert_frame_equal(a, b)
