"""Resume contract (north rule): kill mid-merge -> re-run -> byte-identical
index, with per-shard lineage + checksums recording the committed work."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.plans.lineage import build_index_resumable, read_lineage

CFG = DEFAULT.with_(docs_per_shard=128, block_size=32, n_waves=4)


def _canon_postings(spark, path):
    pdf = spark.read.parquet(f"{path}/postings").toPandas()
    for c in ("doc_id_deltas", "tfs", "dls"):
        pdf[c] = pdf[c].apply(bytes)
    return (
        pdf.sort_values(["term_id", "shard_id", "block_id"])
        .reset_index(drop=True)[
            ["term_id", "shard_id", "block_id", "first_doc_id", "last_doc_id",
             "n_docs", "doc_id_deltas", "tfs", "dls", "block_max_score"]
        ]
    )


def test_kill_resume_byte_identical(spark, tiny_df, tmp_path):
    full, part = str(tmp_path / "full"), str(tmp_path / "part")

    build_index_resumable(spark, tiny_df, full, CFG)

    with pytest.raises(RuntimeError, match="injected failure"):
        build_index_resumable(spark, tiny_df, part, CFG, _fail_after_wave=2)

    lin = read_lineage(spark, part)
    done_shards = lin.filter(F.col("stage") == "postings").count()
    assert 0 < done_shards  # some shards committed before the kill
    total_shards = read_lineage(spark, full).filter(F.col("stage") == "postings").count()
    assert done_shards < total_shards  # ...but not all

    ix = build_index_resumable(spark, tiny_df, part, CFG)  # resume

    pd.testing.assert_frame_equal(_canon_postings(spark, full), _canon_postings(spark, part))

    # lineage: every shard logged COMPLETE exactly once, checksums match the
    # uninterrupted build's
    def sums(path):
        return {
            r["partition_id"]: r["checksum"]
            for r in read_lineage(spark, path).filter(F.col("stage") == "postings").collect()
        }

    assert sums(part) == sums(full)
    assert ix.n_docs == spark.read.parquet(f"{full}/docmap").count()


def test_rerun_is_noop(spark, tiny_df, tmp_path):
    path = str(tmp_path / "ix")
    build_index_resumable(spark, tiny_df, path, CFG)
    before = _canon_postings(spark, path)
    n_lineage = read_lineage(spark, path).count()
    build_index_resumable(spark, tiny_df, path, CFG)  # second run: all skipped
    pd.testing.assert_frame_equal(before, _canon_postings(spark, path))
    assert read_lineage(spark, path).count() == n_lineage


def test_kill_between_commit_and_log_resumes_byte_identical(spark, tiny_df, tmp_path):
    """The crash window BETWEEN a wave's parquet commit and its lineage
    append: the committed-but-unlogged shard dirs must be reconciled away
    on resume, not re-appended (which would duplicate every block)."""
    full, part = str(tmp_path / "full"), str(tmp_path / "part")
    build_index_resumable(spark, tiny_df, full, CFG)

    with pytest.raises(RuntimeError, match="before logging"):
        build_index_resumable(spark, tiny_df, part, CFG, _fail_before_log=2)

    lin = read_lineage(spark, part)
    logged = {
        r["partition_id"]
        for r in lin.filter(F.col("stage") == "postings").collect()
    }
    on_disk = {
        int(d.name.split("=")[1])
        for d in (__import__("pathlib").Path(part) / "postings").glob("shard_id=*")
    }
    assert on_disk - logged  # the unlogged-but-committed wave exists on disk

    build_index_resumable(spark, tiny_df, part, CFG)  # resume must reconcile

    pd.testing.assert_frame_equal(_canon_postings(spark, full), _canon_postings(spark, part))
    # no duplicated doc within any (term, shard): postings strictly ascending
    post = _canon_postings(spark, part)
    assert not post.duplicated(["term_id", "shard_id", "block_id"]).any()


def test_resume_with_changed_content_config_is_refused(spark, tiny_df, tmp_path):
    """Resuming a partial build with a different content-affecting config
    would mix shards built under two configs into one index silently
    (committed shards skipped, pending ones rebuilt with the new cfg).
    The resume guard must fail loudly instead."""
    path = str(tmp_path / "part")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index_resumable(spark, tiny_df, path, CFG, _fail_after_wave=2)

    with pytest.raises(ValueError, match="different content config"):
        build_index_resumable(spark, tiny_df, path, CFG.with_(docs_per_shard=256))
    with pytest.raises(ValueError, match="different content config"):
        build_index_resumable(spark, tiny_df, path, CFG.with_(store_positions=True))

    # execution-only knobs may differ freely: resume completes
    ix = build_index_resumable(spark, tiny_df, path, CFG.with_(n_waves=2))
    assert ix.n_docs > 0


def test_oversized_doc_rejected_for_positional_build(spark, tmp_path):
    """store_positions=True must reject docs over the 2^21 position budget
    at BUILD time (the phrase kernel packs positions into int64 keys)."""
    from bitcoin_ledger_2es_spark import build_index

    big = spark.createDataFrame(
        [("c0", 0, "user", "tok " * (1 << 21), None, "2024-01-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="position budget"):
        build_index(big, CFG.with_(store_positions=True, index_rollups=False))
    # without positions the same corpus builds fine
    ix = build_index(big, CFG.with_(index_rollups=False))
    assert ix.n_docs == 1


def test_read_index_adopts_persisted_content_config(spark, tiny_df, tmp_path):
    """Opening an index with a WRONG docs_per_shard must not corrupt
    queries: read_index adopts the persisted content knobs."""
    from bitcoin_ledger_2es_spark import BM25Searcher, build_index
    from bitcoin_ledger_2es_spark.plans.build import read_index, write_index

    path = str(tmp_path / "ix")
    ix = build_index(tiny_df, CFG)
    write_index(ix, path)
    expected = BM25Searcher(ix).top_k("w0000 w0003", k=5, with_meta=False).toPandas()

    wrong = DEFAULT.with_(docs_per_shard=1 << 16, block_size=128)  # NOT what was written
    reopened = read_index(spark, path, wrong)
    assert reopened.cfg.docs_per_shard == CFG.docs_per_shard
    assert reopened.cfg.block_size == CFG.block_size
    got = BM25Searcher(reopened).top_k("w0000 w0003", k=5, with_meta=False).toPandas()
    pd.testing.assert_frame_equal(expected, got)
