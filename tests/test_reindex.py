"""_reindex: content identity vs a direct build, script transforms,
segment-store sources, max_docs determinism, atomic overwrite + alias swap."""

import shutil
from pathlib import Path

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.plans.build import read_index, write_index
from bitcoin_ledger_2es_spark.plans.reindex import reindex
from bitcoin_ledger_2es_spark.plans.snapshot import open_alias, put_alias
from bitcoin_ledger_2es_spark.sources.synth import (
    TRANSCRIPTS_DDL,
    gen_transcripts_pdf,
)
from bitcoin_ledger_2es_spark.streaming.incremental import build_segment

CFG = DEFAULT.with_(docs_per_shard=256, block_size=32)


def _canon(df, key):
    pdf = df.toPandas()
    for c in ("doc_id_deltas", "tfs", "dls", "poss"):
        if c in pdf.columns:
            pdf[c] = pdf[c].apply(bytes)
    return pdf.sort_values(key).reset_index(drop=True)[sorted(pdf.columns)]


def _assert_same_index(spark, a_path, b_path):
    a = read_index(spark, str(a_path), CFG)
    b = read_index(spark, str(b_path), CFG)
    pd.testing.assert_frame_equal(
        _canon(a.postings, ["term_id", "shard_id", "block_id"]),
        _canon(b.postings, ["term_id", "shard_id", "block_id"]),
    )
    pd.testing.assert_frame_equal(
        _canon(a.docmap, ["doc_id"]), _canon(b.docmap, ["doc_id"])
    )
    pd.testing.assert_frame_equal(
        _canon(a.dictionary, ["term_id"]), _canon(b.dictionary, ["term_id"])
    )


def test_reindex_filtered_matches_direct_build(spark, tiny_df, tmp_path):
    stats = reindex(
        spark, tiny_df, str(tmp_path / "dst"),
        query=F.col("role") == "user", cfg=CFG,
    )
    write_index(build_index(tiny_df.filter("role = 'user'"), CFG),
                str(tmp_path / "direct"))
    _assert_same_index(spark, tmp_path / "dst", tmp_path / "direct")
    n_user = tiny_df.filter("role = 'user'").count()
    assert stats["total"] == n_user
    assert stats["created"] >= n_user  # + conversation rollups
    # string-form query is accepted too and lands identically
    reindex(spark, tiny_df, str(tmp_path / "dst2"), query="role = 'user'",
            cfg=CFG)
    _assert_same_index(spark, tmp_path / "dst", tmp_path / "dst2")


def test_reindex_script_transform_and_schema_guard(spark, tiny_df, tmp_path):
    script = lambda df: df.withColumn("text", F.concat_ws(" ", "text", "role"))
    reindex(spark, tiny_df, str(tmp_path / "dst"), script=script, cfg=CFG)
    write_index(build_index(script(tiny_df), CFG), str(tmp_path / "direct"))
    _assert_same_index(spark, tmp_path / "dst", tmp_path / "direct")
    # the transformed index actually serves the rewrite
    s = BM25Searcher(read_index(spark, str(tmp_path / "dst"), CFG))
    assert s.top_k("assistant", k=5, with_meta=False).count() > 0

    with pytest.raises(ValueError, match="preserve the transcript schema"):
        reindex(spark, tiny_df, str(tmp_path / "bad"),
                script=lambda df: df.drop("tool"), cfg=CFG)
    with pytest.raises(ValueError, match="preserve the transcript schema"):
        reindex(spark, tiny_df, str(tmp_path / "bad"),
                script=lambda df: df.withColumn("turn_idx", F.lit("x")), cfg=CFG)
    assert not (tmp_path / "bad").exists()  # refused before any write


def test_reindex_from_segment_store(spark, tmp_path):
    full = gen_transcripts_pdf(60, seed=7)
    convs = sorted(full["conv_id"].unique())
    root = str(tmp_path / "store")
    for i, cs in enumerate([convs[:30], convs[30:]]):
        df = spark.createDataFrame(full[full["conv_id"].isin(cs)], TRANSCRIPTS_DDL)
        build_segment(spark, df, root, i, CFG)
    reindex(spark, root, str(tmp_path / "dst"), cfg=CFG)
    write_index(
        build_index(spark.createDataFrame(full, TRANSCRIPTS_DDL), CFG),
        str(tmp_path / "direct"),
    )
    _assert_same_index(spark, tmp_path / "dst", tmp_path / "direct")

    # dropped raw sources -> reindex must refuse, not silently under-read
    shutil.rmtree(Path(root) / "segments" / "seg_000001" / "transcripts")
    with pytest.raises(ValueError, match="retained _source"):
        reindex(spark, root, str(tmp_path / "dst3"), cfg=CFG)


def test_reindex_max_docs_stable_order(spark, tiny_df, tmp_path):
    reindex(spark, tiny_df, str(tmp_path / "dst"), max_docs=50, cfg=CFG)
    picked = tiny_df.orderBy("conv_id", "turn_idx").limit(50)
    write_index(build_index(picked, CFG), str(tmp_path / "direct"))
    _assert_same_index(spark, tmp_path / "dst", tmp_path / "direct")


def test_reindex_overwrite_and_alias_swap(spark, tiny_df, tmp_path):
    dst = tmp_path / "serving"
    reindex(spark, tiny_df, str(dst), cfg=CFG)
    with pytest.raises(FileExistsError):
        reindex(spark, tiny_df, str(dst), cfg=CFG)
    # zero-downtime idiom: reindex to a new path, swap the alias
    reg = str(tmp_path)
    put_alias(reg, "live", str(dst))
    dst2 = tmp_path / "serving_v2"
    reindex(spark, tiny_df, str(dst2), query="role = 'user'", cfg=CFG)
    put_alias(reg, "live", str(dst2))
    s = open_alias(spark, reg, "live", CFG)
    hits = s.top_k("w0001 w0005", k=10).toPandas()
    assert len(hits) > 0
    # overwrite path: retire-aside then commit — old tree fully replaced
    reindex(spark, tiny_df, str(dst), query="role = 'user'", cfg=CFG,
            overwrite=True)
    _assert_same_index(spark, dst, dst2)
    assert not (tmp_path / "serving.__retired__").exists()
    assert not (tmp_path / "serving.__reindexing__").exists()
