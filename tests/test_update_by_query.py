"""ES _update_by_query / _delete_by_query over the durable segment store
(public ES semantics: snapshot search + reindex of matching docs). The
engine's form: deterministic rewrite of ONLY the affected segments via
the same build_segment the ingest path uses, with a crash-safe
rename-aside protocol (commit = deleting the aside copy)."""

import re
import shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.sources.synth import TRANSCRIPTS_DDL, gen_transcripts_pdf
from bitcoin_ledger_2es_spark.streaming.incremental import (
    SegmentedSearcher,
    build_segment,
    delete_by_query,
    recover_rewrites,
    update_by_query,
)

CFG = DEFAULT.with_(docs_per_shard=256, block_size=32)
_TOK = re.compile(r"[a-z0-9_]+")


def _mk_segments(spark, tmp_path, n_conv=90, seed=33):
    """3 segments over disjoint conversation thirds + the full pdf."""
    root = str(tmp_path)
    full = gen_transcripts_pdf(n_conv, seed=seed)
    convs = sorted(full["conv_id"].unique())
    parts = [convs[:30], convs[30:60], convs[60:]]
    for i, cs in enumerate(parts):
        df = spark.createDataFrame(full[full["conv_id"].isin(cs)], TRANSCRIPTS_DDL)
        build_segment(spark, df, root, i, CFG)
    return root, full, parts


def _matching_turns(pdf: pd.DataFrame, term: str) -> pd.DataFrame:
    m = pdf["text"].str.lower().apply(lambda t: term in _TOK.findall(t))
    return pdf[m]


def test_update_by_query_rewrites_matching_turns(spark, tmp_path):
    root, full, parts = _mk_segments(spark, tmp_path)
    term = "w0005"
    matches = _matching_turns(full, term)
    assert len(matches) > 0

    # snapshot the untouched segment check: a term present in only SOME
    # segments leaves the others byte-untouched (mtime proxy)
    transform = F.regexp_replace(F.col("text"), "(?i)w0005", "zzznew")
    n = update_by_query(spark, root, term, transform, cfg=CFG)
    assert n == len(matches)

    seg = SegmentedSearcher(spark, root, CFG)
    assert seg.top_k(term, k=10_000).count() == 0  # token globally gone
    hit_convs = {
        r["conv_id"]
        for r in seg.top_k("zzznew", k=10_000).collect()
        if not r["is_rollup"]
    }
    assert hit_convs == set(matches["conv_id"])

    # equivalence with a from-scratch index over the transformed corpus:
    # same global stats, so (conv_id, turn_idx, score_f32) must agree
    upd = full.copy()
    mask = upd["text"].str.lower().apply(lambda t: term in _TOK.findall(t))
    upd.loc[mask, "text"] = upd.loc[mask, "text"].str.replace(
        "w0005", "zzznew", case=False, regex=False
    )
    scratch = BM25Searcher(
        build_index(spark.createDataFrame(upd, TRANSCRIPTS_DDL), CFG)
    )
    for q in ["zzznew", "w0000 w0002", "w0004"]:
        a = seg.top_k(q, k=40).toPandas()
        b = scratch.top_k(q, k=40).toPandas()
        assert (
            a[["conv_id", "turn_idx"]].values.tolist()
            == b[["conv_id", "turn_idx"]].values.tolist()
        ), q
        np.testing.assert_array_equal(
            a["score"].to_numpy(np.float32), b["score"].to_numpy(np.float32)
        )


def test_update_skips_unaffected_segments(spark, tmp_path):
    root, full, parts = _mk_segments(spark, tmp_path)
    # find a term confined to segment 0's conversations
    seg0 = set(parts[0])
    tok_by_seg = [
        set().union(
            *full[full["conv_id"].isin(set(cs))]["text"]
            .str.lower()
            .apply(_TOK.findall)
        )
        for cs in parts
    ]
    only0 = sorted(tok_by_seg[0] - tok_by_seg[1] - tok_by_seg[2])
    assert only0, "synthetic corpus should have segment-local rare terms"
    term = only0[0]

    def sig(i):
        d = Path(root) / "segments" / f"seg_{i:06d}" / "index"
        return sorted((p.name, p.stat().st_mtime_ns) for p in d.rglob("*") if p.is_file())

    before = [sig(1), sig(2)]
    n = update_by_query(
        spark, root, term, F.regexp_replace(F.col("text"), term, "zzzq"), cfg=CFG
    )
    assert n == len(_matching_turns(full[full["conv_id"].isin(seg0)], term))
    assert [sig(1), sig(2)] == before  # untouched segments never rewritten


def test_delete_by_query_and_segment_retirement(spark, tmp_path):
    root, full, parts = _mk_segments(spark, tmp_path)
    term = "w0004"
    matches = _matching_turns(full, term)
    n = delete_by_query(spark, root, term, cfg=CFG)
    assert n == len(matches)
    seg = SegmentedSearcher(spark, root, CFG)
    # deleted turns gone AND their conv rollups rebuilt without the token
    assert seg.top_k(term, k=10_000).count() == 0
    # remaining docs = all turns minus deleted, plus surviving conv rollups
    kept = full[~full.index.isin(matches.index)]
    assert seg.n_docs == len(kept) + kept["conv_id"].nunique()

    # deleting EVERYTHING retires all segments
    n2 = delete_by_query(spark, root, "", mode="and", cfg=CFG)
    assert n2 == len(kept)
    assert not list((Path(root) / "segments").glob("seg_*"))


def test_rewrite_crash_rolls_back(spark, tmp_path):
    root, full, parts = _mk_segments(spark, tmp_path)
    seg1 = Path(root) / "segments" / "seg_000001"
    aside = Path(root) / "segments" / "_rewriting_000001"
    before = SegmentedSearcher(spark, root, CFG).top_k("w0002", k=30).toPandas()

    # simulate a crash mid-rebuild: old segment renamed aside, partial
    # new segment on disk, staging dir present — rewrite NOT committed
    seg1.rename(aside)
    (seg1 / "index").mkdir(parents=True)
    (seg1 / "index" / "junk").write_text("partial")
    staging = Path(root) / "segments" / "_rewrite_src_000001"
    staging.mkdir()
    recover_rewrites(root)
    assert seg1.exists() and not aside.exists() and not staging.exists()

    after = SegmentedSearcher(spark, root, CFG).top_k("w0002", k=30).toPandas()
    pd.testing.assert_frame_equal(before, after)
