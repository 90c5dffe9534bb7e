"""Posting-level segment compaction: merging segments from their POSTINGS
(no raw text) must be byte-identical to a from-scratch build over the
concatenated sources — the engine's determinism machinery makes this a
full-content equality check on postings, dictionary, and docmap."""

import shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.sources.synth import TRANSCRIPTS_DDL, gen_transcripts_pdf
from bitcoin_ledger_2es_spark.streaming.incremental import build_segment, compact

CFG = DEFAULT.with_(docs_per_shard=256, block_size=32, store_positions=True)


def _canon_postings(df) -> pd.DataFrame:
    pdf = df.toPandas()
    for c in ("doc_id_deltas", "tfs", "dls", "poss"):
        pdf[c] = pdf[c].apply(bytes)
    cols = ["term_id", "shard_id", "block_id", "first_doc_id", "last_doc_id",
            "n_docs", "doc_id_deltas", "tfs", "dls", "poss", "block_max_score"]
    return pdf.sort_values(["term_id", "shard_id", "block_id"]).reset_index(drop=True)[cols]


def _canon(df, key) -> pd.DataFrame:
    pdf = df.toPandas()
    return pdf.sort_values(key).reset_index(drop=True)[sorted(pdf.columns)]


@pytest.fixture(scope="module")
def seg_env(spark, tmp_path_factory):
    """3 segments over disjoint conversation sets + the full corpus df."""
    root = str(tmp_path_factory.mktemp("compact_root"))
    full = gen_transcripts_pdf(90, seed=21)
    convs = sorted(full["conv_id"].unique())
    for i, cs in enumerate([convs[:30], convs[30:60], convs[60:]]):
        df = spark.createDataFrame(full[full["conv_id"].isin(cs)], TRANSCRIPTS_DDL)
        build_segment(spark, df, root, i, CFG)
    full_df = spark.createDataFrame(full, TRANSCRIPTS_DDL)
    return root, full_df


def test_posting_level_compact_byte_identical(spark, seg_env):
    root, full_df = seg_env
    scratch = build_index(full_df, CFG)

    # the point of posting-level merge: raw sources are NOT needed
    for d in (Path(root) / "segments").iterdir():
        t = d / "transcripts"
        if t.exists():
            shutil.rmtree(t)

    merged = compact(spark, root, CFG, from_postings=True)

    pd.testing.assert_frame_equal(
        _canon_postings(merged.postings), _canon_postings(scratch.postings)
    )
    pd.testing.assert_frame_equal(
        _canon(merged.dictionary, ["term_id"]), _canon(scratch.dictionary, ["term_id"])
    )
    pd.testing.assert_frame_equal(
        _canon(merged.docmap, ["doc_id"]), _canon(scratch.docmap, ["doc_id"])
    )
    assert merged.n_docs == scratch.n_docs
    assert merged.avgdl == scratch.avgdl

    # queries over the compacted index are rank-identical to from-scratch
    for q, mode in [("w0000 w0005", "or"), ("w0000 w0002", "and")]:
        a = BM25Searcher(merged).top_k(q, k=10, mode=mode, with_meta=False).toPandas()
        b = BM25Searcher(scratch).top_k(q, k=10, mode=mode, with_meta=False).toPandas()
        pd.testing.assert_frame_equal(a, b)
    # positional path survives the merge byte-exactly too
    pa_ = BM25Searcher(merged).phrase_query("w0000 w0001", k=10).toPandas()
    pb = BM25Searcher(scratch).phrase_query("w0000 w0001", k=10).toPandas()
    pd.testing.assert_frame_equal(pa_, pb)


def test_split_conversation_refused(spark, tmp_path):
    """A conv_id spanning two segments cannot be re-rolled-up from postings
    — compaction must refuse loudly, and the raw path still works."""
    root = str(tmp_path / "root")
    full = gen_transcripts_pdf(10, seed=5)
    conv = sorted(full["conv_id"].unique())[0]
    rows = full[full["conv_id"] == conv]
    assert len(rows) >= 2
    half = len(rows) // 2
    build_segment(spark, spark.createDataFrame(rows.iloc[:half], TRANSCRIPTS_DDL), root, 0, CFG)
    build_segment(spark, spark.createDataFrame(rows.iloc[half:], TRANSCRIPTS_DDL), root, 1, CFG)
    with pytest.raises(ValueError, match="spans multiple segments"):
        compact(spark, root, CFG, from_postings=True)
    ix = compact(spark, root, CFG.with_(store_positions=True), from_postings=False)
    assert ix.n_docs > 0


def test_tiered_merge_in_place(spark, tmp_path):
    """merge_segments merges a subset in place: the merged segment must be
    byte-identical to build_segment over the participants' concatenated
    batches, untouched segments survive, and search results over the root
    are unchanged."""
    from bitcoin_ledger_2es_spark.plans.build import read_index
    from bitcoin_ledger_2es_spark.streaming.compaction import merge_segments
    from bitcoin_ledger_2es_spark.streaming.incremental import SegmentedSearcher

    root = str(tmp_path / "root")
    ref_root = str(tmp_path / "ref")
    full = gen_transcripts_pdf(60, seed=31)
    convs = sorted(full["conv_id"].unique())
    batches = [convs[:20], convs[20:40], convs[40:]]
    for i, cs in enumerate(batches):
        df = spark.createDataFrame(full[full["conv_id"].isin(cs)], TRANSCRIPTS_DDL)
        build_segment(spark, df, root, i, CFG)

    before = (
        SegmentedSearcher(spark, root, CFG)
        .top_k("w0000 w0003", k=15)
        .toPandas()
    )

    survivor = merge_segments(spark, root, seg_ids=[0, 1], cfg=CFG)
    assert survivor == 0
    segs = sorted(p.name for p in (Path(root) / "segments").iterdir())
    assert segs == ["seg_000000", "seg_000002"]

    # reference: one segment built directly from batches 0+1 at seg id 0
    df01 = spark.createDataFrame(
        full[full["conv_id"].isin(batches[0] + batches[1])], TRANSCRIPTS_DDL
    )
    build_segment(spark, df01, ref_root, 0, CFG)
    merged_ix = read_index(spark, str(Path(root) / "segments/seg_000000/index"), CFG)
    ref_ix = read_index(spark, str(Path(ref_root) / "segments/seg_000000/index"), CFG)
    pd.testing.assert_frame_equal(
        _canon_postings(merged_ix.postings), _canon_postings(ref_ix.postings)
    )
    pd.testing.assert_frame_equal(
        _canon(merged_ix.docmap, ["doc_id"]), _canon(ref_ix.docmap, ["doc_id"])
    )

    after = (
        SegmentedSearcher(spark, root, CFG)
        .top_k("w0000 w0003", k=15)
        .toPandas()
    )
    # doc_ids are re-based into the surviving segment's id space by design;
    # the DOCUMENTS and their scores must be unchanged
    key = ["conv_id", "turn_idx", "is_rollup", "score"]
    pd.testing.assert_frame_equal(
        before[key].sort_values(key).reset_index(drop=True),
        after[key].sort_values(key).reset_index(drop=True),
    )


def test_iterated_tiered_merge_converges_to_full_rebuild(spark, tmp_path):
    """Repeatedly merging pairs (including a previously-merged segment)
    must converge to the same bytes as one from-scratch build — the
    tiered policy's steady-state invariant."""
    from bitcoin_ledger_2es_spark.plans.build import read_index
    from bitcoin_ledger_2es_spark.streaming.compaction import merge_segments

    cfg = CFG.with_(store_positions=False)  # also covers the no-poss layout
    root = str(tmp_path / "root")
    full = gen_transcripts_pdf(80, seed=47)
    convs = sorted(full["conv_id"].unique())
    quarters = [convs[i::4] for i in range(4)]
    for i, cs in enumerate(quarters):
        df = spark.createDataFrame(full[full["conv_id"].isin(cs)], TRANSCRIPTS_DDL)
        build_segment(spark, df, root, i, cfg)

    assert merge_segments(spark, root, seg_ids=[0, 1], cfg=cfg) == 0
    assert merge_segments(spark, root, seg_ids=[2, 3], cfg=cfg) == 2
    # merge of MERGED segments (read back from disk)
    assert merge_segments(spark, root, seg_ids=[0, 2], cfg=cfg) == 0
    segs = sorted(p.name for p in (Path(root) / "segments").iterdir())
    assert segs == ["seg_000000"]

    merged = read_index(spark, str(Path(root) / "segments/seg_000000/index"), cfg)
    scratch = build_index(spark.createDataFrame(full, TRANSCRIPTS_DDL), cfg)
    m = merged.postings.toPandas()
    s = scratch.postings.toPandas()
    for c in ("doc_id_deltas", "tfs", "dls", "poss"):
        m[c] = m[c].apply(bytes)
        s[c] = s[c].apply(bytes)
    # the shard_id partition column reads back as int32 from disk
    m["shard_id"] = m["shard_id"].astype("int64")
    s["shard_id"] = s["shard_id"].astype("int64")
    key = ["term_id", "shard_id", "block_id"]
    cols = ["term_id", "shard_id", "block_id", "first_doc_id", "last_doc_id",
            "n_docs", "doc_id_deltas", "tfs", "dls", "poss", "block_max_score"]
    pd.testing.assert_frame_equal(
        m.sort_values(key).reset_index(drop=True)[cols],
        s.sort_values(key).reset_index(drop=True)[cols],
    )


def test_merge_swap_crash_recovery(spark, tmp_path, monkeypatch):
    """A crash AFTER the merge committed (tmp tree + _COMMIT marker
    written, swap not yet done) must not lose the merged postings:
    recover_merges — run automatically by the open paths — finishes the
    swap, byte-identical to an uninterrupted merge. An UNcommitted
    _merging_* leftover is discarded and its participants survive."""
    import bitcoin_ledger_2es_spark.streaming.compaction as C
    from bitcoin_ledger_2es_spark.plans.build import read_index
    from bitcoin_ledger_2es_spark.streaming.incremental import SegmentedSearcher

    full = gen_transcripts_pdf(40, seed=53)
    convs = sorted(full["conv_id"].unique())
    halves = [convs[:20], convs[20:]]

    def build_root(name):
        root = str(tmp_path / name)
        for i, cs in enumerate(halves):
            df = spark.createDataFrame(full[full["conv_id"].isin(cs)], TRANSCRIPTS_DDL)
            build_segment(spark, df, root, i, CFG)
        return root

    root_clean, root_crash = build_root("clean"), build_root("crash")
    C.merge_segments(spark, root_clean, seg_ids=[0, 1], cfg=CFG)

    monkeypatch.setattr(C, "_complete_swap", lambda *a, **k: None)  # "crash"
    C.merge_segments(spark, root_crash, seg_ids=[0, 1], cfg=CFG)
    monkeypatch.undo()
    segdir = Path(root_crash) / "segments"
    assert (segdir / "_merging_000000" / "_COMMIT").exists()
    assert (segdir / "seg_000000").exists() and (segdir / "seg_000001").exists()

    # opening the root (SegmentedSearcher) completes the committed swap
    s = SegmentedSearcher(spark, root_crash, CFG)
    assert s.top_k("w0000", k=5).count() > 0
    assert sorted(p.name for p in segdir.iterdir()) == ["seg_000000"]
    got = read_index(spark, str(segdir / "seg_000000" / "index"), CFG)
    ref = read_index(
        spark, str(Path(root_clean) / "segments" / "seg_000000" / "index"), CFG
    )
    pd.testing.assert_frame_equal(
        _canon_postings(got.postings), _canon_postings(ref.postings)
    )

    # an uncommitted partial write is discarded; the live segment survives
    junk = segdir / "_merging_000099"
    (junk / "index").mkdir(parents=True)
    (junk / "index" / "half.parquet").write_bytes(b"partial")
    C.recover_merges(root_crash)
    assert not junk.exists()
    assert (segdir / "seg_000000").exists()

    # _complete_swap is idempotent from the mid-cleanup state too
    C._complete_swap(segdir, 0, [0, 1])
    assert sorted(p.name for p in segdir.iterdir()) == ["seg_000000"]
