"""Per-doc durable soft deletes over the segment store (public ES/Lucene
live-docs model — SURVEY.md §0; no reference code exists):

* ``soft_delete_by_query`` writes per-segment tombstone SIDECARS and
  rewrites ZERO segment files — the ES ``_delete_by_query`` shape, where
  space is reclaimed only at merge/expunge;
* tombstoned docs (matched docs + their conversations' rollup docs)
  vanish from top_k/match_docs/count immediately, while corpus stats
  keep counting them — surviving scores are BIT-IDENTICAL across the
  delete;
* repeated calls accumulate without double-counting;
* surfaces without an allowed-mask hook (phrase family) and operations
  that would carry dead docs forward (compact / merge_segments) refuse
  with pending sidecars;
* ``expunge_store`` rewrites exactly the affected segments and the
  result is rank- and score-identical to a from-scratch index over the
  live corpus (refreshed rollups included);
* the physical ``update_by_query``/``delete_by_query`` rewrite path
  folds sidecars in — soft-deleted rows are never resurrected;
* crash leftovers (``_deletes_tmp_*``) are rolled back by
  ``recover_rewrites``.
"""

import re
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.sources.synth import TRANSCRIPTS_DDL, gen_transcripts_pdf
from bitcoin_ledger_2es_spark.streaming.compaction import merge_segments
from bitcoin_ledger_2es_spark.streaming.incremental import (
    SegmentedSearcher,
    compact,
    expunge_store,
    recover_rewrites,
    soft_delete_by_query,
    update_by_query,
)
from bitcoin_ledger_2es_spark.streaming.incremental import (
    build_segment,
)

CFG = DEFAULT.with_(docs_per_shard=256, block_size=32)
_TOK = re.compile(r"[a-z0-9_]+")

DEL_TERM = "w0005"
QUERIES = ["w0000 w0005", "w0005 w0004", "w0002"]


def _mk_segments(spark, tmp_path, n_conv=90, seed=33):
    root = str(tmp_path)
    full = gen_transcripts_pdf(n_conv, seed=seed)
    convs = sorted(full["conv_id"].unique())
    parts = [convs[:30], convs[30:60], convs[60:]]
    for i, cs in enumerate(parts):
        df = spark.createDataFrame(full[full["conv_id"].isin(cs)], TRANSCRIPTS_DDL)
        build_segment(spark, df, root, i, CFG)
    return root, full, parts


def _seg_files(root):
    """(relpath, size, mtime_ns) of every file under segments/, sidecars
    excluded — the 'no segment file was touched' witness."""
    base = Path(root) / "segments"
    return sorted(
        (str(p.relative_to(base)), p.stat().st_size, p.stat().st_mtime_ns)
        for p in base.rglob("*")
        if p.is_file() and "deletes" not in p.relative_to(base).parts
    )


def _expected_tombs(searcher, term):
    """First-principles tombstone set: docs matching ``term`` plus the
    rollup docs of every conversation with a matching TURN."""
    hits = searcher.match_docs(term).toPandas()
    convs = set(hits.loc[~hits["is_rollup"], "conv_id"])
    dm = searcher._docmap_all.filter(F.col("is_rollup")).toPandas()
    rolls = set(dm.loc[dm["conv_id"].isin(convs), "doc_id"].astype(int))
    return set(hits["doc_id"].astype(int)) | rolls


def test_soft_delete_zero_rewrites_bitwise_survivors(spark, tmp_path):
    root, full, parts = _mk_segments(spark, tmp_path)
    s0 = SegmentedSearcher(spark, root, CFG)
    n_all = s0.count("")
    big = s0.n_docs
    pre = {q: s0.top_k(q, k=big).toPandas() for q in QUERIES}
    tombs = _expected_tombs(s0, DEL_TERM)
    assert tombs

    before = _seg_files(root)
    n = soft_delete_by_query(spark, root, DEL_TERM, cfg=CFG)
    assert n == len(tombs)
    # ZERO segment rewrites: every pre-existing file byte- and mtime-
    # untouched; the only new files are the sidecars
    assert _seg_files(root) == before
    assert any((d / "deletes").is_dir() for d in (Path(root) / "segments").iterdir())

    s = SegmentedSearcher(spark, root, CFG)
    # stats still count tombstones (Lucene deleted-docs model)...
    assert s.n_docs == s0.n_docs and s.avgdl == s0.avgdl
    # ...but serving excludes them, with survivors' scores bit-identical
    for q in QUERIES:
        post = s.top_k(q, k=big).toPandas()
        exp = pre[q][~pre[q]["doc_id"].isin(tombs)].reset_index(drop=True)
        assert post["doc_id"].tolist() == exp["doc_id"].tolist(), q
        np.testing.assert_array_equal(
            post["score"].to_numpy(np.float32), exp["score"].to_numpy(np.float32)
        )
        assert post["rank"].tolist() == list(range(1, len(post) + 1))
    assert s.match_docs(DEL_TERM).count() == 0
    assert s.count("") == n_all - len(tombs)
    # filter context composes with tombstones
    flt = s.match_docs("w0000", doc_filter=~F.col("is_rollup")).toPandas()
    assert not set(flt["doc_id"].astype(int)) & tombs
    assert not flt["is_rollup"].any()


def test_soft_delete_accumulates_without_double_count(spark, tmp_path):
    root, full, parts = _mk_segments(spark, tmp_path)
    s0 = SegmentedSearcher(spark, root, CFG)
    t1 = _expected_tombs(s0, DEL_TERM)
    t2 = _expected_tombs(s0, "w0004")
    assert soft_delete_by_query(spark, root, DEL_TERM, cfg=CFG) == len(t1)
    assert soft_delete_by_query(spark, root, DEL_TERM, cfg=CFG) == 0
    # overlapping second delete counts only NEWLY tombstoned docs
    assert soft_delete_by_query(spark, root, "w0004", cfg=CFG) == len(t2 - t1)
    s = SegmentedSearcher(spark, root, CFG)
    assert s.count("") == s0.count("") - len(t1 | t2)


def test_pending_tombstones_refuse_unsafe_surfaces(spark, tmp_path):
    root, full, parts = _mk_segments(spark, tmp_path)
    assert soft_delete_by_query(spark, root, DEL_TERM, cfg=CFG) > 0
    s = SegmentedSearcher(spark, root, CFG)
    with pytest.raises(ValueError, match="soft-delete"):
        s.phrase_query("w0000 w0001")
    with pytest.raises(ValueError, match="expunge_store"):
        compact(spark, root, CFG)
    with pytest.raises(ValueError, match="expunge_store"):
        merge_segments(spark, root, cfg=CFG)


def test_expunge_matches_scratch_index_over_live_corpus(spark, tmp_path):
    root, full, parts = _mk_segments(spark, tmp_path)
    s0 = SegmentedSearcher(spark, root, CFG)
    n_turn_tombs = s0.match_docs(DEL_TERM).filter(~F.col("is_rollup")).count()
    soft_delete_by_query(spark, root, DEL_TERM, cfg=CFG)

    assert expunge_store(spark, root, CFG) == n_turn_tombs
    # sidecars consumed
    assert not any(
        (d / "deletes").is_dir() for d in (Path(root) / "segments").iterdir()
    )
    s = SegmentedSearcher(spark, root, CFG)
    # refreshed rollups no longer contain the deleted turns' text
    assert s.match_docs(DEL_TERM).count() == 0
    # live stats recomputed; equivalence with a from-scratch index over
    # the live corpus: same (conv_id, turn_idx) ranking, same f32 scores
    live = full[
        ~full["text"].str.lower().apply(lambda t: DEL_TERM in _TOK.findall(t))
    ]
    scratch = BM25Searcher(
        build_index(spark.createDataFrame(live, TRANSCRIPTS_DDL), CFG)
    )
    assert s.n_docs == scratch.ix.n_docs
    for q in ["w0000 w0002", "w0004", "w0001 w0003"]:
        a = s.top_k(q, k=40).toPandas()
        b = scratch.top_k(q, k=40).toPandas()
        assert (
            a[["conv_id", "turn_idx"]].values.tolist()
            == b[["conv_id", "turn_idx"]].values.tolist()
        ), q
        np.testing.assert_array_equal(
            a["score"].to_numpy(np.float32), b["score"].to_numpy(np.float32)
        )
    # idempotent: nothing left to expunge
    assert expunge_store(spark, root, CFG) == 0
    # clean store compacts again
    compact(spark, root, CFG)


def test_physical_rewrite_never_resurrects_soft_deletes(spark, tmp_path):
    root, full, parts = _mk_segments(spark, tmp_path)
    s0 = SegmentedSearcher(spark, root, CFG)
    n_live0 = s0.count("")  # before any mutation: s0 is a pre-rewrite view
    tomb_keys = {
        (r["conv_id"], r["turn_idx"])
        for r in s0.match_docs(DEL_TERM).filter(~F.col("is_rollup")).collect()
    }
    assert tomb_keys
    soft_delete_by_query(spark, root, DEL_TERM, cfg=CFG)
    # physical update on an unrelated term rebuilds matching segments
    # from raw — the sidecar fold must keep soft-deleted rows out (note:
    # a rebuild renumbers doc_ids, so assertions compare (conv, turn)
    # keys, never pre-rewrite doc_ids)
    update_by_query(
        spark, root, "w0000",
        F.regexp_replace(F.col("text"), "(?i)w0000", "zzzupd"), cfg=CFG,
    )
    s = SegmentedSearcher(spark, root, CFG)
    assert s.match_docs(DEL_TERM, mode="or").count() == 0
    got = {
        (r["conv_id"], r["turn_idx"])
        for r in s.match_docs("zzzupd").filter(~F.col("is_rollup")).collect()
    }
    assert got and not got & tomb_keys
    # some turns were physically dropped by the fold, others stay
    # tombstoned in untouched segments — the store serves strictly fewer
    # docs than before the delete
    assert s.count("") < n_live0


def test_recover_rewrites_cleans_delete_staging(spark, tmp_path):
    root, full, parts = _mk_segments(spark, tmp_path)
    staging = Path(root) / "segments" / "_deletes_tmp_deadbeef"
    staging.mkdir()
    (staging / "part-0.parquet").write_bytes(b"junk")
    recover_rewrites(root)
    assert not staging.exists()
