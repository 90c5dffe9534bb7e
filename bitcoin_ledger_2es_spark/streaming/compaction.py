"""Posting-level segment compaction (ES/Lucene-style segment merge).

``compact()``'s original path rebuilt the full index from the retained raw
micro-batch sources — O(corpus re-tokenize) per compaction, and it required
keeping every raw batch forever. This module merges segments from their
*postings*, the way Lucene merges segments:

  * new dense doc_ids are derived from the union of segment DOCMAPS alone
    (conv ranks + turn ranks — the same two-level stable-ID spec the
    builder uses, recomputed relationally; no text is read);
  * per-segment term_ids are translated through a merged dictionary
    (df/cf summed, term_id = rank in the merged sorted vocab);
  * posting blocks are DECODED (docs/tfs/dls/positions), doc_ids remapped,
    and re-cut into blocks of ``block_size`` under the new doc order;
    per-posting position streams are within-doc and carry over as exact
    byte slices (LEB128 is canonical, so slices == re-encodings);
  * block max scores are recomputed from the merged corpus stats
    (global df, n_docs, exact-integer avgdl), reproducing the from-scratch
    floats bit-for-bit.

The merged index is BYTE-IDENTICAL to ``build_index`` over the concatenated
raw sources (pinned by tests), but needs only the segments' index files.

Preconditions (validated): all segments share one content config, and no
conv_id spans two segments — a split conversation cannot be re-rolled-up
without its text (the segment model already treats conversations as atomic
per micro-batch).

Scale shape: two posting-granularity shuffles (the old->new doc_id join and
the re-shard), vs the raw path's tokenize + SPIMI shuffle — and no raw-text
retention. Tiered policies (merge only the k smallest segments) can reuse
``merge_postings_frames`` on a subset.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.bm25 import block_upper_bound, contrib, idf
from ..functions.codec import (
    decode_doc_gaps,
    decode_tfs,
    decode_varints,
    encode_varints,
    varint_lengths,
)
from ..operators.ids import with_global_rank
from ..operators.postings import POSTINGS_DDL
from ..plans.build import CORPUS_STATS_DDL, IndexFrames, corpus_stats_row, with_shard

_DECODED_DDL = (
    "term_id long, df long, doc_id long, tf int, dl int, possb binary"
)


def _decode_kernel():
    """Joined blocks (old postings + new term_id + global df) -> one row per
    posting: (new term_id, df, OLD doc_id, tf, dl, per-posting position
    bytes). Position slices are exact byte ranges of the block's stream —
    LEB128 is canonical, so re-concatenation under the new blocking equals
    a fresh encoding."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(1)
        for bt in batches:
            pdf = bt.to_pandas()
            if pdf.empty:
                continue
            tids, dfs, docs, tfs, dls, possb = [], [], [], [], [], []
            for r in pdf.itertuples(index=False):
                n = int(r.n_docs)
                d = decode_doc_gaps(r.doc_id_deltas, int(r.first_doc_id), n)
                t = decode_tfs(r.tfs)
                ln = decode_tfs(r.dls)
                docs.append(d)
                tfs.append(t)
                dls.append(ln)
                tids.append(np.full(n, int(r.new_term_id), dtype=np.int64))
                dfs.append(np.full(n, int(r.df), dtype=np.int64))
                buf = bytes(r.poss)
                if buf:
                    vals = decode_varints(buf)
                    ends = np.cumsum(varint_lengths(vals))
                    occ_ends = np.cumsum(t)  # occurrences per posting
                    byte_ends = ends[occ_ends - 1]
                    byte_starts = np.concatenate(([0], byte_ends[:-1]))
                    mv = memoryview(buf)
                    possb.extend(
                        bytes(mv[s:e]) for s, e in zip(byte_starts, byte_ends)
                    )
                else:
                    possb.extend(b"" for _ in range(n))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(tids)),
                    pa.array(np.concatenate(dfs)),
                    pa.array(np.concatenate(docs)),
                    pa.array(np.concatenate(tfs).astype(np.int32)),
                    pa.array(np.concatenate(dls).astype(np.int32)),
                    pa.array(possb, type=pa.binary()),
                ],
                names=["term_id", "df", "doc_id", "tf", "dl", "possb"],
            )

    return fn


def _reblock_kernel(n_docs: int, avgdl: float, cfg: EngineConfig):
    """One shard's remapped postings -> finalized blocks (POSTINGS_DDL),
    identical to the from-scratch SPIMI + finalize output: sort by
    (term_id, doc_id), cut blocks of block_size, delta+varint encode,
    recompute safe block max from the MERGED corpus stats."""
    block_size, k1, b = cfg.block_size, cfg.k1, cfg.b

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(1)
        parts = [bt.to_pandas() for bt in batches]
        parts = [p for p in parts if not p.empty]
        if not parts:
            return
        import pandas as pd

        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        pdf = pdf.sort_values(["shard_id", "term_id", "doc_id"], kind="mergesort")
        shard = pdf["shard_id"].to_numpy(np.int64)
        tid = pdf["term_id"].to_numpy(np.int64)
        doc = pdf["doc_id"].to_numpy(np.int64)
        tf = pdf["tf"].to_numpy(np.int64)
        dl = pdf["dl"].to_numpy(np.int64)
        dfreq = pdf["df"].to_numpy(np.int64)
        possb = pdf["possb"].tolist()
        n = len(pdf)

        seg_break = np.zeros(n, dtype=bool)
        seg_break[0] = True
        if n > 1:
            seg_break[1:] = (np.diff(tid) != 0) | (np.diff(shard) != 0)
        seg_starts = np.flatnonzero(seg_break)
        seg_ends = np.concatenate((seg_starts[1:], [n]))
        bstarts = np.concatenate(
            [np.arange(int(s0), int(s1), block_size) for s0, s1 in zip(seg_starts, seg_ends)]
        )
        bends = np.concatenate((bstarts[1:], [n]))
        seg_of_block = np.searchsorted(seg_starts, bstarts, side="right") - 1
        block_ids = (bstarts - seg_starts[seg_of_block]) // block_size

        out = {k: [] for k in (
            "shard_id", "term_id", "block_id", "first_doc_id", "last_doc_id",
            "n_docs", "doc_id_deltas", "tfs", "dls", "poss", "block_max_score",
        )}
        for bs, be, bi in zip(bstarts, bends, block_ids):
            d = doc[bs:be]
            t = tf[bs:be]
            ln = dl[bs:be]
            t_idf = idf(float(dfreq[bs]), n_docs)
            sc = contrib(t, ln, t_idf, avgdl, k1, b)
            out["shard_id"].append(int(shard[bs]))
            out["term_id"].append(int(tid[bs]))
            out["block_id"].append(int(bi))
            out["first_doc_id"].append(int(d[0]))
            out["last_doc_id"].append(int(d[-1]))
            out["n_docs"].append(int(be - bs))
            out["doc_id_deltas"].append(
                encode_varints(np.diff(d).astype(np.uint64)) if be - bs > 1 else b""
            )
            out["tfs"].append(encode_varints(t.astype(np.uint64)))
            out["dls"].append(encode_varints(ln.astype(np.uint64)))
            out["poss"].append(b"".join(possb[bs:be]))
            out["block_max_score"].append(np.float32(block_upper_bound(sc)))
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out["shard_id"], type=pa.int64()),
                pa.array(out["term_id"], type=pa.int64()),
                pa.array(out["block_id"], type=pa.int32()),
                pa.array(out["first_doc_id"], type=pa.int64()),
                pa.array(out["last_doc_id"], type=pa.int64()),
                pa.array(out["n_docs"], type=pa.int32()),
                pa.array(out["doc_id_deltas"], type=pa.binary()),
                pa.array(out["tfs"], type=pa.binary()),
                pa.array(out["dls"], type=pa.binary()),
                pa.array(out["poss"], type=pa.binary()),
                pa.array(np.array(out["block_max_score"], dtype=np.float32)),
            ],
            names=list(out),
        )

    return fn


def merge_segments(
    spark: SparkSession,
    root: str,
    seg_ids: list[int] | None = None,
    k_smallest: int = 2,
    cfg: EngineConfig | None = None,
) -> int:
    """TIERED merge (Lucene TieredMergePolicy shape): merge a few segments
    — by default the ``k_smallest`` by on-disk postings size — into ONE
    segment in place, from their postings (no raw sources). The merged
    segment takes the smallest participating seg_id (its doc ids re-based
    there), other participants are deleted; untouched segments stay as-is,
    so steady-state NRT compaction cost is bounded by the merged segments'
    size, never the whole corpus. Returns the surviving seg_id.

    The merged segment is byte-identical to ``build_segment`` over the
    participants' concatenated batches (pinned by tests), so searcher
    results are unchanged. Raw ``transcripts/`` files, when present, are
    moved into the surviving segment so the raw-fallback path keeps
    working; compaction itself never reads them.

    Crash safety: the merged tree is written to ``_merging_{target}``,
    stamped with a ``_COMMIT`` marker (participant list), and swapped in
    RENAME-FIRST (old target aside -> tmp renamed into place -> leftovers
    deleted) — a crash in any window leaves either the untouched
    participants or a committed marker from which :func:`recover_merges`
    (run here and by SegmentedSearcher/compact on open) completes the
    swap. Losing the merged postings after participants are gone is
    impossible: participants are only deleted once the rename committed."""
    import shutil
    from pathlib import Path

    from ..plans.build import read_index, write_index
    from .incremental import SEG_BASE, _seg_dirs

    recover_merges(root)  # finish any committed-but-interrupted swap first
    dirs = {int(d.name.split("_", 1)[1]): d for d in _seg_dirs(root)}
    if seg_ids is None:
        by_size = sorted(
            dirs,
            key=lambda sid: (
                sum(
                    f.stat().st_size
                    for f in (dirs[sid] / "index" / "postings").rglob("*.parquet")
                ),
                sid,
            ),
        )
        seg_ids = sorted(by_size[:k_smallest])
    if len(seg_ids) < 2:
        raise ValueError("need at least two segments to merge")
    from .incremental import _tombstone_dirs

    dirty = [sid for sid in seg_ids if _tombstone_dirs(dirs[sid])]
    if dirty:
        # the posting-level merge would carry soft-deleted docs' postings
        # forward into the merged segment (and remap their doc ids) —
        # resurrection, not merge. expunge_store() rewrites exactly these
        # segments clean first.
        raise ValueError(
            f"segments {dirty} have pending soft-delete tombstones: "
            "run expunge_store() before merge_segments()"
        )
    from ..config import DEFAULT

    segs = [read_index(spark, str(dirs[sid] / "index"), cfg or DEFAULT) for sid in seg_ids]
    keys = {s.cfg.content_key() for s in segs}
    if len(keys) != 1:
        raise ValueError(f"segments built with differing content configs: {keys}")
    cfg = segs[0].cfg
    assert SEG_BASE % cfg.docs_per_shard == 0

    merged = merge_postings_frames(spark, segs, cfg)
    target = min(seg_ids)
    base = target * SEG_BASE
    shift = base // cfg.docs_per_shard
    rebased = IndexFrames(
        docmap=merged.docmap.withColumn("doc_id", F.col("doc_id") + base).withColumn(
            "shard_id", (F.col("shard_id") + shift).cast("long")
        ),
        corpus_stats=merged.corpus_stats,
        dictionary=merged.dictionary,
        postings=merged.postings.withColumn(
            "first_doc_id", F.col("first_doc_id") + base
        )
        .withColumn("last_doc_id", F.col("last_doc_id") + base)
        .withColumn("shard_id", (F.col("shard_id") + shift).cast("long")),
        n_docs=merged.n_docs,
        avgdl=merged.avgdl,
        cfg=cfg,
    )
    seg_root = Path(root) / "segments"
    tmp_ix = seg_root / f"_merging_{target:06d}"
    if tmp_ix.exists():
        # recover_merges above completed any COMMITTED attempt, so a
        # surviving tmp dir here is an uncommitted partial write — safe
        shutil.rmtree(tmp_ix)
    write_index(rebased, str(tmp_ix / "index"))
    release_merge_cache(merged, include_postings=True)  # on-disk copy serves
    # gather raw batches (if retained) so from_postings=False stays possible
    tdir = tmp_ix / "transcripts"
    for sid in seg_ids:
        src = dirs[sid] / "transcripts"
        if src.exists():
            tdir.mkdir(parents=True, exist_ok=True)
            for f in sorted(src.glob("*.parquet")):
                shutil.copy2(f, tdir / f"seg{sid:06d}_{f.name}")
    # COMMIT: from this marker on, the merge wins; any crash is completed
    # by recover_merges instead of discarding the merged postings
    (tmp_ix / "_COMMIT").write_text(
        json.dumps({"target": target, "participants": sorted(int(s) for s in seg_ids)})
    )
    _complete_swap(seg_root, target, sorted(int(s) for s in seg_ids))
    return target


def _complete_swap(seg_root, target: int, participants: list[int]) -> None:
    """Idempotently finish a COMMITTED merge swap: retire the old target
    dir by rename (never delete before the merged tree is in place),
    rename ``_merging_{target}`` to ``seg_{target}``, then delete the
    other participants and the retired copy, and drop the marker last.
    Safe to re-run from any crash point."""
    import shutil

    tmp_ix = seg_root / f"_merging_{target:06d}"
    tgt = seg_root / f"seg_{target:06d}"
    aside = seg_root / f"_retiring_{target:06d}"
    if tmp_ix.exists():
        if tgt.exists():
            if aside.exists():
                shutil.rmtree(aside)  # stale retiree from an older crash
            tgt.rename(aside)
        tmp_ix.rename(tgt)
    # merged tree is in place; now (and only now) drop the leftovers
    for sid in participants:
        d = seg_root / f"seg_{sid:06d}"
        if sid != target and d.exists():
            shutil.rmtree(d)
    if aside.exists():
        shutil.rmtree(aside)
    marker = tgt / "_COMMIT"
    if marker.exists():
        marker.unlink()


def recover_merges(root: str) -> None:
    """Finish (or discard) merges interrupted by a crash. Called by
    merge_segments itself and by the open paths (SegmentedSearcher,
    compact): a ``_merging_*`` dir WITH a ``_COMMIT`` marker is a
    completed merge whose swap didn't finish — complete it; without the
    marker it is a partial write — discard it. A ``seg_*`` dir still
    carrying a marker had its rename done but not its cleanup — finish
    that too. A stray ``_retiring_*`` with no live swap is restored if
    its target is missing (pre-commit crash), else deleted."""
    import shutil
    from pathlib import Path

    seg_root = Path(root) / "segments"
    if not seg_root.is_dir():
        return
    for tmp in sorted(seg_root.glob("_merging_*")):
        marker = tmp / "_COMMIT"
        if marker.exists():
            meta = json.loads(marker.read_text())
            _complete_swap(seg_root, int(meta["target"]), list(meta["participants"]))
        else:
            shutil.rmtree(tmp)
    for tgt in sorted(seg_root.glob("seg_*")):
        marker = tgt / "_COMMIT"
        if marker.exists():
            meta = json.loads(marker.read_text())
            _complete_swap(seg_root, int(meta["target"]), list(meta["participants"]))
    for aside in sorted(seg_root.glob("_retiring_*")):
        tgt = seg_root / f"seg_{aside.name.split('_', 2)[2]}"
        if tgt.exists():
            shutil.rmtree(aside)
        else:
            aside.rename(tgt)


def release_merge_cache(ix: IndexFrames, include_postings: bool = False) -> None:
    """Unpersist the intermediates merge_postings_frames pinned (idmap +
    merged dictionary; the dedup module's release_cached shape). The
    merged POSTINGS stay cached by default — they are the serving frame
    of the returned index, exactly like build_index's — pass
    ``include_postings=True`` once an on-disk copy serves instead.
    Prevents cache accumulation across repeated NRT compactions in one
    session."""
    for c in getattr(ix, "_merge_cached", []):
        c.unpersist()
    ix._merge_cached = []
    if include_postings:
        ix.postings.unpersist()


def merged_docmap(docmap_all: DataFrame) -> DataFrame:
    """Union of segment docmaps -> new dense doc_ids under the builder's
    stable spec: turns ranked by (conv_id, turn_idx) via conv offsets,
    rollups at n_turns + conv_rank. Returns (old_doc_id, doc_id, conv_id,
    turn_idx, doc_len, is_rollup)."""
    turns = docmap_all.filter(~F.col("is_rollup"))
    sizes = turns.groupBy("conv_id").agg(F.count("*").alias("n_turns"))
    offs, totals = with_global_rank(
        sizes, ["conv_id"], rank_col="conv_rank", value_col="n_turns",
        psum_col="conv_offset", return_totals=True,
    )
    n_turns_total = int(totals["value_sum"])
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    new_turns = (
        turns.withColumnRenamed("doc_id", "old_doc_id")
        .join(offs.select("conv_id", "conv_offset"), "conv_id")
        .withColumn("doc_id", (F.col("conv_offset") + F.row_number().over(w) - 1).cast("long"))
        .select("old_doc_id", "doc_id", "conv_id", "turn_idx", "doc_len", "is_rollup")
    )
    new_rolls = (
        docmap_all.filter(F.col("is_rollup"))
        .withColumnRenamed("doc_id", "old_doc_id")
        .join(offs.select("conv_id", "conv_rank"), "conv_id")
        .withColumn("doc_id", (F.lit(n_turns_total) + F.col("conv_rank")).cast("long"))
        .select("old_doc_id", "doc_id", "conv_id", "turn_idx", "doc_len", "is_rollup")
    )
    return new_turns.unionByName(new_rolls)


def merge_postings_frames(
    spark: SparkSession,
    segments: list[IndexFrames],
    cfg: EngineConfig,
) -> IndexFrames:
    """Merge segment indexes from their postings/dictionaries/docmaps into
    one in-memory IndexFrames, byte-identical to a from-scratch build over
    the concatenated sources. No raw text is read."""
    # -- precondition: a conversation must not span segments (its rollup
    # doc could not be reconstructed without the text)
    docmap_all = None
    for seg in segments:
        d = seg.docmap.select("doc_id", "conv_id", "turn_idx", "doc_len", "is_rollup")
        docmap_all = d if docmap_all is None else docmap_all.unionByName(d)
    dup = (
        docmap_all.filter(F.col("is_rollup"))
        .groupBy("conv_id").count().filter(F.col("count") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"conv_id {dup[0]['conv_id']} spans multiple segments; "
            "posting-level compaction cannot re-rollup a split conversation "
            "— re-ingest it whole or compact from raw sources"
        )

    idmap = merged_docmap(docmap_all).persist()
    n_docs, avgdl = idmap.agg(F.count("*"), F.avg("doc_len")).collect()[0]
    n_docs, avgdl = int(n_docs), float(avgdl or 0.0)

    # -- merged dictionary: df/cf summed over segments, term_id = rank in
    # the merged sorted vocab (the builder's dense stable id)
    dict_all = None
    for seg in segments:
        d = seg.dictionary.select("term", "term_id", "df", "cf")
        dict_all = d if dict_all is None else dict_all.unionByName(d)
    merged_stats = dict_all.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("cf").alias("cf")
    )
    new_dict = with_global_rank(merged_stats, ["term"], rank_col="term_id").select(
        "term", "term_id", "df", "cf"
    ).persist()

    # -- decode postings with translated term ids, remap doc ids, re-block
    decoded = None
    for seg in segments:
        trans = (
            seg.dictionary.select("term", F.col("term_id").alias("old_term_id"))
            .join(new_dict.select("term", F.col("term_id").alias("new_term_id"), "df"), "term")
            .select("old_term_id", "new_term_id", "df")
        )
        joined = seg.postings.join(
            trans, seg.postings["term_id"] == trans["old_term_id"]
        ).select(
            "new_term_id", "df", "first_doc_id", "n_docs",
            "doc_id_deltas", "tfs", "dls", "poss",
        )
        part = joined.mapInArrow(_decode_kernel(), schema=_DECODED_DDL)
        decoded = part if decoded is None else decoded.unionByName(part)

    remapped = (
        decoded.withColumnRenamed("doc_id", "old_doc_id")
        .join(idmap.select("old_doc_id", "doc_id"), "old_doc_id")
        .drop("old_doc_id")
    )
    remapped = with_shard(remapped, cfg)
    p = spark.sparkContext.defaultParallelism * 2
    postings = (
        remapped.repartition(p, "shard_id")
        .mapInArrow(_reblock_kernel(n_docs, avgdl, cfg), schema=POSTINGS_DDL)
        .persist()
    )

    dict_full = new_dict.join(
        postings.groupBy("term_id").agg(F.max("block_max_score").alias("max_score")),
        "term_id",
        "left",
    ).select("term", "term_id", "df", "cf", "max_score")

    docmap = with_shard(
        idmap.select("doc_id", "conv_id", "turn_idx", "doc_len", "is_rollup"), cfg
    )
    stats = spark.createDataFrame([corpus_stats_row(n_docs, avgdl, cfg)], CORPUS_STATS_DDL)
    ix = IndexFrames(docmap, stats, dict_full, postings, n_docs, avgdl, cfg)
    # track the persisted intermediates so compact()/merge_segments() can
    # free them (release_merge_cache) once the result is materialized
    ix._merge_cached = [idmap, new_dict]
    return ix


def expunge_deletes(
    spark: SparkSession, ix: IndexFrames, tombstones: DataFrame
) -> IndexFrames:
    """ES ``_forcemerge?only_expunge_deletes`` analogue: physically remove
    tombstoned docs from an index (the docs ``BM25Searcher.
    delete_by_query`` marked), producing a clean in-memory IndexFrames.

    Contract (its own, NOT rebuild-byte-identity — documented):
      * **doc_ids are PRESERVED** — they are external keys (docmap,
        conv/turn identity); shards keep gaps, which the scoring kernels
        never notice (they address by local offset and read doc_ids from
        the blocks).
      * **term_ids are PRESERVED** for surviving terms; terms whose live
        df drops to 0 leave the dictionary (their old term_id is simply
        never referenced again). Old term_ids are alphabetical ranks, so
        ascending-term_id accumulation order — the scoring determinism
        contract — is unchanged, and a PandasOracle over the live docs
        matches the expunged engine bit-for-bit (tests pin this).
      * **statistics are recomputed over live docs** (df, cf, n_docs,
        avgdl, block maxes) — the ES post-merge behavior, where deleted
        docs stop polluting idf.
    Shape: one postings decode pass (the compaction ``_decode_kernel``),
    a doc_id anti-join against the tombstones, a per-term live-df
    aggregation, and the standard re-block kernel — same cost class as a
    posting-level compaction; no raw sources touched.
    """
    cfg = ix.cfg
    tombs = tombstones.select("doc_id").distinct()
    live_dm = ix.docmap.join(tombs, "doc_id", "left_anti").persist()
    n_docs, avgdl = live_dm.agg(F.count("*"), F.avg("doc_len")).collect()[0]
    n_docs, avgdl = int(n_docs), float(avgdl or 0.0)

    joined = ix.postings.select(
        F.col("term_id").alias("new_term_id"),
        F.lit(0).cast("long").alias("df"),  # refreshed after the filter
        "first_doc_id", "n_docs", "doc_id_deltas", "tfs", "dls", "poss",
    )
    decoded = joined.mapInArrow(_decode_kernel(), schema=_DECODED_DDL)
    live = decoded.drop("df").join(tombs, "doc_id", "left_anti")
    live_stats = live.groupBy("term_id").agg(
        F.count("*").alias("live_df"), F.sum("tf").alias("live_cf")
    ).persist()
    relabeled = live.join(
        live_stats.select("term_id", F.col("live_df").alias("df")), "term_id"
    )
    remapped = with_shard(relabeled, cfg)
    p = spark.sparkContext.defaultParallelism * 2
    postings = (
        remapped.repartition(p, "shard_id")
        .mapInArrow(_reblock_kernel(n_docs, avgdl, cfg), schema=POSTINGS_DDL)
        .persist()
    )
    dictionary = (
        ix.dictionary.select("term", "term_id")
        .join(live_stats, "term_id")  # inner: zero-df terms drop out
        .join(
            postings.groupBy("term_id").agg(
                F.max("block_max_score").alias("max_score")
            ),
            "term_id",
            "left",
        )
        .select(
            "term", "term_id",
            F.col("live_df").alias("df"), F.col("live_cf").alias("cf"),
            "max_score",
        )
    )
    stats = spark.createDataFrame(
        [corpus_stats_row(n_docs, avgdl, cfg)], CORPUS_STATS_DDL
    )
    out = IndexFrames(live_dm, stats, dictionary, postings, n_docs, avgdl, cfg)
    out._merge_cached = [live_stats]
    return out
