"""SPIMI posting construction + global merge + block building (C3-C6).

Spark-first mapping of SPIMI (IIR ch. 4.3), one wide shuffle total:

  1. the tokenized doc table is repartitioned by ``shard_id``
     (shard = doc_id // docs_per_shard — a pure function of the data, so
     index content is parallelism-invariant). This is the ONLY shuffle of
     bulk data in the postings build: the classic 3-column (term, doc, tf)
     triple stream — ~50x more rows than documents — never crosses the
     network.
  2. a ``mapInArrow`` pass inverts each shard in memory (the SPIMI block):
     flatten token lists zero-copy from Arrow, factorize terms, lexsort
     (term, doc), run-length to term frequencies, then cut posting blocks
     of ``block_size`` docs with delta-gap + varint doc ids, varint tfs and
     varint exact doc lengths (impact-style inline norms).
  3. the dictionary (df/cf + dense stable term_id) is aggregated from the
     per-block metadata — vocabulary-sized, tiny next to the corpus.
  4. a finalize pass joins term stats onto blocks (block-count-sized join,
     ~1/block_size of the posting count) and computes per-block max BM25
     scores (rounded up one f32 ulp — a safe WAND bound).

Skew: a head term's postings arrive pre-split across doc-range shards, so
no task ever holds more than one shard of any term — the explicit
repartitioning for head-term skew required by the north rule (AQE stays on
as backstop for the residual shard-size variance).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.bm25 import block_upper_bound, contrib, idf
from ..functions.codec import (
    decode_tfs,
    encode_varints,
    varint_lengths,
)
from .ids import with_global_rank

RAW_BLOCKS_SCHEMA = pa.schema(
    [
        ("shard_id", pa.int64()),
        ("term", pa.string()),
        ("block_id", pa.int32()),
        ("first_doc_id", pa.int64()),
        ("last_doc_id", pa.int64()),
        ("n_docs", pa.int32()),
        ("doc_id_deltas", pa.binary()),
        ("tfs", pa.binary()),
        ("dls", pa.binary()),
        ("poss", pa.binary()),
        ("tf_sum", pa.int64()),
    ]
)

RAW_BLOCKS_DDL = (
    "shard_id long, term string, block_id int, first_doc_id long, last_doc_id long, "
    "n_docs int, doc_id_deltas binary, tfs binary, dls binary, poss binary, tf_sum long"
)

# Impact-style blocks: alongside the delta-gapped doc ids and tfs, each
# block carries the varint-encoded exact doc lengths of its postings (the
# role of Lucene's norms, stored inline like impact-sorted indexes keep
# (tf, norm) pairs). Queries then never touch docmap: the pruned postings
# scan alone fully determines BM25 scores. ``poss`` (empty unless
# cfg.store_positions) is the Lucene-style positions stream: per posting,
# tf varints — absolute first position then gaps — enabling match_phrase.
POSTINGS_DDL = (
    "shard_id long, term_id long, block_id int, first_doc_id long, last_doc_id long, "
    "n_docs int, doc_id_deltas binary, tfs binary, dls binary, poss binary, "
    "block_max_score float"
)

DICTIONARY_DDL = "term string, term_id long, df long, cf long, max_score float"

# byte LUT for the pinned [a-z0-9_]+ analyzer: token bytes map to
# themselves, every other byte (incl. every byte of a multi-byte UTF-8
# char) to ' ' — see the tokenize fast path in _spimi_kernel
_TOKEN_LUT = np.full(256, ord(" "), dtype=np.uint8)
for _c in b"abcdefghijklmnopqrstuvwxyz0123456789_":
    _TOKEN_LUT[_c] = _c


def _spimi_kernel(cfg: EngineConfig):
    """Tokenize + invert a partition entirely in Arrow/C++/numpy.

    No Python string is ever materialized for the token stream: lowering,
    regex splitting and term dictionary-encoding run in Arrow compute
    (utf8_lower / split_pattern_regex / dictionary_encode); only the
    partition's vocabulary slice crosses into Python (for the term column
    of the block rows). This is what makes inversion scale with cores —
    object churn does not.
    """
    import pyarrow.compute as pc

    block_size, dps = cfg.block_size, cfg.docs_per_shard
    sep = cfg.separator_pattern
    store_pos = cfg.store_positions

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # one task == one core: Arrow's default pool (all cores) in every
        # python worker oversubscribes the host ~32x and destroys scaling
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(1)
        # gather the partition (bounded: a few shards of docs)
        doc_ids_parts, dl_parts, text_parts = [], [], []
        for b in batches:
            text_parts.append(b.column("text"))
            doc_ids_parts.append(b.column("doc_id").to_numpy(zero_copy_only=False))
            dl_parts.append(b.column("doc_len").to_numpy(zero_copy_only=False).astype(np.int64))
        if not doc_ids_parts:
            return
        doc_ids = np.concatenate(doc_ids_parts)
        dls = np.concatenate(dl_parts)

        # 64-bit string offsets (large_utf8): one partition gathers a few
        # shards of documents, and at ~10^6 docs/partition the combined
        # text (and, before this cast, the split's token values) exceeds
        # the 2 GiB capacity of 32-bit utf8 offsets — ArrowCapacityError
        # at sf>=1. Casting per CHUNK (before combine_chunks) keeps the
        # combine itself in large offsets too. Token-level traffic is
        # unchanged: dictionary_encode still yields int32 codes.
        text = pa.chunked_array(
            [pa.array([], type=pa.large_string())]
            + [p.cast(pa.large_string()) for p in text_parts]
        ).combine_chunks()
        low = pc.utf8_lower(pc.fill_null(text, ""))
        if isinstance(low, pa.ChunkedArray):
            low = low.combine_chunks()
        # Tokenize. Fast path for the pinned [a-z0-9_]+ analyzer (config.py
        # asserts this pattern): every token byte is ASCII, so every byte of
        # a multi-byte UTF-8 character (0x80..0xFF) is a separator byte —
        # a 256-entry LUT mapping non-token bytes to ' ' over the string
        # buffer, then the non-regex whitespace splitter, yields the exact
        # same per-doc kept-token streams as the RE2 separator split at
        # ~4x the speed (tokenization was ~45% of this kernel). Offsets are
        # reused unchanged, so token-to-doc attribution is identical; empty
        # tokens from separator runs are dropped below either way (the
        # 4-impl analyzer-equality pytest pins this equivalence).
        if sep == r"[^a-z0-9_]+" and low.offset == 0:
            bufs = low.buffers()
            data = np.frombuffer(bufs[2], dtype=np.uint8, count=len(bufs[2]))
            cleaned = _TOKEN_LUT[data]
            low = pa.LargeStringArray.from_buffers(
                len(low), bufs[1], pa.py_buffer(cleaned.tobytes()), bufs[0]
            )
            toks = pc.ascii_split_whitespace(low)
        else:
            toks = pc.split_pattern_regex(low, sep)
        lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        denc = pc.dictionary_encode(toks.values)
        codes = denc.indices.to_numpy(zero_copy_only=False)  # int32
        uniq = denc.dictionary
        uniques = uniq.to_pylist()  # vocabulary slice only

        # This stage is memory-bandwidth-bound when many workers run
        # concurrently, so token-level traffic is kept minimal: int32 local
        # doc indices, ONE combined int64 sort key (term-major, doc-minor)
        # sorted IN PLACE (pairs need not stay attached — the key encodes
        # both), and doc_id/doc_len gathers deferred to postings
        # granularity (~tf-fold smaller than the token stream).
        # rows arrive in shuffle order; postings must be doc_id-ascending,
        # so 'local' is each doc's RANK under doc_id order (tiny doc-level
        # sort), and the rank->doc_id/doc_len lookups are rank-indexed
        n_docs_local = len(doc_ids)
        doc_order = np.argsort(doc_ids, kind="stable")
        ranks = np.empty(n_docs_local, dtype=np.int32)
        ranks[doc_order] = np.arange(n_docs_local, dtype=np.int32)
        doc_ids = doc_ids[doc_order]
        dls = dls[doc_order]
        local = np.repeat(ranks, lens)
        # drop empty tokens produced by splitting at string edges
        empties = np.flatnonzero(pc.utf8_length(uniq).to_numpy(zero_copy_only=False) == 0)
        if empties.size:
            keep = codes != empties[0]
            codes, local = codes[keep], local[keep]
        if codes.size == 0:
            return
        shift = int(n_docs_local).bit_length()
        pos_occ = None
        if store_pos:
            # token position within its doc (analyzer order, counted over
            # KEPT tokens). A doc's tokens come from exactly one text row,
            # so they are contiguous in the stream: position = index minus
            # the start of the doc's run.
            n = local.size
            is_new = np.empty(n, dtype=bool)
            is_new[0] = True
            np.not_equal(local[1:], local[:-1], out=is_new[1:])
            run_starts = np.flatnonzero(is_new)
            run_lens = np.diff(np.concatenate((run_starts, [n])))
            pos = np.arange(n, dtype=np.int64) - np.repeat(run_starts, run_lens)
            # single int64 sort key (term, doc, pos) when the bits fit —
            # same memory-traffic-minimizing design as the tf-only path;
            # stable lexsort fallback for pathological vocab/doc sizes
            pshift = int(pos.max(initial=0)).bit_length()
            if int(len(uniques)).bit_length() + shift + pshift <= 62:
                key = (
                    (codes.astype(np.int64) << np.int64(shift + pshift))
                    | (local.astype(np.int64) << np.int64(pshift))
                    | pos
                )
                key.sort()
                kocc = key >> np.int64(pshift)
                pos_occ = key & np.int64((1 << pshift) - 1)
            else:
                order = np.lexsort((pos, local, codes))
                kocc = (codes[order].astype(np.int64) << shift) | local[order].astype(np.int64)
                pos_occ = pos[order]
            del codes, local, pos
        else:
            # in-place shift/or: the expression form allocates two extra
            # n_token int64 temporaries on this memory-bound path
            key = codes.astype(np.int64)
            key <<= shift
            key |= local
            del codes, local
            key.sort()
            kocc = key

        # run-length over identical (term, doc) keys -> tf
        n_tok = kocc.size
        is_start = np.empty(n_tok, dtype=bool)
        is_start[0] = True
        np.not_equal(kocc[1:], kocc[:-1], out=is_start[1:])
        starts = np.flatnonzero(is_start)
        ends = np.concatenate((starts[1:], [n_tok]))
        tf = (ends - starts).astype(np.int64)
        kpost = kocc[starts]
        tc = (kpost >> shift).astype(np.int64)  # term code per posting
        tl = (kpost & ((1 << shift) - 1)).astype(np.int64)  # local doc idx
        td = doc_ids[tl]
        tdl = dls[tl]
        shard = td // dps
        n_post = len(tc)

        # ---- block boundaries: blocks of <= block_size postings, never
        # crossing a (term, shard) segment boundary
        seg_break = np.zeros(n_post, dtype=bool)
        seg_break[0] = True
        if n_post > 1:
            seg_break[1:] = (np.diff(tc) != 0) | (np.diff(shard) != 0)
        seg_starts = np.flatnonzero(seg_break)
        seg_ends = np.concatenate((seg_starts[1:], [n_post]))
        bstarts_parts = [
            np.arange(int(s0), int(s1), block_size) for s0, s1 in zip(seg_starts, seg_ends)
        ]
        bstarts = np.concatenate(bstarts_parts)
        bends = np.concatenate((bstarts[1:], [n_post]))
        # block_id = index within its segment
        seg_of_block = np.searchsorted(seg_starts, bstarts, side="right") - 1
        block_ids = (bstarts - seg_starts[seg_of_block]) // block_size
        nb = len(bstarts)
        n_per_block = bends - bstarts

        # ---- batch varint encoding (one pass per stream, sliced per block)
        is_bstart = np.zeros(n_post, dtype=bool)
        is_bstart[bstarts] = True
        gaps = np.empty(n_post, dtype=np.int64)
        gaps[0] = 0
        if n_post > 1:
            gaps[1:] = td[1:] - td[:-1]
        gap_vals = gaps[~is_bstart].astype(np.uint64)  # first-of-block omitted
        gap_buf = encode_varints(gap_vals)
        gap_vlens = varint_lengths(gap_vals)
        gap_byte_ends = np.concatenate(([0], np.cumsum(gap_vlens)))
        gap_counts = n_per_block - 1
        gap_val_offs = np.concatenate(([0], np.cumsum(gap_counts)))

        def stream_slices(values: np.ndarray) -> list[bytes]:
            buf = encode_varints(values.astype(np.uint64))
            byte_offs = np.concatenate(([0], np.cumsum(varint_lengths(values.astype(np.uint64)))))
            mv = memoryview(buf)
            return [bytes(mv[byte_offs[s] : byte_offs[e]]) for s, e in zip(bstarts, bends)]

        mv_gap = memoryview(gap_buf)
        gap_slices = [
            bytes(mv_gap[gap_byte_ends[gap_val_offs[i]] : gap_byte_ends[gap_val_offs[i + 1]]])
            for i in range(nb)
        ]
        tf_slices = stream_slices(tf)
        dl_slices = stream_slices(tdl)
        tf_sums = np.add.reduceat(tf, bstarts)

        if pos_occ is not None:
            # positions stream: per posting, absolute first position then
            # within-posting gaps, varint'd; sliced per block at
            # occurrence granularity
            pdelta = np.empty(n_tok, dtype=np.int64)
            pdelta[0] = pos_occ[0]
            pdelta[1:] = pos_occ[1:] - pos_occ[:-1]
            pdelta[starts] = pos_occ[starts]
            pvals = pdelta.astype(np.uint64)
            pbuf = encode_varints(pvals)
            pbyte_offs = np.concatenate(([0], np.cumsum(varint_lengths(pvals))))
            starts_ext = np.concatenate((starts, [n_tok]))
            occ_bstart = starts_ext[bstarts]
            occ_bend = starts_ext[bends]
            mv_pos = memoryview(pbuf)
            poss_slices = [
                bytes(mv_pos[pbyte_offs[s] : pbyte_offs[e]])
                for s, e in zip(occ_bstart, occ_bend)
            ]
        else:
            poss_slices = [b""] * nb

        terms_per_block = [uniques[i] for i in tc[bstarts]]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(shard[bstarts], type=pa.int64()),
                pa.array(terms_per_block, type=pa.string()),
                pa.array(block_ids.astype(np.int32)),
                pa.array(td[bstarts], type=pa.int64()),
                pa.array(td[bends - 1], type=pa.int64()),
                pa.array(n_per_block.astype(np.int32)),
                pa.array(gap_slices, type=pa.binary()),
                pa.array(tf_slices, type=pa.binary()),
                pa.array(dl_slices, type=pa.binary()),
                pa.array(poss_slices, type=pa.binary()),
                pa.array(tf_sums, type=pa.int64()),
            ],
            schema=RAW_BLOCKS_SCHEMA,
        )

    return fn


def spimi_blocks(tokenized_docs: DataFrame, cfg: EngineConfig, num_partitions: int | None = None) -> DataFrame:
    """(doc_id, doc_len, text) -> raw posting blocks (term string keyed).

    One shuffle (by shard) of the raw doc rows, then Arrow-native
    tokenize + invert per shard partition.
    """
    docs = with_shard(tokenized_docs, cfg)
    p = num_partitions or docs.sparkSession.sparkContext.defaultParallelism * 2
    return (
        docs.select("shard_id", "doc_id", "doc_len", "text")
        .repartition(p, "shard_id")
        .mapInArrow(_spimi_kernel(cfg), schema=RAW_BLOCKS_DDL)
    )


def dictionary_from_blocks(raw_blocks: DataFrame) -> DataFrame:
    """(term, term_id, df, cf): aggregated from block metadata; term_id =
    dense rank of the term string via the distributed prefix-rank."""
    stats = raw_blocks.groupBy("term").agg(
        F.sum("n_docs").alias("df"), F.sum("tf_sum").alias("cf")
    )
    return with_global_rank(stats, ["term"], rank_col="term_id").select(
        "term", "term_id", "df", "cf"
    )


def finalize_blocks(
    raw_blocks: DataFrame,
    dictionary: DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: EngineConfig,
) -> DataFrame:
    """Join term stats onto blocks, compute safe per-block max scores."""
    k1, b = cfg.k1, cfg.b
    # BROADCAST the dictionary side: without the hint the planner can't
    # estimate the prefix-sum output and picks a sort-merge join, which
    # shuffles AND sorts the entire block payload (doc_id_deltas/tfs/dls/
    # poss binaries — the whole inverted corpus) by term string just to
    # attach (term_id, df). The dictionary is vocabulary-sized — orders of
    # magnitude below the postings; at extreme vocab (>~10^8 terms,
    # approaching Spark's 8 GB/512M-row broadcast cap) export
    # SPARK_GRAFT_NO_BCAST_DICT=1 to fall back to the shuffled join.
    dict_side = dictionary.select("term", "term_id", "df")
    import os as _os

    if not _os.environ.get("SPARK_GRAFT_NO_BCAST_DICT"):
        dict_side = F.broadcast(dict_side)
    joined = raw_blocks.join(dict_side, "term").select(
        "shard_id", "term_id", "block_id", "first_doc_id", "last_doc_id",
        "n_docs", "doc_id_deltas", "tfs", "dls", "poss", "df",
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for bt in batches:
            pdf = bt.to_pandas()
            if pdf.empty:
                continue
            idfs = idf(pdf["df"].to_numpy(np.float64), n_docs)
            # batch-vectorized block maxima: decode ALL blocks' tf/dl
            # streams in one varint pass over the concatenated buffers
            # (the per-block python loop costs ~10 us/block in numpy call
            # overhead alone), score every posting with its block's idf
            # repeated elementwise — bit-identical to the per-block
            # scalar-idf product — and segment-max with reduceat. The
            # +1-ulp rounding is the same nextafter, elementwise.
            npb = pdf["n_docs"].to_numpy(np.int64)
            tf_all = decode_tfs(b"".join(pdf["tfs"]))
            dl_all = decode_tfs(b"".join(pdf["dls"]))
            sc = contrib(tf_all, dl_all, np.repeat(idfs, npb), avgdl, k1, b)
            starts = np.concatenate(([0], np.cumsum(npb)[:-1]))
            m32 = np.maximum.reduceat(sc, starts).astype(np.float32)
            maxs = np.nextafter(m32, np.float32(np.inf), dtype=np.float32)
            pdf = pdf.drop(columns=["df"])
            pdf["block_max_score"] = maxs
            yield pa.RecordBatch.from_pandas(pdf, preserve_index=False)

    return joined.mapInArrow(fn, schema=POSTINGS_DDL)


def build_postings_pipeline(
    tokenized_docs: DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: EngineConfig,
    persist_raw: bool = True,
):
    """Full postings path: SPIMI blocks -> dictionary -> finalized postings.

    Returns (postings, dictionary); raw blocks are persisted between the
    dictionary aggregation and the finalize join so the corpus is inverted
    exactly once.
    """
    raw = spimi_blocks(tokenized_docs, cfg)
    if persist_raw:
        raw = raw.persist()
    dictionary = dictionary_from_blocks(raw)
    postings = finalize_blocks(raw, dictionary, n_docs, avgdl, cfg)
    return postings, dictionary


def with_shard(df: DataFrame, cfg: EngineConfig, doc_col: str = "doc_id") -> DataFrame:
    return df.withColumn(
        "shard_id", F.floor(F.col(doc_col) / F.lit(cfg.docs_per_shard)).cast("long")
    )
