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
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.bm25 import block_upper_bound, contrib, idf
from ..functions.codec import (
    decode_tfs,
    encode_doc_gaps,
    encode_tfs,
    encode_varints,
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
        ("tf_sum", pa.int64()),
    ]
)

RAW_BLOCKS_DDL = (
    "shard_id long, term string, block_id int, first_doc_id long, last_doc_id long, "
    "n_docs int, doc_id_deltas binary, tfs binary, dls binary, tf_sum long"
)

# Impact-style blocks: alongside the delta-gapped doc ids and tfs, each
# block carries the varint-encoded exact doc lengths of its postings (the
# role of Lucene's norms, stored inline like impact-sorted indexes keep
# (tf, norm) pairs). Queries then never touch docmap: the pruned postings
# scan alone fully determines BM25 scores.
POSTINGS_DDL = (
    "shard_id long, term_id long, block_id int, first_doc_id long, last_doc_id long, "
    "n_docs int, doc_id_deltas binary, tfs binary, dls binary, block_max_score float"
)

DICTIONARY_DDL = "term string, term_id long, df long, cf long, max_score float"


def _spimi_kernel(cfg: EngineConfig):
    block_size, dps = cfg.block_size, cfg.docs_per_shard

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # gather the partition (bounded: a few shards of docs)
        doc_ids_parts, dl_parts, flat_parts, len_parts = [], [], [], []
        for b in batches:
            toks = b.column("toks")
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            flat_parts.append(toks.flatten().to_numpy(zero_copy_only=False))
            offs = toks.offsets.to_numpy(zero_copy_only=False)
            len_parts.append(np.diff(offs))
            doc_ids_parts.append(b.column("doc_id").to_numpy(zero_copy_only=False))
            dl_parts.append(b.column("doc_len").to_numpy(zero_copy_only=False).astype(np.int64))
        if not doc_ids_parts:
            return
        doc_ids = np.concatenate(doc_ids_parts)
        dls = np.concatenate(dl_parts)
        lens = np.concatenate(len_parts)
        terms_flat = np.concatenate(flat_parts) if flat_parts else np.empty(0, object)
        if terms_flat.size == 0:
            return

        doc_rep = np.repeat(doc_ids, lens)
        dl_rep = np.repeat(dls, lens)
        codes, uniques = pd.factorize(terms_flat, sort=True)  # sorted -> stable
        order = np.lexsort((doc_rep, codes))
        c, d, dl = codes[order], doc_rep[order], dl_rep[order]

        # run-length over (term, doc) -> tf
        if len(c) > 1:
            chg = np.flatnonzero((np.diff(c) != 0) | (np.diff(d) != 0))
            starts = np.concatenate(([0], chg + 1))
            ends = np.concatenate((chg + 1, [len(c)]))
        else:
            starts = np.array([0])
            ends = np.array([len(c)])
        tf = (ends - starts).astype(np.int64)
        tc, td, tdl = c[starts], d[starts], dl[starts]
        shard = td // dps

        # term-run boundaries, then shard boundaries inside each run
        out = {name: [] for name in RAW_BLOCKS_SCHEMA.names}
        run_starts = np.concatenate(([0], 1 + np.flatnonzero(np.diff(tc)), [len(tc)]))
        for ri in range(len(run_starts) - 1):
            lo, hi = int(run_starts[ri]), int(run_starts[ri + 1])
            term = uniques[tc[lo]]
            seg_bounds = np.concatenate(
                ([lo], lo + 1 + np.flatnonzero(np.diff(shard[lo:hi])), [hi])
            )
            for si in range(len(seg_bounds) - 1):
                s0, s1 = int(seg_bounds[si]), int(seg_bounds[si + 1])
                sh = int(shard[s0])
                for bi, b0 in enumerate(range(s0, s1, block_size)):
                    b1 = min(b0 + block_size, s1)
                    dd = td[b0:b1]
                    out["shard_id"].append(sh)
                    out["term"].append(term)
                    out["block_id"].append(bi)
                    out["first_doc_id"].append(int(dd[0]))
                    out["last_doc_id"].append(int(dd[-1]))
                    out["n_docs"].append(b1 - b0)
                    out["doc_id_deltas"].append(encode_doc_gaps(dd))
                    out["tfs"].append(encode_tfs(tf[b0:b1]))
                    out["dls"].append(encode_tfs(tdl[b0:b1]))
                    out["tf_sum"].append(int(tf[b0:b1].sum()))
        yield pa.RecordBatch.from_pydict(out, schema=RAW_BLOCKS_SCHEMA)

    return fn


def spimi_blocks(tokenized_docs: DataFrame, cfg: EngineConfig, num_partitions: int | None = None) -> DataFrame:
    """(doc_id, doc_len, toks) -> raw posting blocks (term string keyed).

    One shuffle (by shard), in-memory inversion per shard partition.
    """
    docs = with_shard(tokenized_docs, cfg)
    p = num_partitions or docs.sparkSession.sparkContext.defaultParallelism * 2
    return (
        docs.select("shard_id", "doc_id", "doc_len", "toks")
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
    joined = raw_blocks.join(dictionary.select("term", "term_id", "df"), "term").select(
        "shard_id", "term_id", "block_id", "first_doc_id", "last_doc_id",
        "n_docs", "doc_id_deltas", "tfs", "dls", "df",
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for bt in batches:
            pdf = bt.to_pandas()
            if pdf.empty:
                continue
            idfs = idf(pdf["df"].to_numpy(np.float64), n_docs)
            maxs = np.empty(len(pdf), dtype=np.float32)
            for i, (tfbuf, dlbuf) in enumerate(zip(pdf["tfs"], pdf["dls"])):
                sc = contrib(decode_tfs(tfbuf), decode_tfs(dlbuf), idfs[i], avgdl, k1, b)
                maxs[i] = block_upper_bound(sc)
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
