"""SPIMI posting construction + global merge + block building (C3-C6).

Spark-first mapping of SPIMI (IIR ch. 4.3):

  * the classic "per-partition in-memory inverted index, then merge runs"
    IS Spark's partial hash aggregation + shuffle: ``groupBy(term, doc_id)
    .count()`` does map-side combining per partition (the SPIMI block) and
    the shuffle-merge produces globally grouped postings — we do not
    hand-roll what Tungsten already does at memory bandwidth;
  * the "sort-merge into global postings" is the range shuffle by
    (shard_id, term_id) feeding the block builder;
  * skew: shard_id = doc_id // docs_per_shard caps any (shard, term) group
    at the shard width, so a head term's 10^11 postings arrive as many
    bounded groups on many tasks — the explicit repartitioning for
    head-term skew required by the north rule (plus AQE as backstop).

Block building (C5/C6) runs in ``applyInPandas`` grouped **by shard**: one
pandas frame per shard, vectorized numpy for contributions, per-term
delta-gap + varint encoding, per-block max-score metadata rounded up one
f32 ulp (safe BMW bound).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.bm25 import block_upper_bound, contrib, idf
from ..functions.codec import encode_doc_gaps, encode_tfs
from .ids import with_global_rank

POSTINGS_DDL = (
    "shard_id int, term_id long, block_id int, first_doc_id long, last_doc_id long, "
    "n_docs int, doc_id_deltas binary, tfs binary, block_max_score float"
)

DICTIONARY_DDL = "term string, term_id long, df long, cf long, max_score float"


def build_triples(tokenized_docs: DataFrame) -> DataFrame:
    """(term, doc_id, doc_len, tf) — SPIMI via partial agg, one shuffle.

    ``tokenized_docs``: (doc_id long, doc_len int, toks array<string>).
    doc_len rides the group key (functionally dependent on doc_id) so no
    join against docmap is ever needed downstream.
    """
    return (
        tokenized_docs.select("doc_id", "doc_len", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id", "doc_len")
        .agg(F.count("*").alias("tf"))
    )


def build_dictionary(triples: DataFrame) -> DataFrame:
    """(term, term_id, df, cf): term_id = dense rank of term string, stable
    across parallelism (distributed prefix-rank, no global window)."""
    stats = triples.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    return (
        with_global_rank(stats, ["term"], rank_col="term_id")
        .select("term", "term_id", "df", "cf")
    )


def _block_builder(n_docs: int, avgdl: float, cfg: EngineConfig):
    k1, b, block_size = cfg.k1, cfg.b, cfg.block_size

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["term_id", "doc_id"], kind="mergesort")
        term_ids = pdf["term_id"].to_numpy(np.int64)
        doc_ids = pdf["doc_id"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dls = pdf["doc_len"].to_numpy(np.int64)
        dfs = pdf["df"].to_numpy(np.int64)
        shard = int(pdf["shard_id"].iloc[0]) if len(pdf) else -1
        # vectorized BM25 contributions for the whole shard at once
        scores = contrib(tfs, dls, idf(dfs.astype(np.float64), n_docs), avgdl, k1, b)

        starts = np.concatenate(([0], 1 + np.flatnonzero(np.diff(term_ids)), [len(term_ids)]))
        out: dict[str, list] = {k: [] for k in (
            "shard_id", "term_id", "block_id", "first_doc_id", "last_doc_id",
            "n_docs", "doc_id_deltas", "tfs", "block_max_score",
        )}
        for i in range(len(starts) - 1):
            lo, hi = int(starts[i]), int(starts[i + 1])
            tid = int(term_ids[lo])
            for bi, b0 in enumerate(range(lo, hi, block_size)):
                b1 = min(b0 + block_size, hi)
                d = doc_ids[b0:b1]
                out["shard_id"].append(shard)
                out["term_id"].append(tid)
                out["block_id"].append(bi)
                out["first_doc_id"].append(int(d[0]))
                out["last_doc_id"].append(int(d[-1]))
                out["n_docs"].append(b1 - b0)
                out["doc_id_deltas"].append(encode_doc_gaps(d))
                out["tfs"].append(encode_tfs(tfs[b0:b1]))
                out["block_max_score"].append(float(block_upper_bound(scores[b0:b1])))
        return pd.DataFrame(out)

    return fn


def build_postings(
    triples_with_terms: DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: EngineConfig,
) -> DataFrame:
    """``triples_with_terms``: (term_id, doc_id, doc_len, tf, df, shard_id).

    Returns the postings table (POSTINGS_DDL). Grouping is by shard — one
    bounded pandas frame per shard; block content is a pure function of the
    data, so the index is identical at any parallelism.
    """
    return (
        triples_with_terms.groupBy("shard_id")
        .applyInPandas(_block_builder(n_docs, avgdl, cfg), schema=POSTINGS_DDL)
    )


def with_shard(df: DataFrame, cfg: EngineConfig, doc_col: str = "doc_id") -> DataFrame:
    return df.withColumn("shard_id", (F.col(doc_col) / F.lit(cfg.docs_per_shard)).cast("int"))
