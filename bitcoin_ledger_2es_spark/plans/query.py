"""Query plan: BM25 top-k over the inverted index (SURVEY.md §3.4).

Two-phase, exactly like ES query-then-fetch:

  1. **query phase** — analyze the query driver-side with the indexing
     analyzer; look the terms up in the dictionary (predicate pushdown into
     the sorted dictionary parquet — a tiny collect); scan only the
     postings of those term_ids (filter pushdown + row-group pruning);
     cogroup postings with the shard's doc lengths and run the per-shard
     scorer (BMW skipping for long lists, fused vectorized scoring for
     short ones — both exact); each shard emits at most k candidates.
  2. **fetch phase** — merge the <= k*n_shards candidates globally
     (score_f32 desc, doc_id asc — rank-stable ties), keep k, broadcast-join
     docmap for (conv_id, turn_idx, is_rollup).

No wide shuffle at query time: one narrow pruned scan + a tiny merge.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.analyze import analyze_query
from ..functions.bm25 import idf as idf_fn
from ..operators.wand import (
    _TermList,
    score_shard_bmw,
    score_shard_conjunction,
    score_shard_exact,
)
from .build import IndexFrames

_CAND_DDL = "doc_id long, score float"
_RESULT_DDL = "rank int, doc_id long, score float, conv_id string, turn_idx int, is_rollup boolean"
_EMPTY_CAND = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64), "score": pd.Series([], dtype=np.float32)})


def _shard_kernel(term_meta, k, mode, avgdl, k1, b, dps, use_wand, wand_min, has_filter):
    tm = sorted(term_meta, key=lambda m: m[0])  # [(term_id, idf, weight)]
    n_query_terms = len(tm)

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return _EMPTY_CAND
        present = set(left["term_id"].unique().tolist())
        if mode == "and" and len(present) < n_query_terms:
            return _EMPTY_CAND
        base = int(left["shard_id"].iloc[0]) * dps
        doc_off = right["doc_id"].to_numpy(np.int64) - base
        span = int(doc_off.max()) + 1
        dl = np.zeros(span, dtype=np.int64)
        dl[doc_off] = right["doc_len"].to_numpy(np.int64)
        allowed = None
        if has_filter:
            allowed = np.zeros(span, dtype=bool)
            allowed[doc_off] = right["_allowed"].to_numpy(bool)

        total_postings = int(left["n_docs"].sum())
        if use_wand and allowed is None and total_postings >= wand_min:
            lists = [
                _TermList(tid, t_idf, w, left[left["term_id"] == tid])
                for tid, t_idf, w in tm
                if tid in present
            ]
            look = lambda d: float(dl[d - base])
            if mode == "and":
                return score_shard_conjunction(lists, look, k, avgdl, k1, b)
            return score_shard_bmw(lists, look, k, avgdl, k1, b)

        blocks = [
            (tid, t_idf, w, left[left["term_id"] == tid])
            for tid, t_idf, w in tm
            if tid in present
        ]
        return score_shard_exact(blocks, base, dl, allowed, k, mode, avgdl, k1, b)

    return fn


class BM25Searcher:
    def __init__(self, ix: IndexFrames, use_wand: bool = True):
        self.ix = ix
        self.use_wand = use_wand
        self._spark = ix.docmap.sparkSession

    def _empty(self) -> DataFrame:
        return self._spark.createDataFrame([], _RESULT_DDL)

    def top_k(
        self,
        query_text: str,
        k: int = 10,
        mode: str = "or",
        doc_filter: Column | None = None,
    ) -> DataFrame:
        """Exact BM25 top-k. ``doc_filter``: optional non-scoring predicate
        over docmap columns (ES bool.filter / range-query context) — e.g.
        ``F.col("is_rollup") == False`` or a doc_id/conv_id range."""
        ix, cfg = self.ix, self.ix.cfg
        terms = analyze_query(query_text, cfg)
        if not terms:
            return self._empty()
        weights = Counter(terms)
        found = (
            ix.dictionary.filter(F.col("term").isin(list(weights)))
            .select("term", "term_id", "df")
            .collect()
        )
        if mode == "and" and len(found) < len(weights):
            return self._empty()  # a required term matches nothing
        if not found:
            return self._empty()
        term_meta = [
            (int(r["term_id"]), float(idf_fn(float(r["df"]), ix.n_docs)), float(weights[r["term"]]))
            for r in found
        ]
        term_ids = [m[0] for m in term_meta]

        cand_postings = ix.postings.filter(F.col("term_id").isin(term_ids))
        docmap_lite = ix.docmap.select("shard_id", "doc_id", "doc_len")
        has_filter = doc_filter is not None
        if has_filter:
            docmap_lite = ix.docmap.withColumn("_allowed", doc_filter).select(
                "shard_id", "doc_id", "doc_len", "_allowed"
            )

        kernel = _shard_kernel(
            term_meta, k, mode, ix.avgdl, cfg.k1, cfg.b, cfg.docs_per_shard,
            self.use_wand, cfg.wand_min_postings, has_filter,
        )
        cands = (
            cand_postings.groupBy("shard_id")
            .cogroup(docmap_lite.groupBy("shard_id"))
            .applyInPandas(kernel, schema=_CAND_DDL)
        )
        top = cands.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        top = top.withColumn("rank", F.row_number().over(w))
        out = (
            F.broadcast(top)
            .join(self.ix.docmap.select("doc_id", "conv_id", "turn_idx", "is_rollup"), "doc_id", "left")
            .select("rank", "doc_id", "score", "conv_id", "turn_idx", "is_rollup")
            .orderBy("rank")
        )
        return out

    def term_query(self, term: str, k: int = 10) -> DataFrame:
        """ES term-query analogue (B2): single exact term, BM25-ranked."""
        return self.top_k(term, k=k, mode="or")
