"""Multi-index search: the ES ``GET /idx1,idx2/_search`` shape over
several on-disk indexes at once (and the read side of rollover'd
aliases).

Semantics mirrored from ES (public docs): each index is scored with its
OWN statistics — ES query_then_fetch scores per shard/index and merges
hits purely by score, so cross-index IDF drift is part of the contract,
not a bug here. Hits carry ``_index`` (which index they came from); the
merged order needs a deterministic tie-break because doc_ids repeat
across indexes: (score_f32 desc, _index asc, doc_id asc) — the same
unique-total-order discipline as every other selection edge in this
engine.

Scale shape: each member searcher already reduces to <= k candidate
rows via its pruned scan + shard kernels; the merge below unions m*k
rows and re-ranks — driver-independent, no wide exchange, adding
indexes adds member scans, never a bigger merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .query import BM25Searcher


class MultiSearcher:
    """Search several indexes as one. ``searchers`` maps index name (the
    registry path for alias-opened multis) -> BM25Searcher."""

    def __init__(self, searchers: dict[str, BM25Searcher]):
        if not searchers:
            raise ValueError("MultiSearcher needs at least one index")
        self.searchers = dict(searchers)

    def _merge(self, parts: list[DataFrame], k: int) -> DataFrame:
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        w = Window.orderBy(F.desc("score"), F.asc("_index"), F.asc("doc_id"))
        return (
            u.orderBy(F.desc("score"), F.asc("_index"), F.asc("doc_id"))
            .limit(k)
            .withColumn("rank", F.row_number().over(w))
            .select(
                "rank", "_index",
                *[c for c in parts[0].columns if c not in ("rank", "_index")],
            )
            .orderBy("rank")
        )

    def top_k(
        self,
        query_text: str,
        k: int = 10,
        mode: str = "or",
        doc_filter: Column | None = None,
        with_meta: bool = True,
        indices_boost: "dict[str, float] | None" = None,
    ) -> DataFrame:
        """Global top-k across all member indexes: per-index exact top-k
        (each with its own corpus stats — the ES per-index scoring
        model), then a k-row merge re-ranked under the deterministic
        (score, _index, doc_id) order.

        ``indices_boost`` (ES search-body ``indices_boost``): multiply
        each member's hit scores by its boost BEFORE the merge (unnamed
        members default 1.0; an unknown name raises — ES validates
        against the request's index list too). The multiply is one f64
        op on the emitted f32 score, re-emitted f32 — deterministic and
        oracle-mirrorable like every score transform here."""
        boosts = dict(indices_boost or {})
        if unknown := set(boosts) - set(self.searchers):
            raise ValueError(f"indices_boost names unknown indexes: "
                             f"{sorted(unknown)}")
        parts = []
        for name, s in self.searchers.items():
            p = (
                s.top_k(query_text, k=k, mode=mode, doc_filter=doc_filter,
                        with_meta=with_meta)
                .drop("rank")
                .withColumn("_index", F.lit(name))
            )
            b = float(boosts.get(name, 1.0))
            if b != 1.0:
                p = p.withColumn(
                    "score",
                    (F.col("score").cast("double") * F.lit(b))
                    .cast("float"),
                )
            parts.append(p)
        return self._merge(parts, k)

    def count(self, query_text: str = "", mode: str = "and",
              doc_filter: Column | None = None) -> int:
        """ES _count across indexes: sum of member counts (doc spaces are
        disjoint by construction — distinct indexes)."""
        return sum(
            s.count(query_text, mode=mode, doc_filter=doc_filter)
            for s in self.searchers.values()
        )
