"""ES retriever-tree search API (8.16+ — the modern ``_search`` entry
point that replaces the top-level query/knn/rank sections with one
composable tree). Public ES semantics: every node is a single-key
object naming the retriever type; compound nodes (``rrf``, ``linear``)
consume their children's ``rank_window_size``-capped ranked lists and
re-rank; leaf nodes run a query. This module is a pure DISPATCHER onto
the engine's existing surfaces — no new scoring arithmetic anywhere, so
every determinism contract (f64 retriever-index-order folds, (score
desc, doc_id asc) ties) is inherited from the surface that implements
the node:

  ``standard``   -> BM25Searcher.query_dsl (the wrapper-query dispatch;
                    a plain-string query means query_string syntax)
  ``knn``        -> operators.similarity.knn_search (exact scorer, ES
                    dense_vector score transforms); the vectors frame
                    comes in via ``knn_vectors`` (an index holds no
                    embedding column in this engine)
  ``rrf``        -> plans.query.rrf_fuse   (rank_constant 60 default)
  ``linear``     -> plans.query.linear_fuse (weights + one normalizer)
  ``pinned``     -> BM25Searcher.pinned (8.18; the wrapped retriever
                    must reduce to one organic query string)
  ``rule``       -> BM25Searcher.rule_query (8.16 query rules; same
                    organic-reduction rule as ``pinned``)
  ``rescorer``   -> BM25Searcher.rescore_top_k with a caller-supplied
                    ``rescore_fn`` (ES rescore queries are Painless;
                    the engine's script hook is a vectorized callable)
  ``text_similarity_reranker`` -> raises: it requires an inference
                    model, which this sandbox does not have.

Unknown node types and unsupported options raise loudly (the
search_template / wrapper discipline: never a silent misread). Every
node returns the uniform (rank, doc_id, score) shape so compounds can
nest arbitrarily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEFAULT_WINDOW = 10  # ES rank_window_size default


def _one_key(node: dict) -> tuple[str, dict]:
    if not isinstance(node, dict) or len(node) != 1:
        raise ValueError("retriever node must be a single-key object")
    (kind, spec), = node.items()
    if not isinstance(spec, dict):
        raise ValueError(f"retriever {kind!r}: body must be an object")
    return kind, spec


def _organic_text(node: dict) -> str:
    """Reduce a retriever node to one organic query string (for the
    ``pinned`` / ``rescorer`` wrappers, whose engine surfaces take query
    text): a ``standard`` node whose query is a plain string, or a
    single-field ``match``/``term`` body. Anything else raises."""
    kind, spec = _one_key(node)
    if kind != "standard":
        raise ValueError(
            f"this wrapper needs a standard retriever, got {kind!r}")
    q = spec.get("query")
    if isinstance(q, str):
        return q
    if isinstance(q, dict) and len(q) == 1:
        (qt, qs), = q.items()
        if qt in ("match", "term") and isinstance(qs, dict) \
                and list(qs) == ["text"]:
            v = qs["text"]
            if isinstance(v, str):
                return v
            if isinstance(v, dict):
                return v.get("query", v.get("value"))
    raise ValueError(
        "cannot reduce the wrapped retriever to one organic query string")


def retriever_search(
    searcher,
    node: dict,
    k: int = 10,
    knn_vectors: DataFrame | None = None,
    rescore_fn=None,
) -> DataFrame:
    """Evaluate a retriever tree against ``searcher``'s index and return
    the top-``k`` hits as (rank, doc_id, score) — see the module
    docstring for the node -> surface mapping."""
    kind, spec = _one_key(node)

    if kind == "standard":
        if "filter" in spec:
            raise ValueError(
                "standard retriever: filter objects are not supported — "
                "compose the filter into a bool query instead")
        q = spec.get("query")
        if q is None:
            raise ValueError("standard retriever needs a query")
        if isinstance(q, str):
            out = searcher.query_string(q, k=k, with_meta=False)
        else:
            out = searcher.query_dsl(q, k=k, with_meta=False)
        return out.select("rank", "doc_id", F.col("score").cast("double")
                          .alias("score"))

    if kind == "knn":
        if knn_vectors is None:
            raise ValueError(
                "knn retriever needs knn_vectors=(vec_id, embedding) — "
                "this index stores no embedding column")
        from ..operators.similarity import knn_search

        qv = [float(x) for x in spec["query_vector"]]
        spark = knn_vectors.sparkSession
        queries = spark.createDataFrame(
            [(0, qv)], "q_id long, q_vec array<double>")
        out = knn_search(
            knn_vectors, queries,
            k=int(spec.get("k", k)),
            num_candidates=int(spec.get("num_candidates",
                                        max(100, int(spec.get("k", k))))),
            metric=spec.get("similarity_metric", "cosine"),
            id_col=spec.get("field_id", "vec_id"),
            vec_col=spec.get("field", "embedding"),
        )
        return out.select(
            "rank", F.col("neighbor_id").alias("doc_id"),
            F.col("score6").cast("double").alias("score"))

    if kind in ("rrf", "linear"):
        children = spec.get("retrievers")
        if not isinstance(children, list) or len(children) < 2:
            raise ValueError(f"{kind} retriever needs >= 2 retrievers")
        window = int(spec.get("rank_window_size", _DEFAULT_WINDOW))
        from .query import linear_fuse, rrf_fuse

        if kind == "rrf":
            results = [
                retriever_search(searcher, c, k=window,
                                 knn_vectors=knn_vectors,
                                 rescore_fn=rescore_fn)
                for c in children
            ]
            return rrf_fuse(
                results, rank_constant=int(spec.get("rank_constant", 60)),
                rank_window=window, k=k,
            ).select("rank", "doc_id", F.col("rrf").alias("score"))
        # linear: entries are {"retriever": node, "weight"?, "normalizer"?}
        weights, norms, results = [], set(), []
        for c in children:
            if not (isinstance(c, dict) and "retriever" in c):
                raise ValueError(
                    "linear retriever entries are "
                    '{"retriever": ..., "weight"?, "normalizer"?}')
            weights.append(float(c.get("weight", 1.0)))
            norms.add(c.get("normalizer", "minmax"))
            results.append(retriever_search(
                searcher, c["retriever"], k=window,
                knn_vectors=knn_vectors, rescore_fn=rescore_fn))
        if len(norms) != 1:
            raise ValueError(
                "linear retriever: one normalizer engine-wide "
                f"(got {sorted(norms)}) — linear_fuse normalizes all "
                "retrievers the same way")
        return linear_fuse(
            results, weights=weights, normalizer=norms.pop(),
            rank_window=window, k=k,
        ).select("rank", "doc_id", "score")

    if kind == "pinned":
        ids = spec.get("ids")
        if not isinstance(ids, list) or not ids:
            raise ValueError("pinned retriever needs non-empty ids")
        organic = _organic_text(spec["retriever"])
        return searcher.pinned(
            [int(i) for i in ids], organic, k=k, with_meta=False,
        ).select("rank", "doc_id", F.col("score").cast("double")
                 .alias("score"))

    if kind == "rescorer":
        if rescore_fn is None:
            raise ValueError(
                "rescorer retriever needs rescore_fn= (ES rescore "
                "queries are scripts; the engine's script hook is a "
                "vectorized callable)")
        rs = spec.get("rescore", {})
        window = int(rs.get("window_size", max(k, _DEFAULT_WINDOW)))
        organic = _organic_text(spec["retriever"])
        out = searcher.rescore_top_k(
            organic, rescore_fn, k=k, window=window,
            query_weight=float(rs.get("query_weight", 1.0)),
            rescore_weight=float(rs.get("rescore_weight", 1.0)),
        )
        return out.select(
            "rank", "doc_id",
            F.col("final_score").cast("double").alias("score"))

    if kind == "rule":
        # ES 8.16 rule retriever — the retriever-tree form of the rule
        # query: same ruleset/criteria evaluation, organic reduced from
        # the wrapped retriever (the pinned-wrapper convention).
        ruleset = spec.get("ruleset")
        criteria = spec.get("match_criteria")
        if not isinstance(ruleset, list) or not isinstance(criteria, dict):
            raise ValueError(
                "rule retriever needs ruleset=[...] and match_criteria={}")
        organic = _organic_text(spec["retriever"])
        return searcher.rule_query(
            ruleset, criteria, organic, k=k, with_meta=False,
        ).select("rank", "doc_id", F.col("score").cast("double")
                 .alias("score"))

    if kind == "text_similarity_reranker":
        raise ValueError(
            "text_similarity_reranker requires an inference model — "
            "not available in this engine")

    raise ValueError(f"unsupported retriever type: {kind!r}")
