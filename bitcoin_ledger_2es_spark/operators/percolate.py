"""ES percolate query: the REVERSE search — queries are registered,
documents arrive, and each document reports which queries match it
(saved-search alerting; ES stores the queries in a percolator field and
runs arriving docs through them).

Spark-first shape (no per-row Python, no per-query jobs):

  1. the registered queries are analyzed driver-side into
     (query_id, term, n_required) rows — a tiny frame, BROADCAST;
  2. documents tokenize JVM-side (the analyzer's codegen regexp twin,
     functions/analyze.py) and explode to DISTINCT (doc_id, term) pairs
     — presence is what matters, not tf;
  3. one broadcast hash join + one (doc_id, query_id) count-distinct
     aggregation; a query matches when the matched-term count reaches
     its requirement (all terms for mode='and', minimum_should_match
     for 'or').

Cost is O(total doc tokens) with map-side partial aggregation — the
shape survives any corpus size as long as the registered query set
broadcasts (ES percolator holds the query set in memory per shard under
the same assumption). Phrase/positional percolation is out of scope
(terms-only, like the candidate-matching pre-filter ES's percolator
runs before its memory-index verification)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..functions.analyze import analyze_query, tokenize_sql_builtin


def analyzed_queries(
    spark,
    queries: list[tuple[int, str, str, int]],
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """(query_id, text, mode, minimum_should_match) -> broadcastable
    (query_id, term, n_required) rows, analyzed with the INDEX analyzer
    (the percolator contract: query terms and doc tokens must come from
    the same analysis chain). mode='and' requires every distinct term;
    mode='or' requires max(minimum_should_match, 1) distinct terms. A
    minimum_should_match ABOVE the distinct-term count is unsatisfiable
    and matches nothing (the ES msm contract) — the query is simply not
    registered, rather than silently degrading to all-terms AND."""
    rows = []
    for qid, text, mode, msm in queries:
        terms = sorted(set(analyze_query(text, cfg)))
        if not terms:
            continue
        if mode == "and":
            need = len(terms)
        else:
            need = max(1, int(msm))
            if need > len(terms):
                continue  # unsatisfiable: matches nothing
        rows.extend((int(qid), t, need) for t in terms)
    return spark.createDataFrame(
        rows, "query_id long, term string, n_required int"
    )


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """Match every document against every registered query in ONE pass:
    returns (doc_id, query_id, n_matched) for each (doc, query) pair
    whose distinct-term overlap reaches the query's requirement.
    ``queries`` is the `analyzed_queries` frame (broadcast here)."""
    doc_terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokenize_sql_builtin(F.col(text_col), cfg))).alias("term"),
    )
    return (
        doc_terms.join(F.broadcast(queries), "term")
        .groupBy("doc_id", "query_id", "n_required")
        .agg(F.count("*").alias("n_matched"))
        .filter(F.col("n_matched") >= F.col("n_required"))
        .select("doc_id", "query_id", F.col("n_matched").cast("long").alias("n_matched"))
    )
