"""ES _rank_eval API: quality metrics for ranked results against
relevance judgments — precision@k, MRR (reciprocal_rank) and nDCG
(dcg / ideal dcg), the three metrics the ES endpoint ships.

Inputs are plain frames, so this evaluates ANY ranked output (top_k,
top_k_batch, dis_max, ...):

  results   — (query_id, rank, doc_id), rank 1-based, <= k rows/query;
  judgments — (query_id, doc_id, rating), the judged pool (docs absent
              from it count as rating 0, the ES unrated_docs default).

Semantics pinned to the ES implementation:

  * precision@k: relevant retrieved / RETRIEVED count (not /k), with
    relevant = rating >= ``relevant_min``;
  * reciprocal_rank: 1 / rank of the first relevant hit, 0 if none;
  * dcg gain = 2^rating - 1, discount = log2(rank + 1); ndcg divides by
    the ideal dcg of the query's JUDGED pool (top-k by rating desc).

Determinism: every per-query fold is over <= k (rank, value) pairs
aggregated in rank order via the sorted-array f64 fold the engine uses
everywhere a float sum crosses a shuffle. Scale shape: one broadcast of
the judgments (rank-eval pools are small by construction), one
(query_id) partial agg — evaluation cost is O(results)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ordered_fold(value_col: str):
    """f64 sum of (rank asc)-ordered struct array — deterministic under
    any partitioning."""
    return F.aggregate(
        F.array_sort(F.collect_list(F.struct("rank", value_col))),
        F.lit(0.0),
        lambda acc, x: acc + x[value_col],
    )


def rank_eval(
    results: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    relevant_min: int = 1,
) -> DataFrame:
    """-> (query_id, precision, reciprocal_rank, dcg, idcg, ndcg), one
    row per query_id present in ``results``."""
    j = judgments.select(
        "query_id", "doc_id", F.col("rating").cast("double").alias("rating")
    )
    hits = (
        results.select("query_id", "rank", "doc_id")
        .filter(F.col("rank") <= k)
        .join(F.broadcast(j), ["query_id", "doc_id"], "left")
        .withColumn("rating", F.coalesce(F.col("rating"), F.lit(0.0)))
        .withColumn("rel", (F.col("rating") >= relevant_min).cast("int"))
        .withColumn(
            "gain",
            (F.pow(F.lit(2.0), F.col("rating")) - 1.0)
            / F.log2(F.col("rank") + F.lit(1.0)),
        )
        .withColumn(
            "rr",
            F.when(
                F.col("rel") == 1, 1.0 / F.col("rank").cast("double")
            ).otherwise(F.lit(0.0)),
        )
    )
    per_q = hits.groupBy("query_id").agg(
        (F.sum("rel") / F.count("*")).alias("precision"),
        F.max("rr").alias("reciprocal_rank"),
        _ordered_fold("gain").alias("dcg"),
    )
    # ideal dcg: the judged pool ranked by (rating desc, doc_id asc), top k
    wj = Window.partitionBy("query_id").orderBy(
        F.desc("rating"), F.asc("doc_id")
    )
    ideal = (
        j.withColumn("rank", F.row_number().over(wj))
        .filter((F.col("rank") <= k) & (F.col("rating") > 0))
        .withColumn(
            "gain",
            (F.pow(F.lit(2.0), F.col("rating")) - 1.0)
            / F.log2(F.col("rank") + F.lit(1.0)),
        )
        .groupBy("query_id")
        .agg(_ordered_fold("gain").alias("idcg"))
    )
    return (
        per_q.join(ideal, "query_id", "left")
        .withColumn("idcg", F.coalesce(F.col("idcg"), F.lit(0.0)))
        .withColumn(
            "ndcg",
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).otherwise(
                F.lit(0.0)
            ),
        )
        .select(
            "query_id", "precision", "reciprocal_rank", "dcg", "idcg", "ndcg"
        )
    )
