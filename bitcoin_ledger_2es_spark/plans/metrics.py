"""Build metrics derived from the lineage log (SURVEY.md C13).

Every build stage appends lineage rows with rows_in/rows_out and
start/finish timestamps; this module turns the log into per-stage and
per-build throughput (rows/sec, turns/sec) — the north-rule "per-partition
lineage + metrics" reporting surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lineage import read_lineage


def stage_metrics(lineage: DataFrame) -> DataFrame:
    """Per-stage wall time, committed partitions, rows and rows/sec."""
    return (
        lineage.filter(F.col("status") == "COMPLETE")
        .groupBy("stage")
        .agg(
            F.count("*").alias("partitions"),
            F.sum("rows_out").alias("rows_out"),
            F.min("started_ts").alias("started"),
            F.max("finished_ts").alias("finished"),
        )
        .withColumn(
            "wall_sec",
            (F.unix_micros("finished") - F.unix_micros("started")) / 1e6,
        )
        .withColumn(
            "rows_per_sec",
            F.when(F.col("wall_sec") > 0, F.col("rows_out") / F.col("wall_sec")),
        )
        .orderBy("started")
    )


def build_report(spark: SparkSession, index_path: str) -> DataFrame:
    return stage_metrics(read_lineage(spark, index_path))


def throughput_turns_per_sec(spark: SparkSession, index_path: str) -> float | None:
    """End-to-end build throughput: source turns / total build wall time."""
    lin = read_lineage(spark, index_path).filter(F.col("status") == "COMPLETE")
    row = lin.agg(
        F.min("started_ts").alias("t0"),
        F.max("finished_ts").alias("t1"),
        F.max(F.when(F.col("stage") == "docmap", F.col("rows_in"))).alias("turns"),
    ).collect()[0]
    if not row["t0"] or not row["turns"]:
        return None
    wall = (row["t1"] - row["t0"]).total_seconds()
    return float(row["turns"]) / wall if wall > 0 else None
