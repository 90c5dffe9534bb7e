"""Transcripts source shim.

The production input is an Iceberg table of multi-turn transcripts
(BASELINE.json input_hint). This sandbox has no iceberg-spark-runtime jars
(SURVEY.md §7.5), so the reader takes a format switch: the Iceberg path is
config-only and the parquet path is what tests/benchmarks exercise. The
schema contract is identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def read_transcripts(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
) -> DataFrame:
    """Load the transcripts table and normalize to the contract schema.

    Column pruning + predicate pushdown are Catalyst built-ins on both
    formats; callers should filter before any wide transform so pushdown
    reaches the scan.
    """
    if fmt == "iceberg":
        df = spark.read.format("iceberg").load(path)
    elif fmt == "parquet":
        df = spark.read.parquet(path)
    else:
        raise ValueError(f"unknown transcripts format: {fmt!r}")
    return df.select(
        F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("int"),
        F.col("role").cast("string"),
        F.col("text").cast("string"),
        F.col("tool").cast("string"),
        F.col("ts").cast("timestamp"),
    )
