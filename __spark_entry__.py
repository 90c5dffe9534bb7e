"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The real engine lives in ``bitcoin_ledger_2es_spark/``; this module only
adapts it to the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the inverted index over the sf0.001 documents corpus
    (each document = a single-turn conversation) with the from-scratch
    SPIMI -> delta+varint -> block-max-WAND engine, then answer a BM25
    top-k match query. Driver checks rows > 0 and a stable schema."""
    from pyspark.sql import functions as F

    from bitcoin_ledger_2es_spark import BM25Searcher, build_index
    from bitcoin_ledger_2es_spark.config import DEFAULT

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    transcripts = docs.select(
        F.format_string("c%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    cfg = DEFAULT.with_(docs_per_shard=256, block_size=64, index_rollups=False)
    ix = build_index(transcripts, cfg)
    return BM25Searcher(ix).top_k("spark table join scan", k=10, mode="or")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bitcoin_ledger_2es_spark.contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from bitcoin_ledger_2es_spark.contract import ORACLE

    return dict(ORACLE)
