import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.operators.salting import (
    hot_keys,
    salted_broadcast_left,
    salted_sum_count,
)
from bitcoin_ledger_2es_spark.plans.lineage import build_index_resumable
from bitcoin_ledger_2es_spark.plans.metrics import (
    build_report,
    throughput_turns_per_sec,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # key "hot" has 50k rows, 100 cold keys have 10 each
    hot = spark.range(50_000).select(F.lit("hot").alias("k"), (F.col("id") % 7).alias("v"))
    cold = spark.range(1_000).select(
        F.concat(F.lit("c"), (F.col("id") % 100)).alias("k"), (F.col("id") % 5).alias("v")
    )
    return hot.unionByName(cold)


def test_salted_sum_count_matches_plain(spark, skewed):
    plain = {
        r["k"]: (r["s"], r["c"])
        for r in skewed.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("c")).collect()
    }
    salted = {
        r["k"]: (r["sum_v"], r["count"])
        for r in salted_sum_count(skewed, ["k"], "v", n_salts=8).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark, skewed):
    small = spark.createDataFrame([("hot", 1.5), ("c1", 2.0)], "k string, w double")
    plain = skewed.join(small, "k").agg(F.sum(F.col("v") * F.col("w"))).collect()[0][0]
    salted = salted_broadcast_left(skewed, small, "k", n_salts=4).agg(
        F.sum(F.col("v") * F.col("w"))
    ).collect()[0][0]
    assert plain == salted


def test_hot_keys(spark, skewed):
    hk = {r["k"] for r in hot_keys(skewed, ["k"], 1000).collect()}
    assert hk == {"hot"}


def test_metrics_from_lineage(spark, tiny_df, tmp_path):
    path = str(tmp_path / "ix")
    build_index_resumable(spark, tiny_df, path, DEFAULT.with_(docs_per_shard=256, n_waves=2))
    rep = build_report(spark, path).toPandas().set_index("stage")
    assert {"docmap", "dictionary", "postings", "finalize"} <= set(rep.index)
    assert rep.loc["postings", "partitions"] >= 2
    tps = throughput_turns_per_sec(spark, path)
    assert tps is not None and tps > 0
