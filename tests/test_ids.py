import numpy as np
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark.operators.ids import (
    assign_doc_ids,
    conversation_offsets,
    with_global_rank,
)


def test_global_rank_matches_sort(spark):
    pdf = None
    df = spark.range(0, 10_000).select(
        (F.col("id") * 2654435761 % 99991).alias("key"), F.col("id").alias("payload")
    ).withColumn("key", F.concat(F.lit("k"), F.format_string("%06d", "key"), F.format_string("%05d", "payload")))
    ranked = with_global_rank(df, ["key"], num_partitions=7).toPandas().sort_values("key")
    assert ranked["_rank"].tolist() == list(range(10_000))


def test_prefix_sum(spark):
    df = spark.createDataFrame(
        [("a", 3), ("b", 5), ("c", 2), ("d", 7)], "k string, n int"
    )
    out = {
        r["k"]: (r["_rank"], r["_psum"])
        for r in with_global_rank(df, ["k"], value_col="n", num_partitions=3).collect()
    }
    assert out == {"a": (0, 0), "b": (1, 3), "c": (2, 8), "d": (3, 10)}


def test_doc_ids_are_global_rank_of_key_order(spark, tiny_df, tiny_pdf):
    docs = assign_doc_ids(tiny_df).select("conv_id", "turn_idx", "doc_id").toPandas()
    docs = docs.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert docs["doc_id"].tolist() == list(range(len(docs)))
    # matches pandas rank of the (shuffled-order) source
    expect = tiny_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (docs["conv_id"] == expect["conv_id"]).all()
    assert (docs["turn_idx"].to_numpy() == expect["turn_idx"].to_numpy()).all()


def test_doc_ids_parallelism_and_row_order_invariant(spark, tiny_pdf):
    from bitcoin_ledger_2es_spark.sources.synth import TRANSCRIPTS_DDL

    base = spark.createDataFrame(tiny_pdf, schema=TRANSCRIPTS_DDL)
    shuffled = spark.createDataFrame(
        tiny_pdf.sample(frac=1.0, random_state=7).reset_index(drop=True), schema=TRANSCRIPTS_DDL
    ).repartition(13)
    a = assign_doc_ids(base.coalesce(1)).select("conv_id", "turn_idx", "doc_id")
    b = assign_doc_ids(shuffled).select("conv_id", "turn_idx", "doc_id")
    pa_ = a.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pb = b.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (pa_["doc_id"].to_numpy() == pb["doc_id"].to_numpy()).all()


def test_conversation_offsets(spark, tiny_df, tiny_pdf):
    offs = conversation_offsets(tiny_df).toPandas().sort_values("conv_id").reset_index(drop=True)
    sizes = tiny_pdf.groupby("conv_id").size().sort_index()
    np.testing.assert_array_equal(offs["n_turns"].to_numpy(), sizes.to_numpy())
    np.testing.assert_array_equal(
        offs["conv_offset"].to_numpy(), np.concatenate([[0], np.cumsum(sizes.to_numpy())[:-1]])
    )
    assert offs["conv_rank"].tolist() == list(range(len(sizes)))
