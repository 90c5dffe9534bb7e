"""ES agg builders (operators/aggs.py) vs pandas recomputation, and
BM25Searcher.match_docs (the query+aggregations match set) vs the
constant-score path's doc set."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.operators.aggs import (
    filters_agg,
    histogram,
    range_agg,
    rare_terms,
    terms_agg,
)

CFG = DEFAULT.with_(docs_per_shard=128, block_size=32)


@pytest.fixture(scope="module")
def searcher(spark, tiny_df):
    return BM25Searcher(build_index(tiny_df, CFG))


@pytest.fixture(scope="module")
def num_df(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "v": rng.integers(0, 100, 500).astype(float),
            "g": rng.choice(list("abcdef"), 500, p=[0.4, 0.3, 0.15, 0.1, 0.04, 0.01]),
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_histogram(num_df):
    df, pdf = num_df
    got = histogram(df, "v", 25.0, metrics={"m": F.avg("v")}).toPandas()
    exp = (
        pdf.assign(bucket=(pdf.v // 25.0) * 25.0)
        .groupby("bucket")
        .agg(doc_count=("v", "size"), m=("v", "mean"))
        .reset_index()
        .sort_values("bucket")
    )
    assert got["bucket"].tolist() == exp["bucket"].tolist()
    assert got["doc_count"].tolist() == exp["doc_count"].tolist()
    assert got["m"].tolist() == pytest.approx(exp["m"].tolist())


def test_histogram_min_doc_count(num_df):
    df, pdf = num_df
    got = histogram(df, "v", 1.0, min_doc_count=8).toPandas()
    exp = pdf.groupby((pdf.v // 1.0) * 1.0).size()
    assert got["doc_count"].tolist() == exp[exp >= 8].tolist()


def test_range_agg_overlap_and_unbounded(num_df):
    df, pdf = num_df
    got = range_agg(
        df, "v",
        [("lo", None, 30.0), ("broad", 10.0, 90.0), ("hi", 60.0, None)],
        metrics={"m": lambda c: F.avg(F.when(c, F.col("v")))},
    ).toPandas()
    assert got["key"].tolist() == ["lo", "broad", "hi"]  # given order kept
    masks = [pdf.v < 30, (pdf.v >= 10) & (pdf.v < 90), pdf.v >= 60]
    assert got["doc_count"].tolist() == [int(m.sum()) for m in masks]
    assert got["m"].tolist() == pytest.approx([float(pdf.v[m].mean()) for m in masks])
    # overlapping ranges double-count by design (ES: independent filters)
    assert sum(got["doc_count"]) > len(pdf)


def test_filters_agg(num_df):
    df, pdf = num_df
    got = filters_agg(
        df,
        {"small": F.col("v") < 10, "aa": F.col("g") == "a"},
        metrics={"m": lambda c: F.sum(F.when(c, F.col("v")))},
    ).toPandas()
    assert got["key"].tolist() == ["small", "aa"]
    assert got["doc_count"].tolist() == [int((pdf.v < 10).sum()), int((pdf.g == "a").sum())]
    assert got["m"].tolist() == pytest.approx(
        [float(pdf.v[pdf.v < 10].sum()), float(pdf.v[pdf.g == "a"].sum())]
    )


def test_rare_terms(num_df):
    df, pdf = num_df
    counts = pdf.g.value_counts()
    cut = int(counts.median())
    got = rare_terms(df, "g", max_doc_count=cut).toPandas()
    exp = counts[counts <= cut].reset_index()
    exp.columns = ["key", "doc_count"]
    exp = exp.sort_values(["doc_count", "key"])
    assert got["key"].tolist() == exp["key"].tolist()
    assert got["doc_count"].tolist() == exp["doc_count"].tolist()


def test_terms_agg_order_by_subagg(num_df):
    df, pdf = num_df
    got = terms_agg(
        df, "g", size=3, subaggs={"avg_v": F.avg("v")},
        order_by=("avg_v", "desc"),
    ).toPandas()
    exp = (
        pdf.groupby("g")
        .agg(doc_count=("v", "size"), avg_v=("v", "mean"))
        .reset_index()
        .sort_values(["avg_v", "g"], ascending=[False, True])
        .head(3)
    )
    assert got["key"].tolist() == exp["g"].tolist()
    assert got["avg_v"].tolist() == pytest.approx(exp["avg_v"].tolist())
    # _count ordering still works
    got2 = terms_agg(df, "g", size=2).toPandas()
    exp2 = pdf.g.value_counts()
    assert got2["doc_count"].tolist() == exp2.head(2).tolist()


# ---------------------------------------------------------------------------
# match_docs: the full match set behind query+aggs


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_match_docs_equals_constant_score_set(searcher):
    s = searcher
    for mode in ("and", "or"):
        got = _ids(s.match_docs("w0001 w0005", mode=mode, must_not="w0009"))
        exp = _ids(
            s.constant_score("w0001 w0005", mode=mode, must_not="w0009",
                             k=1_000_000, with_meta=False)
        )
        assert got == exp and got


def test_match_docs_filter_and_empty(searcher):
    s = searcher
    all_rows = s.match_docs("w0001")
    filt = s.match_docs("w0001", doc_filter=F.col("is_rollup") == False)  # noqa: E712
    assert 0 < filt.count() <= all_rows.count()
    assert s.match_docs("zz_oov w0001", mode="and").count() == 0
    # schema is the docmap projection aggregations build on
    assert [f.name for f in filt.schema.fields] == [
        "doc_id", "conv_id", "turn_idx", "doc_len", "is_rollup"
    ]


def test_match_docs_feeds_aggs(searcher):
    m = searcher.match_docs("w0001", mode="and")
    h = histogram(m, "doc_len", 20.0).toPandas()
    pdf = m.select("doc_len").toPandas()
    exp = pdf.groupby((pdf.doc_len // 20) * 20.0).size()
    assert h["doc_count"].tolist() == exp.tolist()
