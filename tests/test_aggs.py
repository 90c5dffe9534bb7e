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


# ---------------------------------------------------------------------------
# extended_stats / value_count+missing / adjacency_matrix / pipeline helpers


def test_extended_stats(num_df):
    from bitcoin_ledger_2es_spark.operators.aggs import extended_stats

    df, pdf = num_df
    got = extended_stats(df, "v", sigma=2.0).toPandas().iloc[0]
    v = pdf.v.to_numpy(np.float64)
    assert got["count"] == len(v)
    assert got["min"] == v.min() and got["max"] == v.max()
    assert got["avg"] == pytest.approx(v.mean())
    assert got["sum"] == pytest.approx(v.sum())
    assert got["sum_of_squares"] == pytest.approx((v * v).sum())
    assert got["variance"] == pytest.approx(v.var())  # population, ES default
    assert got["std_deviation"] == pytest.approx(v.std())
    assert got["std_upper"] == pytest.approx(v.mean() + 2 * v.std())
    assert got["std_lower"] == pytest.approx(v.mean() - 2 * v.std())


def test_value_count_missing(spark):
    from bitcoin_ledger_2es_spark.operators.aggs import value_count_missing

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "y"), (4, None), (5, None)], "id int, s string"
    )
    got = value_count_missing(df, F.col("s")).toPandas().iloc[0]
    assert got["value_count"] == 2 and got["missing"] == 3


def test_adjacency_matrix(num_df):
    from bitcoin_ledger_2es_spark.operators.aggs import adjacency_matrix

    df, pdf = num_df
    got = adjacency_matrix(
        df,
        {"small": F.col("v") < 20, "aa": F.col("g") == "a", "big": F.col("v") >= 95},
    ).toPandas()
    m = {
        "small": pdf.v < 20,
        "aa": pdf.g == "a",
        "big": pdf.v >= 95,
    }
    exp = {k: int(v.sum()) for k, v in m.items()}
    exp["small&aa"] = int((m["small"] & m["aa"]).sum())
    exp["small&big"] = int((m["small"] & m["big"]).sum())
    exp["aa&big"] = int((m["aa"] & m["big"]).sum())
    exp = {k: v for k, v in exp.items() if v > 0}  # empty buckets dropped
    assert dict(zip(got["key"], got["doc_count"])) == exp
    assert "small&big" not in got["key"].tolist()  # disjoint pair pruned


@pytest.fixture(scope="module")
def daily_df(spark):
    pdf = pd.DataFrame({"day": list(range(10)), "sv": [5.0, 3, 8, 1, 9, 2, 7, 4, 6, 0]})
    return spark.createDataFrame(pdf), pdf


def test_moving_fn_window_is_exclusive(daily_df):
    from bitcoin_ledger_2es_spark.operators.aggs import moving_fn

    df, pdf = daily_df
    got = moving_fn(df, "day", "sv", window=3, fn="avg").orderBy("day").toPandas()
    exp = [None] + [
        float(np.mean(pdf.sv[max(0, i - 3):i])) for i in range(1, len(pdf))
    ]
    assert got["moving_fn"][0] is None or np.isnan(got["moving_fn"][0])
    assert got["moving_fn"][1:].tolist() == pytest.approx(exp[1:])


def test_serial_diff_and_selector_and_sort(daily_df):
    from bitcoin_ledger_2es_spark.operators.aggs import (
        bucket_selector,
        bucket_sort,
        serial_diff,
    )

    df, pdf = daily_df
    sd = serial_diff(df, "day", "sv", lag=2).orderBy("day").toPandas()
    exp = pdf.sv - pdf.sv.shift(2)
    assert sd["serial_diff"][2:].tolist() == pytest.approx(exp[2:].tolist())
    kept = bucket_selector(df, F.col("sv") >= 5).toPandas()
    assert sorted(kept["sv"].tolist()) == sorted(
        pdf.sv[pdf.sv >= 5].tolist()
    )
    top = bucket_sort(df, [("sv", "desc"), ("day", "asc")], size=3).toPandas()
    assert top["sv"].tolist() == sorted(pdf.sv, reverse=True)[:3]


def test_significant_text_matches_pandas(spark, searcher, tiny_df):
    from bitcoin_ledger_2es_spark.functions.analyze import tokenize_series
    from bitcoin_ledger_2es_spark.operators.aggs import significant_text
    from bitcoin_ledger_2es_spark.plans.build import tokenized_documents

    docs, _ = tokenized_documents(tiny_df, CFG)
    corpus = docs.select("doc_id", "text")
    fg = searcher.match_docs("w0001", mode="and")
    got = significant_text(fg, corpus, cfg=CFG, size=12, min_doc_count=3).toPandas()

    pdf = corpus.toPandas()
    fg_ids = set(r.doc_id for r in fg.select("doc_id").collect())
    toks = tokenize_series(pdf["text"], CFG)
    bg_df, fg_df = {}, {}
    for doc_id, ts in zip(pdf["doc_id"], toks):
        for t in set(ts):
            bg_df[t] = bg_df.get(t, 0) + 1
            if doc_id in fg_ids:
                fg_df[t] = fg_df.get(t, 0) + 1
    n_bg, n_fg = float(len(pdf)), float(len(fg_ids))
    rows = []
    for t, f in fg_df.items():
        if f < 3:
            continue
        fgp, bgp = f / n_fg, bg_df[t] / n_bg
        rows.append((t, f, bg_df[t], (fgp - bgp) * (fgp / bgp)))
    rows.sort(key=lambda r: (-r[3], r[0]))
    rows = rows[:12]
    assert got["term"].tolist() == [r[0] for r in rows]
    assert got["fg_df"].tolist() == [r[1] for r in rows]
    assert got["bg_df"].tolist() == [r[2] for r in rows]
    assert got["jlh"].tolist() == pytest.approx([r[3] for r in rows], rel=1e-12)
    # the foreground is genuinely a subset
    assert 0 < n_fg < n_bg


# ---- round-4 breadth: multi_terms / weighted_avg / percentile_ranks /
# string_stats / top_metrics / mad / matrix_stats / scripted_metric


def test_multi_terms(num_df):
    from bitcoin_ledger_2es_spark.operators.aggs import multi_terms

    df, pdf = num_df
    got = multi_terms(
        df.withColumn("h", (F.col("v") >= 50).cast("string")), ["g", "h"], size=4
    ).toPandas()
    exp = (
        pdf.assign(h=(pdf.v >= 50).astype(str).str.lower(), n=1)
        .assign(key=lambda d: d.g + "|" + d.h)
        .groupby("key")
        .size()
        .reset_index(name="doc_count")
        .sort_values(["doc_count", "key"], ascending=[False, True])
        .head(4)
    )
    assert got["key"].tolist() == exp["key"].tolist()
    assert got["doc_count"].tolist() == exp["doc_count"].tolist()


def test_weighted_avg_skips_nulls(spark):
    from bitcoin_ledger_2es_spark.operators.aggs import weighted_avg

    pdf = pd.DataFrame({"v": [10.0, 20.0, None, 40.0], "w": [1.0, 3.0, 5.0, None]})
    got = weighted_avg(
        spark.createDataFrame(pdf), F.col("v"), F.col("w")
    ).toPandas()
    # only rows where BOTH sides are present contribute (ES missing-skip)
    assert got["weighted_avg"][0] == pytest.approx((10 * 1 + 20 * 3) / 4.0)
    assert got["value_count"][0] == 2


def test_percentile_ranks_exact_cdf(num_df):
    from bitcoin_ledger_2es_spark.operators.aggs import percentile_ranks

    df, pdf = num_df
    got = percentile_ranks(df, "v", [10.0, 50.0, 99.0]).toPandas()
    for key, pct in zip(got["key"], got["percent"]):
        v = float(key)
        assert pct == pytest.approx((pdf.v <= v).mean() * 100.0)


def test_string_stats_entropy(spark):
    from bitcoin_ledger_2es_spark.operators.aggs import string_stats

    pdf = pd.DataFrame({"t": ["aab", "b\ncd", "eeee"]})
    got = string_stats(spark.createDataFrame(pdf), F.col("t")).toPandas()
    assert got["count"][0] == 3
    assert got["min_length"][0] == 3
    assert got["max_length"][0] == 4
    assert got["avg_length"][0] == pytest.approx(11 / 3)
    from collections import Counter

    counts = Counter("".join(pdf.t))  # newline counts as a char ((?s).)
    tot = sum(counts.values())
    exp = -sum(n / tot * np.log2(n / tot) for n in counts.values())
    assert got["entropy"][0] == pytest.approx(exp, rel=1e-12)


def test_top_metrics_deterministic_ties(spark):
    from bitcoin_ledger_2es_spark.operators.aggs import top_metrics

    pdf = pd.DataFrame(
        {"s": [5.0, 9.0, 9.0, 1.0], "id": [4, 3, 2, 1], "m": [40, 30, 20, 10]}
    )
    got = top_metrics(
        spark.createDataFrame(pdf), "s", ["m"], size=2, tiebreak="id"
    ).toPandas()
    # both 9.0 rows win; tie broken by id asc -> m=20 before m=30
    assert got["m"].tolist() == [20, 30]


def test_median_absolute_deviation(num_df):
    from bitcoin_ledger_2es_spark.operators.aggs import (
        median_absolute_deviation,
    )

    df, pdf = num_df
    got = median_absolute_deviation(df, "v").toPandas()
    med = np.percentile(pdf.v, 50, method="linear")
    mad = np.percentile((pdf.v - med).abs(), 50, method="linear")
    assert got["median"][0] == pytest.approx(med)
    assert got["mad"][0] == pytest.approx(mad)


def test_matrix_stats_closed_forms(num_df):
    from bitcoin_ledger_2es_spark.operators.aggs import matrix_stats

    df, pdf = num_df
    df = df.withColumn("u", (F.col("v") * 2 + 3).cast("double"))
    got = matrix_stats(df, ["v", "u"]).toPandas().set_index(["stat", "key"])
    v = pdf.v.to_numpy()
    u = v * 2 + 3
    assert got.loc[("mean", "v"), "value"] == pytest.approx(v.mean())
    assert got.loc[("variance", "v"), "value"] == pytest.approx(v.var())
    # skewness/kurtosis: population moments m3/m2^1.5, m4/m2^2
    m = v.mean()
    m2 = ((v - m) ** 2).mean()
    m3 = ((v - m) ** 3).mean()
    m4 = ((v - m) ** 4).mean()
    assert got.loc[("skewness", "v"), "value"] == pytest.approx(m3 / m2**1.5)
    assert got.loc[("kurtosis", "v"), "value"] == pytest.approx(m4 / m2**2)
    # u = 2v+3 -> correlation exactly 1, covariance = 2*var(v)
    assert got.loc[("covariance", "v,u"), "value"] == pytest.approx(2 * v.var())
    assert got.loc[("correlation", "v,u"), "value"] == pytest.approx(1.0)


def test_scripted_metric_partition_invariant(num_df):
    from bitcoin_ledger_2es_spark.operators.aggs import scripted_metric

    df, pdf = num_df

    def mc(p):
        return pd.DataFrame(
            {"n": [len(p)], "s": [int(p["v"].astype("int64").sum())]}
        )

    def red(p):
        n, s = int(p["n"].sum()), int(p["s"].sum())
        return pd.DataFrame({"mean": [s / n]})

    outs = [
        scripted_metric(
            df.repartition(parts).select("v"), mc, red,
            "n long, s long", "mean double",
        ).toPandas()["mean"][0]
        for parts in (1, 7)
    ]
    # integer partial sums -> identical result at any parallelism
    assert outs[0] == outs[1] == pytest.approx(pdf.v.mean())


def test_sampler_deterministic_and_uniform(num_df):
    from bitcoin_ledger_2es_spark.operators.aggs import (
        diversified_sampler,
        sampler,
    )

    df, pdf = num_df
    df = df.withColumn("id", F.monotonically_increasing_id())
    # materialize ids so both samples see identical rows
    df = df.select("v", "g", "id").cache()
    a = sampler(df, 20, "id", seed=3).toPandas()
    b = sampler(df.repartition(13), 20, "id", seed=3).toPandas()
    # parallelism-invariant (hash-of-id selection, not partition order)
    assert sorted(a["id"]) == sorted(b["id"])
    assert len(a) == 20
    # a different seed picks a different sample
    c = sampler(df, 20, "id", seed=4).toPandas()
    assert sorted(c["id"]) != sorted(a["id"])
    d = diversified_sampler(df, 15, "id", "g", max_docs_per_value=2).toPandas()
    assert len(d) == 15 or len(d) == d["g"].nunique() * 2
    assert d.groupby("g").size().max() <= 2
    df.unpersist()


def test_auto_date_histogram_picks_fitting_interval(spark):
    from bitcoin_ledger_2es_spark.operators.aggs import auto_date_histogram

    pdf = pd.DataFrame({
        "ts": pd.date_range("2024-01-01", periods=500, freq="137s")
    })
    df = spark.createDataFrame(pdf)
    # span ~19h: 30m -> 39 buckets (fits 40), 10m -> 115 (does not)
    got = auto_date_histogram(df, "ts", target_buckets=40).toPandas()
    assert got["interval"].iloc[0] == "1800"
    assert len(got) <= 40
    assert got["doc_count"].sum() == 500
    # tighter target climbs the ladder to 3h
    got2 = auto_date_histogram(df, "ts", target_buckets=8).toPandas()
    assert got2["interval"].iloc[0] == "10800"
    # multi-year span falls to the calendar part of the ladder
    wide = spark.createDataFrame(pd.DataFrame({
        "ts": pd.date_range("2018-01-01", periods=50, freq="30D")
    }))
    got3 = auto_date_histogram(wide, "ts", target_buckets=10).toPandas()
    assert got3["interval"].iloc[0] in ("quarter", "year")
    assert got3["doc_count"].sum() == 50


def test_geo_haversine_and_filters(spark):
    from bitcoin_ledger_2es_spark.functions.geo import (
        geo_bounding_box,
        geo_distance_agg,
        geo_distance_filter,
        haversine_km,
    )

    pts = pd.DataFrame({
        "name": ["paris", "nyc", "sydney", "antipode_ish"],
        "lat": [48.8566, 40.7128, -33.8688, -48.8566],
        "lon": [2.3522, -74.0060, 151.2093, -177.6478],
    })
    df = spark.createDataFrame(pts)
    got = df.select(
        "name",
        haversine_km(F.col("lat"), F.col("lon"), F.lit(48.8566), F.lit(2.3522)).alias("km"),
    ).toPandas().set_index("name")["km"]
    assert got["paris"] == 0.0
    assert got["nyc"] == pytest.approx(5837, abs=10)       # known distance
    assert got["sydney"] == pytest.approx(16960, abs=30)
    # antipode of paris: half the Earth's circumference, clamp keeps asin sane
    assert got["antipode_ish"] == pytest.approx(20015, abs=10)
    n_near = df.filter(
        geo_distance_filter(F.col("lat"), F.col("lon"), 48.8566, 2.3522, 6000.0)
    ).count()
    assert n_near == 2  # paris + nyc
    n_box = df.filter(
        geo_bounding_box(F.col("lat"), F.col("lon"), (60.0, -90.0), (30.0, 30.0))
    ).count()
    assert n_box == 2  # paris + nyc again (lat 30..60, lon -90..30)
    agg = geo_distance_agg(
        df, F.col("lat"), F.col("lon"), 48.8566, 2.3522,
        [("near", None, 1000.0), ("far", 1000.0, None)],
    ).toPandas()
    assert agg.set_index("key")["doc_count"].to_dict() == {"near": 1, "far": 3}
    with pytest.raises(ValueError, match="dateline"):
        geo_bounding_box(F.col("lat"), F.col("lon"), (10.0, 170.0), (0.0, -170.0))


def test_boxplot_exact_quartiles(num_df):
    from bitcoin_ledger_2es_spark.operators.aggs import boxplot

    df, pdf = num_df
    got = boxplot(df, "v").toPandas().iloc[0]
    assert got["count"] == len(pdf)
    assert got["min"] == pdf.v.min() and got["max"] == pdf.v.max()
    # numpy 'linear' interpolation == Spark percentile == quantile_cont
    for k, q in (("q1", 0.25), ("q2", 0.5), ("q3", 0.75)):
        assert got[k] == pytest.approx(np.percentile(pdf.v, q * 100), abs=1e-12)


def test_t_test_welch_and_pooled(num_df):
    from bitcoin_ledger_2es_spark.operators.aggs import t_test

    df, pdf = num_df
    got = t_test(df, F.col("v"), F.col("g") == "a").toPandas().iloc[0]
    a = pdf.v[pdf.g == "a"].to_numpy()
    b = pdf.v[pdf.g != "a"].to_numpy()
    # independent recomputation: numpy means + ddof=1 variances
    va, vb = a.var(ddof=1), b.var(ddof=1)
    na, nb = len(a), len(b)
    welch = (a.mean() - b.mean()) / np.sqrt(va / na + vb / nb)
    sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    pooled = (a.mean() - b.mean()) / np.sqrt(sp2 * (1 / na + 1 / nb))
    assert got["n_a"] == na and got["n_b"] == nb
    assert got["t_welch"] == pytest.approx(welch, rel=1e-12)
    assert got["t_pooled"] == pytest.approx(pooled, rel=1e-12)


@pytest.fixture(scope="module")
def month_df(spark):
    # three calendar months (Feb 2024 is a leap month: 29 days), one
    # month gap in user arrivals: u1/u2 arrive in Jan, u1 repeats in Feb
    # (no new users), u3 arrives in Mar
    rows = [
        ("2024-01-05 10:00:00", 1, 10.0),
        ("2024-01-20 11:00:00", 2, 20.0),
        ("2024-02-10 12:00:00", 1, 29.0),
        ("2024-03-01 13:00:00", 3, 31.0),
        ("2024-03-15 14:00:00", 1, 31.0),
    ]
    pdf = pd.DataFrame(rows, columns=["ts", "uid", "val"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


def test_rate_agg_normalizes_by_month_length(month_df):
    from bitcoin_ledger_2es_spark.operators.aggs import rate_agg

    got = rate_agg(month_df, "ts", F.col("val"), unit="day").toPandas()
    assert got["month"].tolist() == ["2024-01", "2024-02", "2024-03"]
    assert got["rate"].tolist() == pytest.approx([30.0 / 31, 29.0 / 29, 62.0 / 31])
    plain = rate_agg(month_df, "ts", F.col("val"), unit="month").toPandas()
    assert plain["rate"].tolist() == pytest.approx([30.0, 29.0, 62.0])
    with pytest.raises(ValueError):
        rate_agg(month_df, "ts", F.col("val"), unit="fortnight")


def test_stats_bucket_and_normalize(month_df):
    from bitcoin_ledger_2es_spark.operators.aggs import (
        normalize_percent_of_sum,
        stats_bucket,
    )

    monthly = month_df.groupBy(
        F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("month")
    ).agg(F.sum("val").alias("bsum"))
    sb = stats_bucket(monthly, "bsum").toPandas().iloc[0]
    assert sb["count"] == 3 and sb["min"] == 29.0 and sb["max"] == 62.0
    assert sb["sum"] == 121.0 and sb["avg"] == pytest.approx(121.0 / 3)
    nz = normalize_percent_of_sum(monthly, "bsum").orderBy("month").toPandas()
    assert nz["percent"].tolist() == pytest.approx(
        [30.0 / 121 * 100, 29.0 / 121 * 100, 62.0 / 121 * 100]
    )
    # pass-through: the bucket frame's own columns survive
    assert set(nz.columns) == {"month", "bsum", "percent"}


def test_cumulative_cardinality_first_month_pinning(month_df):
    from bitcoin_ledger_2es_spark.operators.aggs import cumulative_cardinality

    got = cumulative_cardinality(month_df, "ts", "uid").toPandas()
    assert got["month"].tolist() == ["2024-01", "2024-02", "2024-03"]
    # u1's Feb/Mar repeats must NOT recount; Feb has no new users but
    # still appears (month spine), carrying the cumulative forward
    assert got["new_ids"].tolist() == [2, 0, 1]
    assert got["cumulative"].tolist() == [2, 2, 3]


def test_geotile_key_reference_tiles(spark):
    import math

    from bitcoin_ledger_2es_spark.functions.geo import (
        GEOTILE_MAX_LAT,
        geotile_key,
    )

    def ref(lat, lon, z):
        n = 1 << z
        lat = max(-GEOTILE_MAX_LAT, min(GEOTILE_MAX_LAT, lat))
        x = min(n - 1, max(0, math.floor((lon + 180.0) / 360.0 * n)))
        r = math.radians(lat)
        y = math.floor((1.0 - math.log(math.tan(r) + 1.0 / math.cos(r)) / math.pi) / 2.0 * n)
        return f"{z}/{x}/{min(n - 1, max(0, y))}"

    pts = [
        (0.0, 0.0), (51.5, -0.13), (-33.86, 151.2), (85.3, 10.0),
        (-90.0, -180.0), (89.9, 179.9), (-85.06, 0.0), (37.77, -122.42),
    ]
    pdf = pd.DataFrame(pts, columns=["lat", "lon"])
    for z in (0, 1, 4, 10):
        got = (
            spark.createDataFrame(pdf)
            .select(geotile_key(F.col("lat"), F.col("lon"), z).alias("k"))
            .toPandas()["k"]
            .tolist()
        )
        assert got == [ref(la, lo, z) for la, lo in pts], f"zoom {z}"
    with pytest.raises(ValueError):
        geotile_key(F.lit(0.0), F.lit(0.0), 31)


def test_geohash_key_vs_interval_halving_reference(spark):
    from bitcoin_ledger_2es_spark.functions.geo import (
        GEOHASH_BASE32,
        geohash_key,
    )

    def ref(lat, lon, p):
        # independent algorithm: classic interval halving (not bit math)
        lat_i, lon_i = [-90.0, 90.0], [-180.0, 180.0]
        bits, even = [], True
        while len(bits) < 5 * p:
            iv, v = (lon_i, lon) if even else (lat_i, lat)
            mid = (iv[0] + iv[1]) / 2
            if v >= mid:
                bits.append(1)
                iv[0] = mid
            else:
                bits.append(0)
                iv[1] = mid
            even = not even
        return "".join(
            GEOHASH_BASE32[
                sum(b << (4 - t) for t, b in enumerate(bits[5 * j : 5 * j + 5]))
            ]
            for j in range(p)
        )

    # the canonical worked example from Niemeyer's geohash
    assert ref(57.64911, 10.40744, 11) == "u4pruydqqvj"
    pts = [
        (57.64911, 10.40744), (0.0, 0.0), (-90.0, -180.0), (90.0, 180.0),
        (51.5, -0.13), (-33.86, 151.2), (37.77, -122.42), (45.0, 45.0),
    ]
    pdf = pd.DataFrame(pts, columns=["lat", "lon"])
    for p in (1, 2, 5, 11):
        got = (
            spark.createDataFrame(pdf)
            .select(geohash_key(F.col("lat"), F.col("lon"), p).alias("k"))
            .toPandas()["k"].tolist()
        )
        assert got == [ref(la, lo, p) for la, lo in pts], f"precision {p}"
    with pytest.raises(ValueError):
        geohash_key(F.lit(0.0), F.lit(0.0), 13)


def test_geohash_sql_parts_mirror_spark(spark):
    import duckdb

    from bitcoin_ledger_2es_spark.functions.geo import (
        geohash_key,
        geohash_sql_parts,
    )

    pts = [(57.64911, 10.40744), (0.0, 0.0), (-89.0, 179.0), (12.34, -56.78)]
    pdf = pd.DataFrame(pts, columns=["lat", "lon"])
    for p in (2, 6):
        got = (
            spark.createDataFrame(pdf)
            .select(geohash_key(F.col("lat"), F.col("lon"), p).alias("k"))
            .toPandas()["k"].tolist()
        )
        parts = geohash_sql_parts("lat", "lon", p)
        con = duckdb.connect()
        con.register("pts", pdf)
        exp = con.sql(
            f"WITH q AS (SELECT {parts['x']} AS x, {parts['y']} AS y FROM pts),"
            f" zt AS (SELECT ({parts['z']}) AS z FROM q)"
            f" SELECT {parts['key']} AS k FROM zt"
        ).df()["k"].tolist()
        assert got == exp, f"precision {p}"


def test_geo_centroid_and_bounds(spark):
    from bitcoin_ledger_2es_spark.functions.geo import (
        geo_bounds_agg,
        geo_centroid_agg,
    )

    rows = [("a", 10.0, 20.0), ("a", 30.0, -40.0), ("b", -5.0, 5.0)]
    df = spark.createDataFrame(rows, "g string, lat double, lon double")
    c = geo_centroid_agg(df, F.col("lat"), F.col("lon"), by="g").toPandas()
    c = c.set_index("g")
    assert c.loc["a", "centroid_lat"] == 20.0 and c.loc["a", "centroid_lon"] == -10.0
    assert c.loc["b", "doc_count"] == 1 and c.loc["b", "centroid_lon"] == 5.0
    b = geo_bounds_agg(df, F.col("lat"), F.col("lon"), by="g").toPandas()
    b = b.set_index("g")
    assert (b.loc["a", ["top", "bottom", "left", "right"]].tolist()
            == [30.0, 10.0, -40.0, 20.0])
    # global (no by): one row over everything
    g = geo_bounds_agg(df, F.col("lat"), F.col("lon")).toPandas()
    assert len(g) == 1 and g.loc[0, "doc_count"] == 3 and g.loc[0, "bottom"] == -5.0


def test_bucket_script_percentiles_and_extended_stats_bucket(spark):
    from bitcoin_ledger_2es_spark.operators.aggs import (
        bucket_script,
        extended_stats_bucket,
        percentiles_bucket,
    )

    buckets = spark.createDataFrame(
        [("a", 10, 2), ("b", 20, 4), ("c", 40, 5), ("d", 30, 3)],
        "key string, metric long, n long",
    )
    bs = bucket_script(
        buckets, F.col("metric") / F.col("n"), out="per_n"
    ).toPandas().set_index("key")
    assert bs.loc["b", "per_n"] == 5.0 and bs.loc["c", "per_n"] == 8.0
    pb = percentiles_bucket(buckets, "metric", [25.0, 50.0, 75.0]).toPandas().iloc[0]
    assert pb["p25"] == 17.5 and pb["p50"] == 25.0 and pb["p75"] == 32.5
    eb = extended_stats_bucket(buckets, "metric").toPandas().iloc[0]
    assert eb["count"] == 4 and eb["sum"] == 100.0 and eb["avg"] == 25.0
    # population variance: E[x^2] - E[x]^2 = (100+400+1600+900)/4 - 625
    assert eb["variance"] == pytest.approx(3000 / 4 - 625)


def test_min_max_sum_avg_bucket_and_moving_percentiles(spark):
    from bitcoin_ledger_2es_spark.operators.aggs import (
        avg_bucket,
        max_bucket,
        min_bucket,
        moving_percentiles,
        sum_bucket,
    )

    buckets = spark.createDataFrame(
        [("a", 10), ("b", 40), ("c", 40), ("d", 30)],
        "key string, metric long",
    )
    mx = max_bucket(buckets, "key", "metric").toPandas().iloc[0]
    assert mx["value"] == 40 and mx["keys"] == "b,c"  # ES keys: ALL ties
    mn = min_bucket(buckets, "key", "metric").toPandas().iloc[0]
    assert mn["value"] == 10 and mn["keys"] == "a"
    assert sum_bucket(buckets, "metric").toPandas().iloc[0]["value"] == 120
    assert avg_bucket(buckets, "metric").toPandas().iloc[0]["value"] == 30.0
    mp = (
        moving_percentiles(buckets, "key", "metric", window=3, percents=[50.0])
        .orderBy("key").toPandas()
    )
    # exclusive window [i-3, i): a -> empty(null), b -> {10}, c -> {10,40},
    # d -> {10,40,40} (interpolated p50 = 40)
    assert pd.isna(mp.loc[0, "mov_p50"])
    assert mp.loc[1, "mov_p50"] == 10.0
    assert mp.loc[2, "mov_p50"] == 25.0
    assert mp.loc[3, "mov_p50"] == 40.0


def test_date_range_ip_range_vw_histogram(spark):
    from pyspark.sql import functions as F

    from bitcoin_ledger_2es_spark.operators.aggs import (
        date_range_agg,
        ip_range_agg,
        parse_cidr,
        variable_width_histogram,
    )

    ev = spark.createDataFrame(
        [
            (i, f"2024-01-{(i % 28) + 1:02d} 12:00:00", f"10.{i % 200}.{i % 250}.{i // 250}", float(i))
            for i in range(100)
        ],
        "event_id long, ts string, ip string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    dr = date_range_agg(
        ev, "ts",
        [("early", None, "2024-01-10"), ("rest", "2024-01-10", None)],
        metrics={"m": lambda c: F.avg(F.when(c, F.col("value")))},
    ).toPandas()
    # days 1..9 inclusive (to-exclusive at the 10th)
    n_early = sum(1 for i in range(100) if (i % 28) + 1 < 10)
    assert dr[dr["key"] == "early"]["doc_count"].iloc[0] == n_early
    assert dr[dr["key"] == "rest"]["doc_count"].iloc[0] == 100 - n_early

    # CIDR parsing: /9 halves the second octet range under 10.x
    assert parse_cidr("10.0.0.0/9") == (10 << 24, (10 << 24) + (1 << 23))
    assert parse_cidr("10.100.0.0/32") == (
        (10 << 24) + (100 << 16), (10 << 24) + (100 << 16) + 1
    )
    ipr = ip_range_agg(
        ev, "ip",
        [("low", None, "10.50.0.0"), ("cidr", *parse_cidr("10.0.0.0/9"))],
    ).toPandas()
    n_low = sum(1 for i in range(100) if i % 200 < 50)
    n_cidr = sum(1 for i in range(100) if i % 200 < 128)
    assert ipr[ipr["key"] == "low"]["doc_count"].iloc[0] == n_low
    assert ipr[ipr["key"] == "cidr"]["doc_count"].iloc[0] == n_cidr

    vw = variable_width_histogram(ev, "value", buckets=4).toPandas()
    # equal-depth on 0..99: exact quartile boundaries -> 25 per bucket
    assert vw["bucket"].tolist() == [0, 1, 2, 3]
    assert vw["doc_count"].tolist() == [25, 25, 25, 25]
    # boundaries are the interpolated quartiles (24.75, 49.5, 74.25);
    # integer data -> first member of each bucket is the next integer
    assert vw["min"].tolist() == [0.0, 25.0, 50.0, 75.0]
    assert vw["max"].tolist() == [24.0, 49.0, 74.0, 99.0]


def test_composite_after_key_pagination(spark):
    from bitcoin_ledger_2es_spark.operators.aggs import composite_pages

    df = spark.createDataFrame(
        [(lang, src) for lang in ("de", "en", "fr") for src in ("a", "b")
         for _ in range(2)],
        "lang string, source string",
    )
    p1 = composite_pages(df, ["lang", "source"], size=3).toPandas()
    assert list(zip(p1["lang"], p1["source"])) == [
        ("de", "a"), ("de", "b"), ("en", "a")
    ]
    assert p1["doc_count"].tolist() == [2, 2, 2]
    after = (p1.iloc[-1]["lang"], p1.iloc[-1]["source"])  # the after_key
    p2 = composite_pages(df, ["lang", "source"], size=3, after=after).toPandas()
    assert list(zip(p2["lang"], p2["source"])) == [
        ("en", "b"), ("fr", "a"), ("fr", "b")
    ]
    # page 3 is empty; bad after arity raises
    assert len(composite_pages(df, ["lang", "source"], size=3,
                               after=("fr", "b")).toPandas()) == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        composite_pages(df, ["lang", "source"], after=("en",))


def test_frequent_item_sets_vs_bruteforce(spark):
    from itertools import combinations

    import numpy as np
    import pandas as pd

    from bitcoin_ledger_2es_spark.operators.aggs import frequent_item_sets

    rng = np.random.default_rng(5)
    rows = []
    for b in range(40):
        for it in rng.choice(list("abcdef"), size=rng.integers(1, 5), replace=False):
            rows.append((b, it))
            if rng.random() < 0.3:
                rows.append((b, it))  # duplicates must not inflate support
    pdf = pd.DataFrame(rows, columns=["basket", "item"])
    df = spark.createDataFrame(pdf)
    got = frequent_item_sets(
        df, "item", "basket", min_support=0.2, max_size=3, size=100
    ).toPandas()

    baskets = pdf.groupby("basket")["item"].agg(lambda s: frozenset(s))
    n = len(baskets)
    exp = {}
    for k in (1, 2, 3):
        for combo in combinations(sorted(set(pdf["item"])), k):
            c = sum(1 for bs in baskets if set(combo) <= bs)
            if c >= 0.2 * n:
                exp[",".join(combo)] = c
    got_map = dict(zip(got["key"], got["doc_count"]))
    assert got_map == exp and len(exp) > 6
    # support = doc_count / n exactly
    for _, r in got.iterrows():
        assert r["support"] == r["doc_count"] / n
    # unique total order (doc_count desc, key asc)
    order = sorted(got_map, key=lambda k2: (-got_map[k2], k2))
    assert got["key"].tolist() == order


def test_frequent_item_sets_max_size_bounds(spark):
    from bitcoin_ledger_2es_spark.operators.aggs import frequent_item_sets

    df = spark.createDataFrame([(1, "a"), (1, "b")], "basket long, item string")
    assert frequent_item_sets(df, "item", "basket", max_size=1).count() == 2
    import pytest as _pt

    with _pt.raises(ValueError, match="max_size"):
        frequent_item_sets(df, "item", "basket", max_size=4)


def test_frequent_item_sets_basket_skew_cap(spark):
    """Degenerate basket (10^3 frequent singletons in ONE basket): the
    max_basket_items guard must keep the level-2 self-join off it —
    completing under the cap, with drops observable via metrics_out —
    while singleton counts and uncapped-normal baskets are unaffected."""
    from bitcoin_ledger_2es_spark.operators.aggs import frequent_item_sets

    # basket 0: 1000 distinct items (all frequent at min_support<=0.5 with
    # 2 baskets); basket 1: 3 of those items -> a normal pair source
    rows = [(0, f"i{j:04d}") for j in range(1000)]
    rows += [(1, "i0001"), (1, "i0002"), (1, "i0003")]
    df = spark.createDataFrame(rows, "basket long, item string")

    metrics: dict = {}
    got = frequent_item_sets(
        df, "item", "basket", min_support=0.5, max_size=3, size=10_000,
        max_basket_items=100, metrics_out=metrics,
    ).toPandas()

    # the wide basket was dropped from pair generation, observably
    assert metrics == {
        "dropped_baskets": 1,
        "dropped_basket_item_rows": 1000,
    }
    # singletons unaffected: i0001..i0003 appear in 2/2 baskets
    singles = got[got["set_size"] == 1]
    assert len(singles) == 1000
    top = dict(zip(singles["key"], singles["doc_count"]))
    assert top["i0001"] == top["i0002"] == top["i0003"] == 2
    # no pair reaches support 0.5*2=1... pairs from basket 1 alone have
    # doc_count 1 >= floor 1 -> present; pairs involving ONLY basket 0
    # items are gone (capped), so exactly C(3,2)=3 pairs + 1 triple
    pairs = got[got["set_size"] == 2]
    assert sorted(pairs["key"]) == [
        "i0001,i0002", "i0001,i0003", "i0002,i0003"
    ]
    assert (pairs["doc_count"] == 1).all()
    triples = got[got["set_size"] == 3]
    assert triples["key"].tolist() == ["i0001,i0002,i0003"]

    # default cap (1024) leaves this corpus uncapped: metrics report zero
    m2: dict = {}
    frequent_item_sets(
        df, "item", "basket", min_support=0.5, max_size=2, size=5,
        metrics_out=m2,
    ).collect()
    assert m2 == {"dropped_baskets": 0, "dropped_basket_item_rows": 0}


# ---------------------------------------------------------------------------
# Round-5 additions: global / random_sampler / ip_prefix / children aggs


def test_global_agg(num_df):
    from bitcoin_ledger_2es_spark.operators.aggs import global_agg

    df, pdf = num_df
    got = global_agg(df, {"m": F.avg("v")}).toPandas()
    assert got["doc_count"].iloc[0] == len(pdf)
    assert abs(got["m"].iloc[0] - pdf["v"].mean()) < 1e-9


def test_random_sampler_deterministic(spark):
    from bitcoin_ledger_2es_spark.operators.aggs import random_sampler

    ids = spark.range(0, 4000).withColumnRenamed("id", "rid")
    got = random_sampler(ids, 0.25, "rid", seed=3).toPandas()["rid"]
    M32, K = 1 << 32, 2654435761

    def kh(i, seed):
        x = ((i % M32) + seed) % M32
        hi, lo = x // (1 << 16), x % (1 << 16)
        return ((hi * K % M32) * (1 << 16) + lo * K) % M32

    exp = [i for i in range(4000) if kh(i, 3) < 0.25 * M32]
    assert sorted(got.tolist()) == exp
    assert 0.15 < len(exp) / 4000 < 0.35
    with pytest.raises(ValueError, match="probability"):
        random_sampler(ids, 1.5, "rid")


def test_ip_prefix_agg(spark):
    from bitcoin_ledger_2es_spark.operators.aggs import ip_prefix_agg

    rows = [("10.0.0.1",), ("10.63.255.9",), ("10.64.0.0",),
            ("10.200.3.4",), ("192.168.1.1",)]
    df = spark.createDataFrame(rows, "ip string")
    got = ip_prefix_agg(df, "ip", 10).toPandas().set_index("key")
    assert got.loc["10.0.0.0/10", "doc_count"] == 2
    assert got.loc["10.64.0.0/10", "doc_count"] == 1
    assert got.loc["10.192.0.0/10", "doc_count"] == 1
    assert got.loc["192.128.0.0/10", "doc_count"] == 1
    # /32 = identity buckets; /0 = one bucket
    assert len(ip_prefix_agg(df, "ip", 32).toPandas()) == 5
    allb = ip_prefix_agg(df, "ip", 0).toPandas()
    assert len(allb) == 1 and allb["key"].iloc[0] == "0.0.0.0/0"
    with pytest.raises(ValueError, match="prefix_length"):
        ip_prefix_agg(df, "ip", 40)


def test_children_agg(spark):
    from bitcoin_ledger_2es_spark.operators.aggs import children_agg

    parents = spark.createDataFrame(
        [("c1",), ("c2",)], "conv_id string"
    )
    children = spark.createDataFrame(
        [("c1", 1.0), ("c1", 3.0), ("c2", 5.0), ("c3", 100.0)],
        "conv_id string, v double",
    )
    got = children_agg(
        parents, children, "conv_id", {"s": F.sum("v")}
    ).toPandas().set_index("conv_id")
    assert set(got.index) == {"c1", "c2"}  # c3 has no parent bucket
    assert got.loc["c1", "doc_count"] == 2 and got.loc["c1", "s"] == 4.0
    assert got.loc["c2", "doc_count"] == 1 and got.loc["c2", "s"] == 5.0


# ---- change_point (deterministic step-change reading) ---------------------


def test_change_point_detects_planted_step(spark):
    # 20 buckets: integer metric 100 for keys 1..12, 400 for 13..20 —
    # the step's right segment starts at key 13
    rows = [(k, 100 if k <= 12 else 400) for k in range(1, 21)]
    df = spark.createDataFrame(rows, "k int, v long")
    from bitcoin_ledger_2es_spark.operators.aggs import change_point

    got = change_point(df, "k", "v").toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r["type"] == "step_change" and r["key"] == 13
    # exact mirror of the documented statistic at the argmax split i=12
    import math

    lm, rm, n, i = 100.0, 400.0, 20, 12
    assert r["statistic"] == abs(lm - rm) * math.sqrt(i * (n - i) / n)
    assert r["left_mean"] == lm and r["right_mean"] == rm


def test_change_point_tie_breaks_to_smallest_split(spark):
    # symmetric series: stat(i) and stat(n-i) tie — the smaller i wins,
    # so the reported key is the right-segment start of the EARLIER split
    rows = [(1, 0), (2, 0), (3, 10), (4, 10), (5, 0), (6, 0)]
    df = spark.createDataFrame(rows, "k int, v long")
    from bitcoin_ledger_2es_spark.operators.aggs import change_point

    got = change_point(df, "k", "v").toPandas().iloc[0]
    assert got["type"] == "step_change" and got["key"] == 3


def test_change_point_short_series_indeterminable(spark):
    df = spark.createDataFrame([(1, 5), (2, 7), (3, 9)], "k int, v long")
    from bitcoin_ledger_2es_spark.operators.aggs import change_point

    got = change_point(df, "k", "v", min_seg=2).toPandas().iloc[0]
    assert got["type"] == "indeterminable"
    assert pd.isna(got["key"]) and pd.isna(got["statistic"])


def test_geo_line_orders_and_caps(spark):
    rows = [("a", 3, 10.0, 1.0), ("a", 1, 20.0, 2.0), ("a", 2, 30.0, 3.0),
            ("b", 9, 40.0, 4.0)]
    df = spark.createDataFrame(rows, "g string, ord long, lon double, lat double")
    from bitcoin_ledger_2es_spark.functions.geo import geo_line_agg

    got = geo_line_agg(
        df, F.col("lat"), F.col("lon"), F.col("ord"), F.col("ord"), by="g"
    ).orderBy("g").toPandas()
    a = got.iloc[0]
    assert a["doc_count"] == 3
    assert [(p["lon"], p["lat"]) for p in a["points"]] == \
        [(20.0, 2.0), (30.0, 3.0), (10.0, 1.0)]  # sort-order, lon-first
    capped = geo_line_agg(
        df, F.col("lat"), F.col("lon"), F.col("ord"), F.col("ord"),
        by="g", size=2,
    ).orderBy("g").toPandas().iloc[0]
    assert capped["doc_count"] == 2  # the FIRST size points by sort
    assert [(p["lon"], p["lat"]) for p in capped["points"]] == \
        [(20.0, 2.0), (30.0, 3.0)]
    with pytest.raises(ValueError, match="positive"):
        geo_line_agg(df, F.col("lat"), F.col("lon"), F.col("ord"),
                     F.col("ord"), size=0)


# ---------------------------------------------------------------------------
# nested / reverse_nested / parent aggs (session-4: the document-hierarchy
# agg family over array<struct> nested fields and join-field parents)


@pytest.fixture(scope="module")
def nested_df(spark):
    # 3 parents; children as array<struct<t,v>> (pinned array order)
    rows = [
        (1, [("a", 10), ("b", 20), ("a", 30)]),
        (2, [("b", 5)]),
        (3, [("a", 1), ("c", 7), ("c", 2)]),
    ]
    return spark.createDataFrame(
        [(pid, [{"t": t, "v": v} for t, v in kids]) for pid, kids in rows],
        "pid long, kids array<struct<t string, v long>>",
    )


def test_nested_agg_counts_children(nested_df):
    from bitcoin_ledger_2es_spark.operators.aggs import nested_agg

    got = {
        r["t"]: (r["doc_count"], r["sv"])
        for r in nested_agg(
            nested_df, "kids", by=["t"], metrics={"sv": F.sum("v")}
        ).collect()
    }
    # doc_count counts CHILD docs: a=3 (two in parent 1), b=2, c=2
    assert got == {"a": (3, 41), "b": (2, 25), "c": (2, 9)}


def test_nested_agg_unbucketed(nested_df):
    from bitcoin_ledger_2es_spark.operators.aggs import nested_agg

    row = nested_agg(nested_df, "kids").collect()[0]
    assert row["doc_count"] == 7  # total children, not 3 parents


def test_reverse_nested_counts_parents_once(nested_df):
    from bitcoin_ledger_2es_spark.operators.aggs import reverse_nested_agg

    got = {
        r["t"]: (r["doc_count"], r["sp"])
        for r in reverse_nested_agg(
            nested_df, "kids", parent_cols=["pid"], by=["t"],
            metrics={"sp": F.sum("pid")},
        ).collect()
    }
    # parent 1 has TWO 'a' children but counts once; sp sums parent ids
    assert got == {"a": (2, 4), "b": (2, 3), "c": (1, 3)}


def test_parent_agg_dedups_parents(spark):
    from bitcoin_ledger_2es_spark.operators.aggs import parent_agg

    parents = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 50)], "k long, bal long")
    children = spark.createDataFrame(
        [("hi", 1), ("hi", 1), ("hi", 2), ("lo", 2), ("lo", 3)],
        "pri string, k long")
    got = {
        r["pri"]: (r["doc_count"], r["b"])
        for r in parent_agg(
            children, parents, "k", by=["pri"],
            metrics={"b": F.sum("bal")},
        ).collect()
    }
    # 'hi' has children under parents {1, 2} — parent 1 twice, counted once
    assert got == {"hi": (2, 300), "lo": (2, 250)}


def test_bucket_correlation_exact(spark):
    from bitcoin_ledger_2es_spark.operators.aggs import bucket_correlation

    # perfectly linear counts -> correlation exactly 1.0 in f64
    df = spark.createDataFrame(
        [(i, 10 + 2 * i) for i in range(8)], "i long, cnt long")
    row = bucket_correlation(df, F.col("cnt"), F.col("i")).collect()[0]
    assert row["n"] == 8
    assert row["correlation"] == pytest.approx(1.0, abs=1e-12)
    # anti-correlated
    df2 = spark.createDataFrame(
        [(i, 100 - 3 * i) for i in range(8)], "i long, cnt long")
    assert bucket_correlation(df2, F.col("cnt"), F.col("i")).collect()[0][
        "correlation"] == pytest.approx(-1.0, abs=1e-12)
    # zero-variance indicator -> null (guard, not NaN)
    df3 = spark.createDataFrame([(1, 5), (2, 5)], "i long, cnt long")
    assert bucket_correlation(df3, F.col("cnt"), F.col("i")).collect()[0][
        "correlation"] is None


def test_bucket_count_ks_test_uniform_vs_spike(spark):
    from bitcoin_ledger_2es_spark.operators.aggs import bucket_count_ks_test

    # exactly uniform counts: ecdf matches i/n at every step -> D = 0
    uni = spark.createDataFrame(
        [(i, 10) for i in range(5)], "k long, cnt long")
    row = bucket_count_ks_test(uni, "k", "cnt").collect()[0]
    assert row["n_buckets"] == 5 and row["total"] == 50
    assert row["statistic"] == 0.0
    # all mass in the first bucket: D = |1 - 1/5| = 0.8
    spike = spark.createDataFrame(
        [(0, 100), (1, 0), (2, 0), (3, 0), (4, 0)], "k long, cnt long")
    assert bucket_count_ks_test(spike, "k", "cnt").collect()[0][
        "statistic"] == pytest.approx(0.8, abs=1e-15)


def test_significance_heuristics(spark, searcher, tiny_df):
    import math

    from bitcoin_ledger_2es_spark.functions.analyze import tokenize_series
    from bitcoin_ledger_2es_spark.operators.aggs import significant_text
    from bitcoin_ledger_2es_spark.plans.build import tokenized_documents

    docs, _ = tokenized_documents(tiny_df, CFG)
    corpus = docs.select("doc_id", "text")
    fg = searcher.match_docs("w0001", mode="and")
    pdf = corpus.toPandas()
    fg_ids = set(r.doc_id for r in fg.select("doc_id").collect())
    toks = tokenize_series(pdf["text"], CFG)
    bg_df, fg_df = {}, {}
    for doc_id, ts in zip(pdf["doc_id"], toks):
        for t in set(ts):
            bg_df[t] = bg_df.get(t, 0) + 1
            if doc_id in fg_ids:
                fg_df[t] = fg_df.get(t, 0) + 1
    n_bg, n_fg = len(pdf), len(fg_ids)

    def table(t, f):
        a = float(f)
        b = float(n_fg) - a
        c = float(bg_df[t]) - a
        d = float(n_bg - n_fg) - c
        return a, b, c, d

    def chi2(t, f):
        a, b, c, d = table(t, f)
        den = (a + b) * (c + d) * (a + c) * (b + d)
        return n_bg * (a * d - b * c) ** 2 / den if den > 0 else None

    def mi(t, f):
        a, b, c, d = table(t, f)
        n = float(n_bg)
        tot = 0.0
        for joint, mx, my in ((a, a + b, a + c), (b, a + b, b + d),
                              (c, c + d, a + c), (d, c + d, b + d)):
            if joint > 0:
                p = joint / n
                tot += p * math.log2(p / ((mx / n) * (my / n)))
        return tot

    for name, fn in (("chi_square", chi2), ("mutual_information", mi),
                     ("percentage", lambda t, f: f / bg_df[t])):
        got = significant_text(
            fg, corpus, cfg=CFG, size=8, min_doc_count=3, heuristic=name,
        ).toPandas()
        rows = sorted(
            ((t, fn(t, f)) for t, f in fg_df.items() if f >= 3),
            key=lambda r: (-(r[1] if r[1] is not None else float("-inf")), r[0]),
        )[:8]
        assert got["term"].tolist() == [r[0] for r in rows], name
        assert got[name].tolist() == pytest.approx(
            [r[1] for r in rows], rel=1e-12), name
    with pytest.raises(ValueError, match="heuristic"):
        significant_text(fg, corpus, cfg=CFG, heuristic="gnd")


def test_geo_grid_filter_selects_exactly_its_bucket(spark):
    from bitcoin_ledger_2es_spark.functions.geo import (
        geo_grid_filter,
        geohash_key,
        geotile_key,
    )

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "lat": rng.integers(-80, 81, 300).astype(float),
        "lon": rng.integers(-179, 180, 300).astype(float),
    })
    df = spark.createDataFrame(pdf)
    # take the largest geotile bucket, then filter back with the query
    top = (df.groupBy(geotile_key(F.col("lat"), F.col("lon"), 4)
                      .alias("key"))
           .count().orderBy(F.desc("count"), F.asc("key")).first())
    got = df.filter(geo_grid_filter(
        F.col("lat"), F.col("lon"), geotile=top["key"])).count()
    assert got == top["count"] > 0
    # same round-trip for a geohash cell
    toph = (df.groupBy(geohash_key(F.col("lat"), F.col("lon"), 2)
                       .alias("key"))
            .count().orderBy(F.desc("count"), F.asc("key")).first())
    goth = df.filter(geo_grid_filter(
        F.col("lat"), F.col("lon"), geohash=toph["key"])).count()
    assert goth == toph["count"] > 0
    import pytest as _pt
    with _pt.raises(ValueError, match="exactly one"):
        geo_grid_filter(F.col("lat"), F.col("lon"))
    with _pt.raises(ValueError, match="z/x/y"):
        geo_grid_filter(F.col("lat"), F.col("lon"), geotile="3/1")
    with _pt.raises(ValueError, match="invalid geohash"):
        geo_grid_filter(F.col("lat"), F.col("lon"), geohash="ab")  # 'a' not in base32
