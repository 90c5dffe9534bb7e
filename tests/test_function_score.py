"""ES function_score surface: decay closed forms, field_value_factor
modifiers, deterministic random_score, boost/score mode algebra, and the
engine-level BM25Searcher.function_score re-ranking."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark.functions.function_score import (
    apply_boost_mode,
    combine_functions,
    decay_col,
    field_value_factor_col,
    random_score_col,
)


@pytest.fixture(scope="module")
def vals(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(9), "x": [0, 100, 300, 400, 500, 700, 900, 1200, 2000]})
    )


def _col(df, c):
    return {int(r["doc_id"]): r["v"] for r in df.select("doc_id", c.alias("v")).collect()}


def test_decay_anchor_points(vals):
    """Every decay kind equals 1 inside offset of origin and exactly
    `decay` at distance scale (the ES-defined anchors)."""
    for kind in ("gauss", "exp", "linear"):
        got = _col(vals, decay_col(kind, F.col("x"), origin=500, scale=400, decay=0.3))
        assert got[4] == pytest.approx(1.0)  # x=500 == origin
        assert got[6] == pytest.approx(0.3)  # |900-500| == scale
        assert got[2] == got[5]  # symmetric around origin
    off = _col(vals, decay_col("gauss", F.col("x"), origin=500, scale=400,
                               offset=100, decay=0.3))
    assert off[3] == off[4] == pytest.approx(1.0)  # within offset -> 1
    lin = _col(vals, decay_col("linear", F.col("x"), origin=500, scale=400, decay=0.5))
    assert lin[8] == 0.0  # beyond the span -> hard 0 (gauss/exp never reach 0)


def test_decay_closed_forms(vals):
    got = _col(vals, decay_col("exp", F.col("x"), origin=0, scale=200, decay=0.5))
    for d, v in got.items():
        x = [0, 100, 300, 400, 500, 700, 900, 1200, 2000][d]
        assert v == pytest.approx(math.exp(-x * math.log(2) / 200), rel=1e-12)


def test_field_value_factor_modifiers(vals):
    got = _col(vals, field_value_factor_col(F.col("x"), factor=0.1, modifier="ln1p"))
    assert got[4] == pytest.approx(math.log1p(50.0), rel=1e-12)
    sq = _col(vals, field_value_factor_col(F.col("x"), modifier="square"))
    assert sq[2] == pytest.approx(90000.0)
    with pytest.raises(ValueError):
        field_value_factor_col(F.col("x"), modifier="bogus")


def test_random_score_deterministic_uniformish(spark):
    ids = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    r1 = ids.select("doc_id", random_score_col(F.col("doc_id"), seed=3).alias("r")).toPandas()
    r2 = ids.select("doc_id", random_score_col(F.col("doc_id"), seed=3).alias("r")).toPandas()
    pd.testing.assert_frame_equal(r1, r2)  # deterministic
    assert ((r1["r"] >= 0) & (r1["r"] < 1)).all()
    assert 0.4 < r1["r"].mean() < 0.6  # roughly uniform
    r3 = ids.select(random_score_col(F.col("doc_id"), seed=4).alias("r")).toPandas()
    assert not np.array_equal(r1["r"].to_numpy(), r3["r"].to_numpy())  # seed matters
    # matches the arbitrary-precision reference (same Knuth hash as splits)
    for d in (0, 17, 2**40 + 5):
        expect = (((d + 3) * 2654435761) % (1 << 32)) / float(1 << 32)
        got = (
            spark.createDataFrame(pd.DataFrame({"doc_id": pd.Series([d], dtype="int64")}))
            .select(random_score_col(F.col("doc_id"), seed=3).alias("r"))
            .collect()[0]["r"]
        )
        assert got == expect, d


def test_mode_algebra(vals):
    a = F.lit(2.0)
    b = F.lit(0.5)
    q = F.lit(3.0)
    pairs = {
        "multiply": 1.0, "sum": 2.5, "avg": 1.25, "max": 2.0, "min": 0.5, "first": 2.0,
    }
    for mode, expect in pairs.items():
        got = vals.select(combine_functions([a, b], mode).alias("v")).first()["v"]
        assert got == pytest.approx(expect), mode
    boosts = {
        "multiply": 6.0, "sum": 5.0, "avg": 2.5, "replace": 2.0, "max": 3.0, "min": 2.0,
    }
    for mode, expect in boosts.items():
        got = vals.select(apply_boost_mode(q, a, mode).alias("v")).first()["v"]
        assert got == pytest.approx(expect), mode
    with pytest.raises(ValueError):
        combine_functions([a], "bogus")
    with pytest.raises(ValueError):
        apply_boost_mode(q, a, "bogus")


def test_engine_function_score_reranks(spark, tiny_df):
    """BM25Searcher.function_score: final_score follows the declared
    algebra over the base hits, rank is (final desc, doc_id asc)."""
    from bitcoin_ledger_2es_spark import BM25Searcher, build_index
    from bitcoin_ledger_2es_spark.config import DEFAULT

    ix = build_index(tiny_df, DEFAULT.with_(docs_per_shard=256, block_size=32))
    s = BM25Searcher(ix)
    fns = [
        decay_col("gauss", F.col("turn_idx"), origin=0, scale=20, decay=0.5),
        field_value_factor_col(F.col("doc_id"), factor=1e-6, modifier="ln1p"),
    ]
    out = s.function_score("w0000 w0005", fns, k=15, window=40,
                           boost_mode="sum", score_mode="max").toPandas()
    base = s.top_k("w0000 w0005", k=40, with_meta=True).toPandas()
    m = base.merge(out, on="doc_id", suffixes=("_b", ""))
    g = np.exp(-(m["turn_idx_b"].to_numpy(float) ** 2) * (math.log(2) / 400))
    fv = np.log1p(m["doc_id"].to_numpy(float) * 1e-6)
    expect = m["score_b"].astype(float).to_numpy() + np.maximum(g, fv)
    np.testing.assert_allclose(m["final_score"].to_numpy(), expect, rtol=1e-6)
    # ranks are the final_score ordering with doc_id tiebreak
    srt = out.sort_values(["final_score", "doc_id"], ascending=[False, True])
    assert srt["rank"].tolist() == sorted(out["rank"].tolist())


def test_rank_feature_functions(spark):
    import pandas as pd

    from bitcoin_ledger_2es_spark.functions.function_score import (
        distance_feature_col,
        rank_feature_col,
    )

    pdf = pd.DataFrame({"x": [0.0, 10.0, 300.0, 1200.0, None, -5.0]})
    df = spark.createDataFrame(pdf)
    got = df.select(
        rank_feature_col(F.col("x"), "saturation", pivot=300.0, boost=2.0).alias("sat"),
        rank_feature_col(F.col("x"), "log", scaling_factor=1.0).alias("lg"),
        rank_feature_col(F.col("x"), "sigmoid", pivot=10.0, exponent=2.0).alias("sg"),
        distance_feature_col(F.col("x"), origin=300.0, pivot=100.0, boost=3.0).alias("dist"),
    ).toPandas()
    x = pdf["x"].fillna(0.0).clip(lower=0.0).to_numpy()
    np.testing.assert_allclose(got["sat"], 2.0 * x / (x + 300.0), rtol=1e-12)
    np.testing.assert_allclose(got["lg"], np.log(1.0 + x), rtol=1e-12)
    np.testing.assert_allclose(got["sg"], x**2 / (x**2 + 100.0), rtol=1e-12)
    # distance_feature: null field -> 0, boost/2 exactly at pivot distance
    d = got["dist"].to_numpy()
    assert d[4] == 0.0
    xs = pdf["x"].to_numpy(float)
    exp = 3.0 * 100.0 / (100.0 + np.abs(xs - 300.0))
    np.testing.assert_allclose(d[[0, 1, 2, 3, 5]], exp[[0, 1, 2, 3, 5]], rtol=1e-12)
    # saturation at the pivot is exactly boost/2
    assert got["sat"][2] == pytest.approx(1.0)
