"""_rank_eval metrics vs a pandas twin over real engine results."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.functions.rank_eval import rank_eval

CFG = DEFAULT.with_(docs_per_shard=128, block_size=32)
K = 10


@pytest.fixture(scope="module")
def searcher(spark, tiny_df):
    return BM25Searcher(build_index(tiny_df, CFG))


@pytest.fixture(scope="module")
def results(spark, searcher):
    import pandas as pd

    reqs = pd.DataFrame(
        {"query_id": [0, 1], "query_text": ["w0001 w0005", "w0003"],
         "k": [K, K], "mode": ["or", "or"]}
    )
    return searcher.top_k_batch(reqs).select("query_id", "rank", "doc_id").cache()


@pytest.fixture(scope="module")
def judgments(spark, results):
    # deterministic synthetic pool: every other retrieved doc relevant
    # (rating doc_id % 3), plus two judged-but-not-retrieved docs
    rows = [
        (int(r["query_id"]), int(r["doc_id"]), int(r["doc_id"]) % 3)
        for r in results.collect()
    ] + [(0, 999999, 3), (1, 999998, 2)]
    return spark.createDataFrame(rows, "query_id long, doc_id long, rating int")


def test_rank_eval_matches_pandas(spark, results, judgments):
    got = {
        r["query_id"]: r
        for r in rank_eval(results, judgments, k=K, relevant_min=1).collect()
    }
    res = results.toPandas()
    jd = {(r["query_id"], r["doc_id"]): r["rating"] for r in judgments.collect()}
    for qid in (0, 1):
        rr = res[res.query_id == qid].sort_values("rank")
        ratings = [float(jd.get((qid, d), 0)) for d in rr.doc_id]
        rel = [x >= 1 for x in ratings]
        precision = sum(rel) / len(ratings)
        mrr = next((1.0 / (i + 1) for i, x in enumerate(rel) if x), 0.0)
        dcg = sum(
            (2.0 ** x - 1.0) / math.log2(i + 2) for i, x in enumerate(ratings)
        )
        pool = sorted(
            [(v, d) for (q, d), v in jd.items() if q == qid and v > 0],
            key=lambda t: (-t[0], t[1]),
        )[:K]
        idcg = sum(
            (2.0 ** v - 1.0) / math.log2(i + 2) for i, (v, _) in enumerate(pool)
        )
        g = got[qid]
        assert g["precision"] == pytest.approx(precision, rel=1e-12)
        assert g["reciprocal_rank"] == pytest.approx(mrr, rel=1e-12)
        assert g["dcg"] == pytest.approx(dcg, rel=1e-12)
        assert g["idcg"] == pytest.approx(idcg, rel=1e-12)
        assert g["ndcg"] == pytest.approx(dcg / idcg if idcg else 0.0, rel=1e-12)


def test_rank_eval_no_relevant(spark, results):
    empty_j = spark.createDataFrame([], "query_id long, doc_id long, rating int")
    out = rank_eval(results, empty_j, k=K).toPandas()
    assert (out["precision"] == 0).all()
    assert (out["reciprocal_rank"] == 0).all()
    assert (out["ndcg"] == 0).all()
