"""Percolate (reverse search) vs a pandas twin, plus the broadcast-join
plan shape."""

import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.functions.analyze import analyze_query, tokenize_series
from bitcoin_ledger_2es_spark.operators.percolate import analyzed_queries, percolate

CFG = DEFAULT

QUERIES = [
    (0, "w0001 w0002", "and", 0),        # both terms required
    (1, "w0001 w0005 w0009", "or", 2),   # any 2 of 3
    (2, "w0003", "or", 1),               # single term
    (3, "w0001 w0001 W0002!", "and", 0), # analyzer dedup + normalization
    (4, "", "or", 1),                    # empty after analysis -> dropped
    (5, "w0001 w0005", "or", 3),         # msm > terms: unsatisfiable -> dropped
]


@pytest.fixture(scope="module")
def docs(spark, tiny_df):
    from bitcoin_ledger_2es_spark.plans.build import tokenized_documents

    d, _ = tokenized_documents(tiny_df, CFG)
    return d.select("doc_id", "text").cache()


def _pandas_twin(docs_pdf):
    out = set()
    toks = tokenize_series(docs_pdf["text"], CFG)
    for doc_id, ts in zip(docs_pdf["doc_id"], toks):
        present = set(ts)
        for qid, text, mode, msm in QUERIES:
            terms = set(analyze_query(text, CFG))
            if not terms:
                continue
            # lockstep with analyzed_queries: msm above the distinct-term
            # count is unsatisfiable and matches nothing (ES msm contract)
            if mode == "and":
                need = len(terms)
            else:
                need = max(1, msm)
                if need > len(terms):
                    continue
            hit = len(terms & present)
            if hit >= need:
                out.add((int(doc_id), qid, hit))
    return out


def test_percolate_matches_pandas(spark, docs):
    q = analyzed_queries(spark, QUERIES, CFG)
    assert q.filter(F.col("query_id") == 4).count() == 0  # empty query dropped
    assert q.filter(F.col("query_id") == 5).count() == 0  # unsatisfiable msm dropped
    got = {
        (r["doc_id"], r["query_id"], r["n_matched"])
        for r in percolate(docs, q, cfg=CFG).collect()
    }
    exp = _pandas_twin(docs.toPandas())
    assert got == exp and got


def test_percolate_and_requires_all(spark, docs):
    q = analyzed_queries(spark, [(7, "w0001 w0002", "and", 0)], CFG)
    got = percolate(docs, q, cfg=CFG)
    assert got.filter(F.col("n_matched") < 2).count() == 0


def test_percolate_broadcasts_queries(spark, docs):
    q = analyzed_queries(spark, QUERIES, CFG)
    plan = percolate(docs, q, cfg=CFG)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
