"""ES ``wrapper`` query: base64-encoded JSON DSL dispatched onto the
engine's own surfaces — results must be IDENTICAL to calling the target
method directly, and anything outside the documented subset raises."""

import base64
import json

import pandas as pd
import pytest

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT

CFG = DEFAULT.with_(
    docs_per_shard=256, block_size=32, index_rollups=False,
    store_positions=True,
)


@pytest.fixture(scope="module")
def s(spark, tiny_df):
    return BM25Searcher(build_index(tiny_df, CFG))


def _b64(obj) -> str:
    return base64.b64encode(json.dumps(obj).encode()).decode()


def _same(a, b):
    pa, pb = a.toPandas(), b.toPandas()
    pd.testing.assert_frame_equal(
        pa.reset_index(drop=True), pb.reset_index(drop=True)
    )


def test_wrapper_dispatch_identical(s):
    _same(
        s.wrapper_query(_b64({"match": {"text": "w0000 w0002"}}), k=12),
        s.top_k("w0000 w0002", k=12),
    )
    _same(
        s.wrapper_query(_b64({"match": {"text": {
            "query": "w0000 w0002", "operator": "AND"}}}), k=12),
        s.top_k("w0000 w0002", k=12, mode="and"),
    )
    _same(
        s.wrapper_query(_b64({"term": {"text": {"value": "w0005"}}}), k=7),
        s.term_query("w0005", k=7),
    )
    _same(
        s.wrapper_query(_b64({"match_phrase": {"text": {
            "query": "w0000 w0001", "slop": 1}}}), k=9),
        s.phrase_query("w0000 w0001", k=9, slop=1),
    )
    _same(
        s.wrapper_query(_b64({"query_string": {
            "query": '+w0000 -w0009 "w0001 w0002"',
            "default_operator": "AND"}}), k=10),
        s.query_string('+w0000 -w0009 "w0001 w0002"', k=10,
                       default_operator="and"),
    )
    _same(
        s.wrapper_query(_b64({"bool": {
            "must": "w0000", "should": "w0003 w0004",
            "must_not": "w0009"}}), k=10),
        s.bool_query(must="w0000", should="w0003 w0004",
                     must_not="w0009", k=10),
    )


def test_wrapper_rejects_garbage(s):
    with pytest.raises(ValueError, match="base64"):
        s.wrapper_query("not/base64!!")
    with pytest.raises(ValueError, match="single-key"):
        s.wrapper_query(_b64({"match": {}, "term": {}}))
    with pytest.raises(ValueError, match="unsupported query type"):
        s.wrapper_query(_b64({"knn": {"field": "v"}}))
    with pytest.raises(ValueError, match="exactly one field"):
        s.wrapper_query(_b64({"match": {"title": "x"}}))
    with pytest.raises(ValueError, match="unsupported keys"):
        s.wrapper_query(_b64({"bool": {"filter": "x"}}))
