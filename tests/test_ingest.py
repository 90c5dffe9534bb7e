"""ES ingest pipelines (functions/ingest.py): processor lowering vs
hand-written Spark/pandas, the conditional (`if`) contract, error
discipline, and composition into build_index."""

import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark.functions.ingest import (
    IngestError,
    apply_pipeline,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "  GET /index.html 200  ", "alice", "2024-03-01T10:00:00"),
        (2, "POST /api/v1 503", "BOB", "2024-03-02T11:30:00"),
        (3, "not a log line", None, "2024-03-03T12:00:00"),
    ]
    return spark.createDataFrame(rows, "id long, line string, user string, when string")


def test_set_rename_remove_case_trim(docs):
    out = apply_pipeline(docs, [
        {"trim": {"field": "line"}},
        {"set": {"field": "source", "value": "cdn"}},
        {"set": {"field": "user", "value": "anon", "override": False}},
        {"lowercase": {"field": "user"}},
        {"rename": {"field": "when", "target_field": "ts_raw"}},
    ]).toPandas().set_index("id")
    assert out.loc[1, "line"] == "GET /index.html 200"
    assert set(out["source"]) == {"cdn"}
    assert out.loc[2, "user"] == "bob"
    assert out.loc[3, "user"] == "anon"   # override=False fills nulls only
    assert "when" not in out.columns and "ts_raw" in out.columns
    dropped = apply_pipeline(docs, [{"remove": {"fields": ["line", "user"]}}])
    assert set(dropped.columns) == {"id", "when"}


def test_gsub_split_join_convert(docs):
    out = apply_pipeline(docs, [
        {"gsub": {"field": "line", "pattern": "/[a-z.]+",
                  "replacement": "/_", "target_field": "redacted"}},
        {"split": {"field": "line", "separator": " +",
                   "target_field": "parts"}},
        {"join": {"field": "parts", "separator": "|",
                  "target_field": "joined"}},
        {"convert": {"field": "id", "type": "string",
                     "target_field": "id_s"}},
    ]).toPandas().set_index("id")
    assert out.loc[2, "redacted"] == "POST /_/_1 503"  # digit outside [a-z.]
    assert out.loc[2, "joined"] == "POST|/api/v1|503"
    assert out.loc[2, "id_s"] == "2"
    # convert on a bad value -> null (try_cast; ES fails the doc)
    bad = apply_pipeline(docs, [
        {"convert": {"field": "line", "type": "long",
                     "target_field": "n"}}]).toPandas()
    assert bad["n"].isna().all()


def test_grok_dissect_date_script(docs):
    out = apply_pipeline(docs, [
        {"grok": {"field": "line",
                  "patterns": ["%{WORD:method} %{NOTSPACE:path}"
                               " %{INT:status:int}"]}},
        {"date": {"field": "when", "formats": ["ISO8601"]}},
        {"script": {"source": "status >= 500",
                    "target_field": "is_error"}},
    ]).toPandas().set_index("id")
    assert out.loc[2, "method"] == "POST" and out.loc[2, "status"] == 503
    assert out.loc[3, "method"] is None  # non-match -> nulls, never fail
    assert str(out.loc[1, "@timestamp"]).startswith("2024-03-01 10:00:00")
    assert bool(out.loc[2, "is_error"]) is True
    d2 = apply_pipeline(docs, [
        {"dissect": {"field": "line", "pattern": "%{m} %{p} %{s}"}},
    ]).toPandas().set_index("id")
    assert d2.loc[2, "p"] == "/api/v1"


def test_if_condition_keeps_prior_values(docs):
    out = apply_pipeline(docs, [
        {"uppercase": {"field": "line", "if": "id = 2"}},
    ]).toPandas().set_index("id")
    assert out.loc[2, "line"] == "POST /API/V1 503"
    assert out.loc[3, "line"] == "not a log line"  # untouched row
    # a conditional set on a NEW column yields null where false
    out2 = apply_pipeline(docs, [
        {"set": {"field": "flag", "value": "y", "if": "id = 1"}},
    ]).toPandas().set_index("id")
    assert out2.loc[1, "flag"] == "y" and out2.loc[2, "flag"] is None


def test_error_discipline(docs):
    with pytest.raises(IngestError, match="unsupported ingest processor"):
        apply_pipeline(docs, [{"geoip": {"field": "line"}}])
    with pytest.raises(IngestError, match="on_failure"):
        apply_pipeline(docs, [{"trim": {"field": "line", "on_failure": []}}])
    with pytest.raises(IngestError, match="already exists"):
        apply_pipeline(docs, [{"rename": {"field": "line",
                                          "target_field": "user"}}])
    with pytest.raises(IngestError, match="unknown field"):
        apply_pipeline(docs, [{"rename": {"field": "nope",
                                          "target_field": "x"}}])
    with pytest.raises(IngestError, match="fail processor: stop"):
        apply_pipeline(docs, [{"fail": {"message": "stop"}}])
    with pytest.raises(IngestError, match="single-key"):
        apply_pipeline(docs, [{"a": {}, "b": {}}])


def test_pipeline_adds_no_exchange(docs):
    out = apply_pipeline(docs, [
        {"trim": {"field": "line"}},
        {"gsub": {"field": "line", "pattern": "\\d+", "replacement": "#"}},
        {"script": {"source": "length(line)", "target_field": "n"}},
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure per-row codegen


def test_composes_into_build(spark):
    from bitcoin_ledger_2es_spark import BM25Searcher, build_index
    from bitcoin_ledger_2es_spark.config import DEFAULT
    from bitcoin_ledger_2es_spark.sources.synth import gen_transcripts

    df = gen_transcripts(spark, 30)
    piped = apply_pipeline(df, [
        {"gsub": {"field": "text", "pattern": "w0001", "replacement": "w9999"}},
    ])
    s = BM25Searcher(build_index(
        piped, DEFAULT.with_(docs_per_shard=128, block_size=32)))
    assert s.top_k("w9999", k=5, with_meta=False).count() > 0
    assert s.top_k("w0001", k=5, with_meta=False).count() == 0
