import pandas as pd

from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.functions.analyze import (
    analyze_query,
    tokenize_col,
    tokenize_series,
    tokenize_sql_builtin,
)
from pyspark.sql import functions as F


def test_tokenize_series_golden():
    s = pd.Series(["Hello, World!  foo_bar 42", "", None, "a  b\tc\nd"])
    out = tokenize_series(s, DEFAULT).tolist()
    assert out == [["hello", "world", "foo_bar", "42"], [], [], ["a", "b", "c", "d"]]


def test_query_analyzer_matches_index_analyzer():
    texts = ["Hello, World! foo_bar 42", "", "a  b\tc"]
    assert [analyze_query(t) for t in texts] == tokenize_series(pd.Series(texts)).tolist()


def test_udf_matches_builtin_and_pandas(spark, tiny_df):
    df = tiny_df.limit(500).select(
        "text",
        tokenize_col(F.col("text")).alias("udf_toks"),
        tokenize_sql_builtin(F.col("text")).alias("jvm_toks"),
    )
    pdf = df.toPandas()
    expected = tokenize_series(pdf["text"]).tolist()
    assert pdf["udf_toks"].apply(list).tolist() == expected
    assert pdf["jvm_toks"].apply(list).tolist() == expected


def test_four_tokenizer_impls_agree(spark):
    """The analyzer exists in four engines (pandas UDF, python re for
    queries, Catalyst regexp for doc_len, Arrow RE2 split in the SPIMI
    kernel). They must produce identical token streams — including on
    unicode and edge inputs — or scores drift."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from bitcoin_ledger_2es_spark.config import DEFAULT

    texts = [
        "Hello, World! foo_bar 42",
        "",
        "  leading and trailing  ",
        "tabs\tand\nnewlines",
        "café résumé über",  # accented letters are separators (ASCII analyzer)
        "日本語 text 123",  # CJK is separated out
        "UPPER lower MiXeD_case",
        "a--b__c  1.5e3",
    ]
    expected = [tokenize_series(pd.Series([t]), DEFAULT).iloc[0] for t in texts]

    # python re (query path)
    assert [analyze_query(t, DEFAULT) for t in texts] == expected

    # Catalyst regexp (doc_len path)
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    jvm = [list(r[0]) for r in df.select(tokenize_sql_builtin(F.col("text"), DEFAULT)).collect()]
    assert jvm == expected

    # Arrow RE2 split (SPIMI kernel path)
    arr = pa.array(texts, type=pa.string())
    toks = pc.split_pattern_regex(pc.utf8_lower(pc.fill_null(arr, "")), DEFAULT.separator_pattern)
    arrow = [[t for t in row if t != ""] for row in toks.to_pylist()]
    assert arrow == expected


def test_analyze_offsets_matches_driver_api(spark):
    """Distributed _analyze (analyze_offsets, JVM prefix-sum offsets)
    must agree row-for-row with the driver-side analyze_tokens on every
    edge shape: leading/trailing separators, adjacent tokens, empty,
    NULL, multi-char separators, token at string start and end."""
    from bitcoin_ledger_2es_spark.functions.analyze import (
        analyze_offsets,
        analyze_tokens,
    )

    texts = [
        "Hello, World!  foo_bar 42",
        "",
        None,
        "  leading and trailing  ",
        "tabs\tand\nnewlines",
        "UPPER lower MiXeD_case",
        "a--b__c  1.5e3",
        "endsontoken",
        ",,punct only!!",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = (
        analyze_offsets(df, "doc_id", "text", DEFAULT)
        .toPandas()
        .sort_values(["doc_id", "position"])
    )
    exp = [
        (i, tok["position"], tok["token"], tok["start_offset"], tok["end_offset"])
        for i, t in enumerate(texts)
        for tok in analyze_tokens(t, DEFAULT)
    ]
    assert [tuple(r) for r in got.itertuples(index=False)] == exp


def test_doc_len_and_empty_turns(tiny_pdf):
    toks = tokenize_series(tiny_pdf["text"])
    lens = toks.str.len()
    assert (lens == tiny_pdf["text"].str.split().str.len().fillna(0)).all()
    assert (lens == 0).sum() > 0  # ~2% empty turns exist
