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


def test_spimi_lut_tokenizer_equals_regex_split():
    """The SPIMI kernel's byte-LUT + whitespace-split fast path must
    produce the exact kept-token streams of the RE2 separator split for
    the pinned [a-z0-9_]+ analyzer — including multi-byte UTF-8 (every
    byte of which is a separator byte), ASCII-folding lowercases like
    the Kelvin sign, empties, and whitespace-only strings."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from bitcoin_ledger_2es_spark.operators.postings import _TOKEN_LUT

    texts = [
        "Hello, World_42!",
        "",
        "   ",
        "a\tb\nc\r\nd",
        "héllo wörld",            # accents: separator bytes mid-token
        "Knife",              # KELVIN SIGN lowercases to ascii 'k'
        "emoji 🎉 split",
        "__under__score__",
        "ALL CAPS 123",
        "日本語テスト mixed ascii",
        "trailing space ",
        " leading",
        "a" * 5000 + " tail",
    ]
    arr = pa.array(texts, type=pa.large_string())
    low = pc.utf8_lower(pc.fill_null(arr, ""))
    if isinstance(low, pa.ChunkedArray):
        low = low.combine_chunks()
    ref = pc.split_pattern_regex(low, r"[^a-z0-9_]+")

    assert low.offset == 0
    bufs = low.buffers()
    data = np.frombuffer(bufs[2], dtype=np.uint8, count=len(bufs[2]))
    cleaned = _TOKEN_LUT[data]
    low2 = pa.LargeStringArray.from_buffers(
        len(low), bufs[1], pa.py_buffer(cleaned.tobytes()), bufs[0]
    )
    fast = pc.ascii_split_whitespace(low2)

    kept_ref = [[t for t in row.as_py() if t] for row in ref]
    kept_fast = [[t for t in row.as_py() if t] for row in fast]
    assert kept_ref == kept_fast
