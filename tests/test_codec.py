import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bitcoin_ledger_2es_spark.functions.codec import (
    decode_doc_gaps,
    decode_varints,
    encode_doc_gaps,
    encode_varints,
)


def test_empty():
    assert encode_varints(np.array([], dtype=np.uint64)) == b""
    assert decode_varints(b"").size == 0


@pytest.mark.parametrize(
    "vals",
    [
        [0],
        [1],
        [127],
        [128],
        [2**31 - 1],
        [2**63 - 1],
        [2**64 - 1],
        [0, 0, 0],
        list(range(1000)),
        [2**i for i in range(64)],
    ],
)
def test_roundtrip_cases(vals):
    a = np.array(vals, dtype=np.uint64)
    out = decode_varints(encode_varints(a))
    np.testing.assert_array_equal(out, a)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_roundtrip_property(vals):
    a = np.array(vals, dtype=np.uint64)
    np.testing.assert_array_equal(decode_varints(encode_varints(a)), a)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500).map(sorted),
)
@settings(max_examples=200, deadline=None)
def test_doc_gaps_roundtrip(doc_ids):
    doc_ids = sorted(set(doc_ids))
    a = np.array(doc_ids, dtype=np.int64)
    buf = encode_doc_gaps(a)
    out = decode_doc_gaps(buf, int(a[0]), len(a))
    np.testing.assert_array_equal(out, a)


def test_compression_actually_compresses():
    # dense doc ids -> gaps of 1 -> 1 byte each
    a = np.arange(10_000, dtype=np.int64) + 5
    assert len(encode_doc_gaps(a)) == 9_999
