"""ES match-with-fuzziness (``match_fuzzy``): per-token dictionary
expansion under the AUTO ladder + Lucene top_terms_blended_freqs
scoring, implemented AS the match_synonyms blended composition —
pinned equal to an explicit match_synonyms call with the brute-force
expansion map, expansion set verified against a python Levenshtein."""

import numpy as np
import pandas as pd
import pytest

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT

CFG = DEFAULT.with_(docs_per_shard=128, block_size=32, index_rollups=False)


@pytest.fixture(scope="module")
def s(spark, tiny_df):
    return BM25Searcher(build_index(tiny_df, CFG))


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_expand(dict_pdf, tok, d, max_expansions, prefix_length=0):
    cand = dict_pdf.copy()
    if prefix_length:
        cand = cand[cand["term"].str[:prefix_length] == tok[:prefix_length]]
    cand = cand[cand["term"].map(lambda t: _lev(t, tok)) <= d]
    cand = cand.sort_values(["df", "term"], ascending=[False, True],
                            kind="mergesort").head(max_expansions)
    return cand["term"].tolist()


def test_match_fuzzy_equals_explicit_synonyms(s):
    dict_pdf = s.ix.dictionary.select("term", "df").toPandas()
    q = "w0003 w0042"
    syn = {}
    for tok in q.split():
        exp = _brute_expand(dict_pdf, tok, 1, 50)  # len 5 -> AUTO d=1
        syn[tok] = [t for t in exp if t != tok]
    got = s.match_fuzzy(q, fuzziness="AUTO", k=25, mode="or",
                        with_meta=False).toPandas()
    exp_df = s.match_synonyms(q, syn, k=25, mode="or",
                              with_meta=False).toPandas()
    assert got["doc_id"].tolist() == exp_df["doc_id"].tolist()
    assert np.array_equal(
        got["score"].to_numpy(np.float32), exp_df["score"].to_numpy(np.float32)
    )


def test_match_fuzzy_auto_ladder_short_token_exact_only(s):
    # a 2-char token gets distance 0 under AUTO: OOV short token ->
    # empty group -> AND mode yields nothing, OR mode ignores it (the
    # long token still expands under its own d=1 ladder step)
    assert s.match_fuzzy("zz w0000", mode="and", k=5).count() == 0
    dict_pdf = s.ix.dictionary.select("term", "df").toPandas()
    syn = {"zz": [], "w0000": [
        t for t in _brute_expand(dict_pdf, "w0000", 1, 50) if t != "w0000"
    ]}
    got = s.match_fuzzy("zz w0000", mode="or", k=5, with_meta=False).toPandas()
    exp = s.match_synonyms("zz w0000", syn, k=5, mode="or",
                           with_meta=False).toPandas()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert np.array_equal(
        got["score"].to_numpy(np.float32), exp["score"].to_numpy(np.float32)
    )
    # a short IN-VOCAB... there are none in this vocab: fuzziness=0
    # explicitly pins the exact-only path instead
    g0 = s.match_fuzzy("w0000", fuzziness=0, k=5, with_meta=False).toPandas()
    e0 = s.top_k("w0000", k=5, mode="or", with_meta=False).toPandas()
    assert g0["doc_id"].tolist() == e0["doc_id"].tolist()
    assert np.array_equal(
        g0["score"].to_numpy(np.float32), e0["score"].to_numpy(np.float32)
    )


def test_match_fuzzy_prefix_length(s):
    dict_pdf = s.ix.dictionary.select("term", "df").toPandas()
    got = s.match_fuzzy("w0111", fuzziness=2, k=30, prefix_length=4,
                        with_meta=False).toPandas()
    syn = {"w0111": [t for t in _brute_expand(dict_pdf, "w0111", 2, 50, 4)
                     if t != "w0111"]}
    exp = s.match_synonyms("w0111", syn, k=30, with_meta=False).toPandas()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    # every expansion shares the 4-char prefix by construction
    assert all(t.startswith("w011") for t in syn["w0111"])


def test_match_fuzzy_int_fuzziness_widens(s):
    n1 = s.match_fuzzy("w0500", fuzziness=1, k=1_000_000,
                       with_meta=False).count()
    n2 = s.match_fuzzy("w0500", fuzziness=2, k=1_000_000,
                       with_meta=False).count()
    assert n2 >= n1 > 0
