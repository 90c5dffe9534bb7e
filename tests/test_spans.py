"""Span composition family (span_or / span_not / span_containing /
span_within): engine vs a brute-force pandas recomputation that mirrors
the documented span model (operators/spans.py) — greedy-earliest ordered
chains, 1/(1+gap) sloppy weighting, scoring-side idf."""

import numpy as np
import pytest

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.functions.analyze import analyze_query
from bitcoin_ledger_2es_spark.functions.bm25 import idf as idf_fn
from bitcoin_ledger_2es_spark.oracle import PandasOracle

CFG = DEFAULT.with_(docs_per_shard=128, block_size=32, store_positions=True)


@pytest.fixture(scope="module")
def pix(spark, tiny_df):
    return build_index(tiny_df, CFG)


@pytest.fixture(scope="module")
def searcher(pix):
    return BM25Searcher(pix)


@pytest.fixture(scope="module")
def oracle(spark, tiny_df):
    from bitcoin_ledger_2es_spark.plans.build import tokenized_documents

    docs, _ = tokenized_documents(tiny_df, CFG)
    pdf = docs.select("doc_id", "text").toPandas()
    return PandasOracle(pdf, CFG)


# ---------------------------------------------------------------- brute


def _chain_spans(ts, terms, slop):
    """Greedy-earliest ordered chains — the _ordered_spans contract: each
    slot takes the minimal position > previous, bounded q <= p0+slot+slop.
    Returns [(start, end, gap)]."""
    n = len(terms)
    if n == 1:
        return [(i, i, 0) for i, x in enumerate(ts) if x == terms[0]]
    out = []
    for p0 in (i for i, x in enumerate(ts) if x == terms[0]):
        cur, ok = p0, True
        for slot in range(1, n):
            nxt = next(
                (j for j in range(cur + 1, len(ts)) if ts[j] == terms[slot]), None
            )
            if nxt is None or nxt > p0 + slot + slop:
                ok = False
                break
            cur = nxt
        if ok:
            out.append((p0, cur, (cur - p0) - (n - 1)))
    return out


def _brute_topk(oracle, per_doc_spans, scoring_terms, k):
    """per_doc_spans: row -> list[(s, e, gap)]. BM25 with freq =
    sum 1/(1+gap), idf = sum of scoring terms' idfs; f32 emit, (score
    desc, doc_id asc)."""
    sum_idf = sum(
        float(idf_fn(float(len(oracle.postings[t][0])), oracle.n_docs))
        for t in scoring_terms
        if t in oracle.postings
    )
    rows, freqs = [], []
    for row, spans in per_doc_spans.items():
        if not spans:
            continue
        f = 0.0
        for s, e, g in sorted(spans):
            f += 1.0 / (1.0 + g)
        rows.append(row)
        freqs.append(f)
    rows = np.asarray(rows, dtype=np.int64)
    f = np.asarray(freqs, dtype=np.float64)
    if rows.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    dl = oracle.doc_len[rows].astype(np.float64)
    s32 = (
        sum_idf * f * (CFG.k1 + 1)
        / (f + CFG.k1 * (1 - CFG.b + CFG.b * dl / oracle.avgdl))
    ).astype(np.float32)
    order = np.lexsort((oracle.doc_ids[rows], -s32.astype(np.float64)))[:k]
    return oracle.doc_ids[rows][order], s32[order]


def _overlaps(span, others, pre, post):
    s, e, _ = span
    return any(s2 <= e + post and e2 >= s - pre for s2, e2, _ in others)


def _assert_match(got, exp_ids, exp_scores):
    assert got["doc_id"].tolist() == exp_ids.tolist()
    assert got["score"].tolist() == exp_scores.tolist()


# ---------------------------------------------------------------- tests


def test_span_or_matches_brute(searcher, oracle):
    clauses = ["w0004", "w0007", "w0000 w0001"]
    got = searcher.span_or_query(clauses, slop=2, k=40, with_meta=False).toPandas()
    spans = {}
    terms_all = []
    for c in clauses:
        ct = analyze_query(c, CFG)
        terms_all += ct
        for row, ts in enumerate(oracle._toks):
            spans.setdefault(row, []).extend(_chain_spans(ts, ct, 2))
    ids, scores = _brute_topk(oracle, spans, terms_all, 40)
    assert len(ids) > 0
    _assert_match(got, ids, scores)


def test_span_or_skips_oov_clause(searcher, oracle):
    got = searcher.span_or_query(["w0004", "zzzz"], k=15, with_meta=False).toPandas()
    ref = searcher.span_or_query(["w0004"], k=15, with_meta=False).toPandas()
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert got["score"].tolist() == ref["score"].tolist()
    assert searcher.span_or_query(["zzzz", "qqqq"], k=5).count() == 0


def test_span_not_matches_brute(searcher, oracle):
    inc, exc, pre, post = "w0002", "w0000", 1, 2
    got = searcher.span_not_query(
        inc, exc, pre=pre, post=post, k=40, with_meta=False
    ).toPandas()
    it, et = analyze_query(inc, CFG), analyze_query(exc, CFG)
    spans = {}
    for row, ts in enumerate(oracle._toks):
        incs = _chain_spans(ts, it, 0)
        excs = _chain_spans(ts, et, 0)
        spans[row] = [s for s in incs if not _overlaps(s, excs, pre, post)]
    ids, scores = _brute_topk(oracle, spans, it, 40)
    assert len(ids) > 0
    _assert_match(got, ids, scores)
    # OOV exclude -> include scored unfiltered == plain term ranking
    plain = searcher.top_k(inc, k=10, with_meta=False).toPandas()
    noex = searcher.span_not_query(inc, "zzzz", k=10, with_meta=False).toPandas()
    assert noex["doc_id"].tolist() == plain["doc_id"].tolist()


def test_span_containing_and_within_match_brute(searcher, oracle):
    big, little, slop = "w0000 w0001", "w0002", 4
    bt, lt = analyze_query(big, CFG), analyze_query(little, CFG)
    con_spans, win_spans = {}, {}
    for row, ts in enumerate(oracle._toks):
        bigs = _chain_spans(ts, bt, slop)
        lits = _chain_spans(ts, lt, slop)
        con_spans[row] = [
            (s, e, g) for s, e, g in bigs
            if any(s2 >= s and e2 <= e for s2, e2, _ in lits)
        ]
        win_spans[row] = [
            (s, e, g) for s, e, g in lits
            if any(s2 <= s and e2 >= e for s2, e2, _ in bigs)
        ]
    got_c = searcher.span_containing_query(
        big, little, slop=slop, k=40, with_meta=False
    ).toPandas()
    ids, scores = _brute_topk(oracle, con_spans, bt, 40)
    assert len(ids) > 0
    _assert_match(got_c, ids, scores)
    got_w = searcher.span_within_query(
        little, big, slop=slop, k=40, with_meta=False
    ).toPandas()
    ids, scores = _brute_topk(oracle, win_spans, lt, 40)
    assert len(ids) > 0
    _assert_match(got_w, ids, scores)
    # OOV on the other side -> empty (nothing can contain / be contained)
    assert searcher.span_containing_query(big, "zzzz", k=5).count() == 0
    assert searcher.span_within_query(little, "zzzz", k=5).count() == 0


def test_span_composition_unit():
    """Hand-built arrays through the numpy composition kernels."""
    from bitcoin_ledger_2es_spark.operators.spans import (
        Spans,
        span_containing,
        span_freqs,
        span_not,
        span_or,
        span_within,
    )

    def sp(rows):
        a = np.asarray(rows, dtype=np.int64).reshape(-1, 4)
        return Spans(a[:, 0], a[:, 1], a[:, 2], a[:, 3])

    inc = sp([[0, 2, 2, 0], [0, 8, 8, 0], [1, 3, 3, 0]])
    exc = sp([[0, 7, 9, 0], [1, 0, 1, 0]])
    kept = span_not(inc, exc)
    assert list(zip(kept.doc, kept.start)) == [(0, 2), (1, 3)]
    # pre/post slack pulls (0,2,2) into overlap with (0,7,9) only at post>=5
    kept2 = span_not(inc, exc, pre=0, post=5)
    assert list(zip(kept2.doc, kept2.start)) == [(1, 3)]
    big = sp([[0, 1, 5, 2], [0, 6, 9, 1], [2, 0, 4, 2]])
    little = sp([[0, 2, 3, 0], [2, 5, 5, 0]])
    con = span_containing(big, little)
    assert list(zip(con.doc, con.start, con.end)) == [(0, 1, 5)]
    win = span_within(little, big)
    assert list(zip(win.doc, win.start)) == [(0, 2)]
    # or: union keeps duplicates, freq folds 1/(1+gap)
    u = span_or([inc, sp([[0, 2, 2, 0], [0, 4, 6, 1]])])
    docs, freq = span_freqs(u)
    assert docs.tolist() == [0, 1]
    assert freq[0] == pytest.approx(1.0 + 1.0 + 0.5 + 1.0)  # 2,2 twice + gap1 + 8,8
    assert freq[1] == 1.0


# -------------------------------------------------------- span_multi


def test_span_multi_prefix_equals_span_or(searcher):
    import pandas as pd

    dict_pdf = searcher.ix.dictionary.select("term").toPandas()
    exp_terms = sorted(
        t for t in dict_pdf["term"] if t.startswith("w00")
    )[:50]
    got = searcher.span_multi_query("w00", kind="prefix", k=20,
                                    with_meta=False).toPandas()
    exp = searcher.span_or_query(exp_terms, k=20,
                                 with_meta=False).toPandas()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert np.array_equal(
        got["score"].to_numpy(np.float32), exp["score"].to_numpy(np.float32)
    )


def test_span_multi_fuzzy_and_edges(searcher):
    got = searcher.span_multi_query("w0007", kind="fuzzy", fuzziness=1,
                                    k=10, with_meta=False)
    assert got.count() > 0
    assert searcher.span_multi_query("zzzzz", kind="prefix", k=5).count() == 0
    with pytest.raises(ValueError, match="span_multi kind"):
        searcher.span_multi_query("x", kind="regexp")
