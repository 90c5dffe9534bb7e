"""ES intervals query (full algebra): engine vs a brute-force pandas
recomputation of the documented minimal-interval model
(operators/intervals.py) — enumeration-based where enumeration is
tractable (ordered all_of: all in-order disjoint combinations, then
minimalize), plus hand-built unit cases through the numpy kernels."""

import numpy as np
import pytest

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.functions.analyze import analyze_query
from bitcoin_ledger_2es_spark.functions.bm25 import idf as idf_fn
from bitcoin_ledger_2es_spark.operators.intervals import Iv
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


# ------------------------------------------------------------- brute iv
# intervals as sorted lists of (l, r, w); minimalize by O(n^2) scan


def _minimal(ivs):
    out = []
    for i, (l, r, w) in enumerate(ivs):
        dominated = any(
            (l2 >= l and r2 <= r and (l2, r2) != (l, r))
            for j, (l2, r2, _) in enumerate(ivs)
            if j != i
        )
        dup_better = any(
            (l2, r2) == (l, r) and (w2 > w or (w2 == w and j < i))
            for j, (l2, r2, w2) in enumerate(ivs)
            if j != i
        )
        if not dominated and not dup_better:
            out.append((l, r, w))
    return sorted(set(out))


def _pts(ts, term):
    return [(i, i, 1) for i, x in enumerate(ts) if x == term]


def _reduce_envs(envs):
    """Per left endpoint keep (min right, max w on right ties) — a pure
    set-algebra identity (a same-l, larger-r envelope is dominated by
    definition), applied before the O(n^2) minimality scan so rollup
    docs (hundreds of occurrences) don't blow the brute up."""
    best = {}
    for l, r, w in envs:
        cur = best.get(l)
        if cur is None or r < cur[0] or (r == cur[0] and w > cur[1]):
            best[l] = (r, w)
    return [(l, r, w) for l, (r, w) in best.items()]


def _all_ordered_enum(parts):
    """Full enumeration: one interval per part, in order, disjoint."""
    chains = [[c] for c in parts[0]]
    for part in parts[1:]:
        chains = [
            ch + [(l, r, w)]
            for ch in chains
            for l, r, w in part
            if l > ch[-1][1]
        ]
    envs = [
        (ch[0][0], ch[-1][1], sum(w for _, _, w in ch)) for ch in chains
    ]
    return _minimal(_reduce_envs(envs))


def _gaps_filter(ivs, max_gaps):
    if max_gaps < 0:
        return ivs
    return [(l, r, w) for l, r, w in ivs if max(0, r - l + 1 - w) <= max_gaps]


def _brute_topk(oracle, per_doc, scoring_idf, k):
    rows, freqs = [], []
    for row, ivs in per_doc.items():
        if not ivs:
            continue
        f = 0.0
        for l, r, w in sorted(ivs):
            f += 1.0 / (1.0 + max(0, r - l + 1 - w))
        rows.append(row)
        freqs.append(f)
    rows = np.asarray(rows, dtype=np.int64)
    f = np.asarray(freqs, dtype=np.float64)
    if rows.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    dl = oracle.doc_len[rows].astype(np.float64)
    s32 = (
        scoring_idf * f * (CFG.k1 + 1)
        / (f + CFG.k1 * (1 - CFG.b + CFG.b * dl / oracle.avgdl))
    ).astype(np.float32)
    order = np.lexsort((oracle.doc_ids[rows], -s32.astype(np.float64)))[:k]
    return oracle.doc_ids[rows][order], s32[order]


def _idf_of(oracle, terms):
    return sum(
        float(idf_fn(float(len(oracle.postings[t][0])), oracle.n_docs))
        for t in terms
        if t in oracle.postings
    )


def _assert_match(got, exp_ids, exp_scores):
    assert got["doc_id"].tolist() == exp_ids.tolist()
    assert got["score"].tolist() == exp_scores.tolist()


# ---------------------------------------------------------------- tests


def test_all_of_ordered_matches_enumeration(searcher, oracle):
    """Engine greedy-chain + minimalize == full enumeration + minimalize,
    composed under any_of and max_gaps, across the whole tiny corpus."""
    spec = Iv.all_of(
        [Iv.any_of(Iv.match("w0004"), Iv.match("w0007")), Iv.match("w0001")],
        max_gaps=4,
        ordered=True,
    )
    got = searcher.intervals_query(spec, k=50, with_meta=False).toPandas()
    per_doc = {}
    for row, ts in enumerate(oracle._toks):
        # a union of point sources is already an antichain (distinct
        # terms occupy distinct positions) — no minimality scan needed
        src1 = sorted(_pts(ts, "w0004") + _pts(ts, "w0007"))
        src2 = _pts(ts, "w0001")
        if not src1 or not src2:
            per_doc[row] = []
            continue
        per_doc[row] = _gaps_filter(_all_ordered_enum([src1, src2]), 4)
    idf = _idf_of(oracle, ["w0004", "w0007", "w0001"])
    ids, scores = _brute_topk(oracle, per_doc, idf, 50)
    assert len(ids) > 0
    _assert_match(got, ids, scores)


def test_unordered_all_of_points_matches_enumeration(searcher, oracle):
    """Unordered sweep over point sources == enumerate all pairs,
    envelope, minimalize (points: w is fixed at n)."""
    spec = Iv.all_of([Iv.match("w0002"), Iv.match("w0005")], max_gaps=6)
    got = searcher.intervals_query(spec, k=50, with_meta=False).toPandas()
    per_doc = {}
    for row, ts in enumerate(oracle._toks):
        a, b = _pts(ts, "w0002"), _pts(ts, "w0005")
        envs = [
            (min(l1, l2), max(r1, r2), 2)
            for l1, r1, _ in a
            for l2, r2, _ in b
        ]
        per_doc[row] = _gaps_filter(_minimal(_reduce_envs(envs)), 6)
    idf = _idf_of(oracle, ["w0002", "w0005"])
    ids, scores = _brute_topk(oracle, per_doc, idf, 50)
    assert len(ids) > 0
    _assert_match(got, ids, scores)


def test_filters_match_brute(searcher, oracle):
    """not_containing / contained_by composed on a sloppy ordered match."""
    base = Iv.match("w0000 w0001", max_gaps=5, ordered=True)
    ref = Iv.match("w0003")
    for spec, rule in [
        (base.not_containing(ref), "not_containing"),
        (base.containing(ref), "containing"),
        (base.not_overlapping(ref), "not_overlapping"),
    ]:
        got = searcher.intervals_query(spec, k=50, with_meta=False).toPandas()
        per_doc = {}
        for row, ts in enumerate(oracle._toks):
            main = _gaps_filter(
                _all_ordered_enum([_pts(ts, "w0000"), _pts(ts, "w0001")]), 5
            )
            refs = _pts(ts, "w0003")
            if rule == "containing":
                keep = [
                    iv for iv in main
                    if any(l2 >= iv[0] and r2 <= iv[1] for l2, r2, _ in refs)
                ]
            elif rule == "not_containing":
                keep = [
                    iv for iv in main
                    if not any(l2 >= iv[0] and r2 <= iv[1] for l2, r2, _ in refs)
                ]
            else:  # not_overlapping
                keep = [
                    iv for iv in main
                    if not any(l2 <= iv[1] and r2 >= iv[0] for l2, r2, _ in refs)
                ]
            per_doc[row] = keep
        idf = _idf_of(oracle, ["w0000", "w0001"])
        ids, scores = _brute_topk(oracle, per_doc, idf, 50)
        assert len(ids) > 0, rule
        got_pairs = list(zip(got["doc_id"].tolist(), got["score"].tolist()))
        exp_pairs = list(zip(ids.tolist(), scores.tolist()))
        assert got_pairs == exp_pairs, rule


def test_prefix_source_and_oov(searcher, oracle):
    """Prefix leaf expands alphabetically; blended idf = idf(max df).
    OOV branches: any_of skips, all_of empties, negative filter no-ops."""
    got = searcher.intervals_query(
        Iv.all_of([Iv.prefix("w000"), Iv.match("w0010")], max_gaps=3, ordered=True),
        k=20, with_meta=False,
    )
    assert got.count() > 0
    assert searcher.intervals_query(Iv.match("zzzz"), k=5).count() == 0
    assert (
        searcher.intervals_query(
            Iv.all_of([Iv.match("w0000"), Iv.match("zzzz")]), k=5
        ).count()
        == 0
    )
    a = searcher.intervals_query(
        Iv.any_of(Iv.match("w0004"), Iv.match("zzzz")), k=10, with_meta=False
    ).toPandas()
    b = searcher.intervals_query(Iv.match("w0004"), k=10, with_meta=False).toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()
    c = searcher.intervals_query(
        Iv.match("w0004").not_containing(Iv.match("zzzz")), k=10, with_meta=False
    ).toPandas()
    assert c["doc_id"].tolist() == b["doc_id"].tolist()
    assert (
        searcher.intervals_query(
            Iv.match("w0004").contained_by(Iv.match("zzzz")), k=5
        ).count()
        == 0
    )


def test_fuzzy_leaf(searcher):
    """fuzziness=0 expands to exactly the term (blended idf at its own
    df == the match idf) — identical scores; fuzziness=1 broadens."""
    a = searcher.intervals_query(Iv.fuzzy("w0004", 0), k=15, with_meta=False).toPandas()
    b = searcher.intervals_query(Iv.match("w0004"), k=15, with_meta=False).toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()
    wide = searcher.intervals_query(
        Iv.fuzzy("w0004", 1, max_expansions=100), k=1000, with_meta=False
    )
    assert wide.count() > len(b)  # w0001/w0002/... are 1 edit away


def test_single_term_match_equals_term_topk(searcher):
    """A 1-term intervals query IS the term query: every occurrence is a
    width-1 interval, freq = tf, same idf — scores must be identical."""
    a = searcher.intervals_query(Iv.match("w0006"), k=15, with_meta=False).toPandas()
    b = searcher.top_k("w0006", k=15, with_meta=False).toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()


def test_kernel_units():
    """Hand-built arrays through minimalize / ordered chain / unordered
    sweep / gaps / filters."""
    from bitcoin_ledger_2es_spark.operators.intervals import (
        Ivl,
        iv_all_of_ordered,
        iv_all_of_unordered,
        iv_any_of,
        iv_filter,
        iv_freqs,
        iv_gaps,
        minimalize,
    )

    def ivl(rows):
        a = np.asarray(rows, dtype=np.int64).reshape(-1, 4)
        o = np.lexsort((a[:, 2], a[:, 1], a[:, 0]))
        a = a[o]
        return Ivl(a[:, 0], a[:, 1], a[:, 2], a[:, 3])

    # minimalize: (0,9) contains (2,5); dup (2,5) keeps max w
    m = minimalize(*ivl([[0, 0, 9, 2], [0, 2, 5, 2], [0, 2, 5, 3], [1, 1, 1, 1]]))
    assert list(zip(m.doc, m.l, m.r, m.w)) == [(0, 2, 5, 3), (1, 1, 1, 1)]
    # ordered chain: a=(0..0),(5..5); b=(2,3): only a@0 chains (0->2..3)
    a = ivl([[0, 0, 0, 1], [0, 5, 5, 1]])
    b = ivl([[0, 2, 3, 2]])
    ch = iv_all_of_ordered([a, b])
    assert list(zip(ch.doc, ch.l, ch.r, ch.w)) == [(0, 0, 3, 3)]
    # unordered: same parts, order-free -> (2..5) window too; minimal set
    un = iv_all_of_unordered([a, b])
    assert list(zip(un.doc, un.l, un.r, un.w)) == [(0, 0, 3, 3), (0, 2, 5, 3)]
    # gaps: (0,3,w3) has gaps 1; (2,5,w3) has gaps 1
    assert iv_gaps(un, 0).doc.size == 0
    assert iv_gaps(un, 1).doc.size == 2
    # any_of: dominated union member removed
    u = iv_any_of([ivl([[0, 1, 6, 2]]), ivl([[0, 2, 4, 2]])])
    assert list(zip(u.l, u.r)) == [(2, 4)]
    # freqs: weight 1/(1+gaps), fold per doc
    d, f = iv_freqs(ivl([[0, 0, 2, 3], [0, 4, 6, 2], [1, 0, 0, 1]]))
    assert d.tolist() == [0, 1]
    assert f[0] == pytest.approx(1.0 + 0.5)
    assert f[1] == 1.0
    # filter: not_contained_by
    big = ivl([[0, 0, 9, 2]])
    little = ivl([[0, 2, 5, 2], [0, 11, 12, 2]])
    kept = iv_filter(little, big, "not_contained_by")
    assert list(zip(kept.l, kept.r)) == [(11, 12)]
