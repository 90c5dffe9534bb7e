"""match_phrase (B5): positional index + phrase scorer vs the brute-force
pandas oracle — rank-, score- and phrase-freq-identical; plus positions
stream roundtrip invariants."""

import numpy as np
import pandas as pd
import pytest

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.functions.analyze import tokenize_series
from bitcoin_ledger_2es_spark.functions.codec import (
    decode_doc_gaps,
    decode_positions,
    decode_tfs,
)
from bitcoin_ledger_2es_spark.oracle import PandasOracle

CFG = DEFAULT.with_(docs_per_shard=128, block_size=32, store_positions=True)


@pytest.fixture(scope="module")
def pix(spark, tiny_df):
    return build_index(tiny_df, CFG)


@pytest.fixture(scope="module")
def oracle(spark, tiny_df):
    from bitcoin_ledger_2es_spark.plans.build import tokenized_documents

    docs, _ = tokenized_documents(tiny_df, CFG)
    return PandasOracle(docs.select("doc_id", "text").toPandas(), CFG)


PHRASES = [
    "w0000 w0001",     # common bigram
    "w0003 w0000",     # reversed order — different matches than the above
    "w0000",            # single-term phrase == term query with tf semantics
    "w0000 w0000",     # repeated term
    "w0000 zz_oov",    # OOV term -> empty
    "w0001 w0002 w0003",  # trigram (likely rare/empty)
]


def test_phrase_matches_oracle(spark, pix, oracle):
    s = BM25Searcher(pix)
    for q in PHRASES:
        got = s.phrase_query(q, k=25).toPandas()
        exp = oracle.phrase_topk(q, k=25)
        assert got["doc_id"].tolist() == exp["doc_id"].tolist(), q
        assert got["score"].tolist() == exp["score"].tolist(), q
        assert got["phrase_freq"].tolist() == exp["phrase_freq"].tolist(), q


def test_phrase_requires_positions(spark, tiny_df):
    ix = build_index(tiny_df, CFG.with_(store_positions=False))
    with pytest.raises(ValueError, match="store_positions"):
        BM25Searcher(ix).phrase_query("w0000 w0001")


def test_phrase_meta_join(spark, pix):
    s = BM25Searcher(pix)
    got = s.phrase_query("w0000 w0001", k=5, with_meta=True).toPandas()
    assert list(got.columns) == [
        "rank", "doc_id", "score", "phrase_freq", "conv_id", "turn_idx", "is_rollup"
    ]
    assert len(got) <= 5 and got["rank"].tolist() == list(range(1, len(got) + 1))


def test_positions_roundtrip_invariants(spark, pix, tiny_df):
    """Every posting's decoded positions must equal the analyzer's token
    positions for that (term, doc), strictly increasing, within doc_len."""
    from bitcoin_ledger_2es_spark.plans.build import tokenized_documents

    docs, _ = tokenized_documents(tiny_df, CFG)
    rows = docs.select("doc_id", "text").collect()
    tok_lists = tokenize_series(pd.Series([r["text"] for r in rows]), CFG)
    toks = {r["doc_id"]: ts for r, ts in zip(rows, tok_lists)}
    expect: dict[tuple[int, str], list[int]] = {}
    for did, ts in toks.items():
        for p, t in enumerate(ts):
            expect.setdefault((did, t), []).append(p)

    dic = pix.dictionary.toPandas().set_index("term_id")["term"]
    post = pix.postings.toPandas()
    checked = 0
    for r in post.itertuples(index=False):
        docs_arr = decode_doc_gaps(r.doc_id_deltas, int(r.first_doc_id), int(r.n_docs))
        tfs = decode_tfs(r.tfs)
        pos = decode_positions(r.poss, tfs)
        assert pos.size == tfs.sum()
        term = dic.loc[r.term_id]
        off = 0
        for d, tf in zip(docs_arr, tfs):
            got = pos[off : off + tf].tolist()
            assert got == expect[(int(d), term)], (term, d)
            off += tf
            checked += 1
    assert checked > 1000


# ---------------------------------------------------------------------------
# multi-term expansions (ES prefix / wildcard / fuzzy): engine expansion +
# weight-1 OR scoring vs the same expansion fed to the brute-force oracle


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _oracle_expand(oracle, cond, max_exp=50):
    cands = [(t, len(oracle.postings[t][0])) for t in oracle.postings if cond(t)]
    cands.sort(key=lambda x: (-x[1], x[0]))
    return [t for t, _ in cands[:max_exp]]


def test_expansion_queries_match_oracle(spark, pix, oracle):
    from bitcoin_ledger_2es_spark import BM25Searcher

    s = BM25Searcher(pix)
    import re

    wc = re.compile("^w0.1.*$")
    cases = [
        (s.prefix_query("w00", k=15, with_meta=False),
         _oracle_expand(oracle, lambda t: t.startswith("w00"))),
        (s.wildcard_query("w0?1*", k=15, with_meta=False),
         _oracle_expand(oracle, lambda t: bool(wc.match(t)))),
        (s.fuzzy_query("w0001", fuzziness=1, k=15, with_meta=False),
         _oracle_expand(oracle, lambda t: _lev(t, "w0001") <= 1)),
    ]
    for got_df, terms in cases:
        assert terms, "expansion must be non-empty on the synthetic vocab"
        got = got_df.toPandas()
        exp = oracle.top_k(" ".join(terms), k=15, mode="or")
        assert got["doc_id"].tolist() == exp["doc_id"].tolist()
        assert got["score"].tolist() == exp["score"].tolist()


def test_expansion_cap_is_df_ordered(spark, pix, oracle):
    """max_expansions keeps the HIGHEST-df terms (ES top_terms rewrite)."""
    from bitcoin_ledger_2es_spark import BM25Searcher

    s = BM25Searcher(pix)
    got = s.prefix_query("w0", k=10, max_expansions=5, with_meta=False).toPandas()
    exp_terms = _oracle_expand(oracle, lambda t: t.startswith("w0"), max_exp=5)
    exp = oracle.top_k(" ".join(exp_terms), k=10, mode="or")
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()


def test_sloppy_phrase_matches_oracle(spark, pix, oracle):
    from bitcoin_ledger_2es_spark import BM25Searcher

    s = BM25Searcher(pix)
    cases = [
        ("w0000 w0001", 1), ("w0000 w0001", 2), ("w0003 w0000", 3),
        ("w0000 w0001 w0002", 2), ("w0000 w0000", 1),
    ]
    for q, slop in cases:
        got = s.phrase_query(q, k=25, slop=slop).toPandas()
        exp = oracle.phrase_topk(q, k=25, slop=slop)
        assert got["doc_id"].tolist() == exp["doc_id"].tolist(), (q, slop)
        assert got["score"].tolist() == exp["score"].tolist(), (q, slop)
        assert got["phrase_freq"].tolist() == exp["phrase_freq"].tolist(), (q, slop)
        # slop matches are a superset of exact matches
        exact_docs = set(oracle.phrase_topk(q, k=10_000, slop=0)["doc_id"])
        assert exact_docs <= set(oracle.phrase_topk(q, k=10_000, slop=slop)["doc_id"])


UNORDERED_CASES = [
    ("w0000 w0003", 2),
    ("w0003 w0000", 2),   # reversed query: unordered must equal the above
    ("w0000 w0005", 4),
    ("w0001 w0002 w0004", 6),  # trigram window
]


def test_unordered_slop_matches_oracle(spark, pix, oracle):
    s = BM25Searcher(pix)
    for q, slop in UNORDERED_CASES:
        got = s.phrase_query(q, k=50, slop=slop, ordered=False).toPandas()
        exp = oracle.phrase_topk(q, k=50, slop=slop, ordered=False)
        assert got["doc_id"].tolist() == exp["doc_id"].tolist(), (q, slop)
        assert got["score"].tolist() == exp["score"].tolist(), (q, slop)
        np.testing.assert_allclose(
            got["phrase_freq"].to_numpy(), exp["phrase_freq"].to_numpy(), rtol=0, atol=0
        )


def test_unordered_slop_monotone_and_supersets_ordered(spark, pix):
    """Raising slop only adds hits; unordered matching at a given slop is a
    superset of ordered matching (every ordered match is also an unordered
    window of no greater width)."""
    s = BM25Searcher(pix)
    prev = None
    for slop in (1, 2, 4):
        u = set(
            s.phrase_query("w0000 w0003", k=100000, slop=slop, ordered=False)
            .toPandas()["doc_id"]
        )
        o = set(
            s.phrase_query("w0000 w0003", k=100000, slop=slop, ordered=True)
            .toPandas()["doc_id"]
        )
        assert o <= u, slop
        if prev is not None:
            assert prev <= u, slop
        prev = u


def test_unordered_transposition_fixture(spark):
    """Lucene's documented slop behavior: a transposed bigram matches at
    slop >= 2 with sloppy freq 1/(1+2) = 1/3; at slop < 2 it does not."""
    docs = spark.createDataFrame(
        [
            ("c0", 0, "user", "quick fox", None, "2024-01-01 00:00:00"),
            ("c1", 0, "user", "fox quick", None, "2024-01-01 00:00:00"),
            ("c2", 0, "user", "quick brown fox", None, "2024-01-01 00:00:00"),
        ],
        "conv_id string, tidx int, role string, text string, tool string, ts string",
    ).selectExpr(
        "conv_id", "tidx as turn_idx", "role", "text", "tool", "cast(ts as timestamp) ts"
    )
    ix = build_index(docs, CFG.with_(index_rollups=False))
    s = BM25Searcher(ix)

    def hits(slop, ordered=False):
        r = s.phrase_query("quick fox", k=10, slop=slop, ordered=ordered).toPandas()
        return dict(zip(r["doc_id"], r["phrase_freq"]))

    exact = hits(0)
    assert set(exact) == {0}  # doc c0 only ("quick fox" adjacent)
    assert exact[0] == 1.0

    h1 = hits(1)
    assert set(h1) == {0, 2}  # "quick brown fox" = one-gap match, weight 1/2
    assert h1[2] == pytest.approx(0.5)

    h2 = hits(2)
    assert set(h2) == {0, 1, 2}  # transposition now matches...
    assert h2[1] == pytest.approx(1.0 / 3.0)  # ...with Lucene's 1/(1+2)

    # ordered mode never matches the transposed doc
    assert 1 not in hits(2, ordered=True)


def test_unordered_repeated_terms_rejected(spark, pix):
    with pytest.raises(ValueError, match="repeated query terms"):
        BM25Searcher(pix).phrase_query("w0000 w0000", slop=1, ordered=False)


def test_phrase_random_differential(spark, pix, oracle):
    """Random phrases (2-3 terms from frequent+mid vocab, slop 0-4,
    ordered and unordered) vs the brute-force oracle — doc ids, scores,
    and phrase freqs all exact."""
    rng = np.random.default_rng(23)
    vocab = ["w0000", "w0001", "w0002", "w0003", "w0005", "w0010", "w0050", "w0200"]
    s = BM25Searcher(pix)
    for _ in range(18):
        n = int(rng.integers(2, 4))
        terms = list(rng.choice(vocab, size=n, replace=False))
        q = " ".join(terms)
        slop = int(rng.integers(0, 5))
        ordered = bool(rng.integers(0, 2)) or slop == 0
        got = s.phrase_query(q, k=40, slop=slop, ordered=ordered).toPandas()
        exp = oracle.phrase_topk(q, k=40, slop=slop, ordered=ordered)
        case = (q, slop, ordered)
        assert got["doc_id"].tolist() == exp["doc_id"].tolist(), case
        assert got["score"].tolist() == exp["score"].tolist(), case
        np.testing.assert_array_equal(
            got["phrase_freq"].to_numpy(), exp["phrase_freq"].to_numpy()
        ), case


# --- match_phrase_prefix (ordered multi-phrase with expanded last slot) ---

PREFIX_PHRASES = [
    ("w0000 w000", 0),    # fixed term + short prefix (several expansions)
    ("w0000 w0001", 0),   # prefix IS a complete term (still expanded set)
    ("w000", 0),          # single-token query: blended one-slot multi-phrase
    ("w0003 w00", 2),     # sloppy ordered with a wide expansion
    ("zz_oov w000", 0),   # OOV fixed term -> empty
    ("w0000 zzz", 0),     # nothing extends the stem -> empty
]


def test_phrase_prefix_matches_oracle(spark, pix, oracle):
    s = BM25Searcher(pix)
    for q, slop in PREFIX_PHRASES:
        got = s.phrase_prefix_query(q, k=25, slop=slop, max_expansions=8).toPandas()
        exp = oracle.phrase_prefix_topk(q, k=25, slop=slop, max_expansions=8)
        assert got["doc_id"].tolist() == exp["doc_id"].tolist(), q
        assert got["score"].tolist() == exp["score"].tolist(), q
        assert got["phrase_freq"].tolist() == exp["phrase_freq"].tolist(), q


def test_phrase_prefix_expansion_cap_is_alphabetical(spark, pix, oracle):
    """max_expansions caps the expansion in ALPHABETICAL term order (the
    Lucene phrase-prefix rewrite), NOT top-df: with cap=1 the stem 'w000'
    must expand to exactly 'w0000' (alphabetically first), so the result
    equals the plain phrase query on that term with the blended idf ==
    idf(df(w0000)) — identical here since the group is a singleton."""
    s = BM25Searcher(pix)
    got = s.phrase_prefix_query("w0003 w000", k=25, max_expansions=1).toPandas()
    exp = oracle.phrase_topk("w0003 w0000", k=25)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["score"].tolist() == exp["score"].tolist()


def test_phrase_prefix_complete_term_scores_blended_idf(spark, pix, oracle):
    """When the stem is a complete term with siblings (w0001 extends to
    w0001, w0010..), the blended multi-phrase must differ from the plain
    phrase exactly by (a) extra windows ending in sibling terms and (b)
    the max-df blended idf — i.e. every plain-phrase match doc appears in
    the prefix result with pf >= the plain pf."""
    s = BM25Searcher(pix)
    plain = oracle.phrase_topk("w0000 w0001", k=10_000)
    pref = s.phrase_prefix_query("w0000 w0001", k=10_000, max_expansions=50).toPandas()
    pf_by_doc = dict(zip(pref["doc_id"], pref["phrase_freq"]))
    for d, pf in zip(plain["doc_id"], plain["phrase_freq"]):
        assert pf_by_doc.get(d, 0) >= pf


def test_phrase_prefix_requires_positions(spark, tiny_df):
    ix = build_index(tiny_df, CFG.with_(store_positions=False))
    with pytest.raises(ValueError, match="store_positions"):
        BM25Searcher(ix).phrase_prefix_query("w0000 w000")
