"""Phrase suggester ("did you mean"): index-derived bigram LM + candidate
product scoring vs the pandas oracle — suggestion-, score- and
n_changed-identical (same f64 arithmetic in the same order on both
sides). Also pins the bigram model itself against first-principles
counts from the token streams."""

import numpy as np
import pytest

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT
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


SUGGEST_INPUTS = [
    "w0000 w0003",    # already-correct phrase: original must be a candidate
    "w0000 w000x",    # one typo in the second slot
    "w000x w0003",    # one typo in the first slot
    "w00x0 w00x1",    # typos in both slots
    "w0000",          # single token (head-gram LM only)
    "zzzzzz w0000",   # OOV beyond max_edits: kept as cf=0 candidate
]


def test_phrase_suggest_matches_oracle(spark, pix, oracle):
    s = BM25Searcher(pix)
    for q in SUGGEST_INPUTS:
        got = s.phrase_suggest(q, max_edits=1, candidates_per_term=4,
                               size=6).toPandas()
        exp = oracle.phrase_suggest_topk(q, max_edits=1,
                                         candidates_per_term=4, size=6)
        assert got["suggestion"].tolist() == exp["suggestion"].tolist(), q
        assert got["score"].tolist() == exp["score"].tolist(), q
        assert got["n_changed"].tolist() == exp["n_changed"].tolist(), q


def test_phrase_suggest_edges(spark, pix):
    s = BM25Searcher(pix)
    assert s.phrase_suggest("").count() == 0
    with pytest.raises(ValueError, match="max_terms"):
        s.phrase_suggest("a b c d e f g")
    nopos = build_index_nopos(spark)
    with pytest.raises(ValueError, match="store_positions"):
        BM25Searcher(nopos).phrase_suggest("w0000")


def build_index_nopos(spark):
    from bitcoin_ledger_2es_spark.sources.synth import gen_transcripts

    return build_index(
        gen_transcripts(spark, 20),
        DEFAULT.with_(docs_per_shard=128, block_size=32,
                      store_positions=False),
    )


def test_bigram_model_counts_first_principles(spark, pix, oracle):
    """The index-derived bigram/unigram counts equal the brute-force
    counts from the token streams (total N, |V|, and every (a, b) pair)."""
    from bitcoin_ledger_2es_spark.operators.bigram import bigram_model

    m = bigram_model(pix)
    try:
        exp_cf = {t: int(tfs.sum()) for t, (rows, tfs) in oracle.postings.items()}
        exp_big = {}
        for ts in oracle._toks:
            for a, b in zip(ts, ts[1:]):
                exp_big[(a, b)] = exp_big.get((a, b), 0) + 1
        assert m.n_tokens == sum(exp_cf.values())
        assert m.vocab == len(exp_cf)
        # map term_id -> term via the dictionary and compare exhaustively
        tid2term = {
            int(r["term_id"]): r["term"]
            for r in pix.dictionary.select("term", "term_id").collect()
        }
        got_uni = {
            tid2term[int(r["tid"])]: int(r["cf"])
            for r in m.unigrams.collect()
        }
        assert got_uni == exp_cf
        got_big = {
            (tid2term[int(r["t1"])], tid2term[int(r["t2"])]): int(r["c"])
            for r in m.bigrams.collect()
        }
        assert got_big == exp_big
    finally:
        m.release()
