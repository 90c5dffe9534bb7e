"""ES _delete_by_query + _forcemerge?only_expunge_deletes semantics
(public Lucene deleted-docs model, no reference code — SURVEY.md §0):

* tombstoned docs vanish from every serving surface IMMEDIATELY, but
  corpus statistics (df, idf, avgdl) keep counting them until expunge()
  — so surviving docs' scores are bit-identical across the delete;
* deleting a TURN cascades to its conversation's ROLLUP doc (the rollup
  text contains the deleted content);
* surfaces whose shard kernels cap top-k without an allowed-mask hook
  refuse to serve with pending tombstones (honest contract, no silent
  ghosts);
* expunge() physically rewrites the index over live docs (doc_ids and
  surviving term_ids preserved, statistics recomputed) and the result
  matches a first-principles pandas oracle over the live corpus
  bit-for-bit.
"""

import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark import BM25Searcher, PandasOracle, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT

from .test_end_to_end import corpus_docs_pdf

CFG = DEFAULT.with_(docs_per_shard=256, block_size=32, store_positions=True)
_TOK = re.compile(r"[a-z0-9_]+")


@pytest.fixture(scope="module")
def ix(spark, tiny_df):
    return build_index(tiny_df, CFG)


@pytest.fixture(scope="module")
def docs_pdf(tiny_pdf):
    return corpus_docs_pdf(tiny_pdf)


def _docs_matching(docs_pdf: pd.DataFrame, term: str) -> set[int]:
    """First-principles match set: docs whose analyzed text contains
    ``term`` (same analyzer: lowercase, [a-z0-9_]+)."""
    m = docs_pdf["text"].str.lower().apply(lambda t: term in _TOK.findall(t))
    return set(docs_pdf.loc[m, "doc_id"].astype(int))


DEL_TERM = "w0300"  # mid-frequency synth term: deletes some, leaves many
QUERIES = ["w0000 w0005", "w0300 w0004", "w0002"]


def test_tombstone_era_serving(ix, docs_pdf):
    """After delete_by_query: deleted docs gone from top_k/bool/match_all/
    count, surviving docs keep BIT-IDENTICAL scores and relative order
    (Lucene deleted-docs statistics model)."""
    s = BM25Searcher(ix)
    big = ix.n_docs  # k large enough to capture every match
    pre = {q: s.top_k(q, k=big, with_meta=False).toPandas() for q in QUERIES}

    tombs = _docs_matching(docs_pdf, DEL_TERM)
    n = s.delete_by_query(DEL_TERM)
    assert n == len(tombs) > 0

    for q in QUERIES:
        post = s.top_k(q, k=big, with_meta=False).toPandas()
        exp = pre[q][~pre[q]["doc_id"].isin(tombs)].reset_index(drop=True)
        assert post["doc_id"].tolist() == exp["doc_id"].tolist(), q
        np.testing.assert_array_equal(
            post["score"].to_numpy(np.float32), exp["score"].to_numpy(np.float32)
        )
        assert post["rank"].tolist() == list(range(1, len(post) + 1))

    # filter-context surfaces see the same live set
    assert s.match_docs(DEL_TERM).count() == 0
    assert s.count("") == ix.n_docs - len(tombs)
    assert s.match_all(k=big, with_meta=False).count() == ix.n_docs - len(tombs)
    got_cs = set(
        r["doc_id"]
        for r in s.constant_score("w0004", k=big, with_meta=False).collect()
    )
    exp_cs = _docs_matching(docs_pdf, "w0004") - tombs
    assert got_cs == exp_cs

    # bool with must_not composes with tombstones
    bq = s.bool_query("w0002", must_not="w0005", k=big, with_meta=False).toPandas()
    assert not set(bq["doc_id"]).intersection(tombs)

    # compound surfaces (full-match-set + post-hoc exclusion)
    dm = s.dis_max(["w0002", "w0004"], k=big, with_meta=False).toPandas()
    assert not set(dm["doc_id"]).intersection(tombs)
    cv = s.conversations_topk("w0300", k=50)
    assert cv.count() == 0  # every matching turn is tombstoned


def test_delete_counts_accumulate(ix, docs_pdf):
    s = BM25Searcher(ix)
    t1 = _docs_matching(docs_pdf, DEL_TERM)
    t2 = _docs_matching(docs_pdf, "w0301")
    assert s.delete_by_query(DEL_TERM) == len(t1)
    assert s.delete_by_query(DEL_TERM) == 0  # idempotent re-delete
    assert s.delete_by_query("w0301") == len(t2 - t1)  # only NEWLY deleted
    assert s.count("") == ix.n_docs - len(t1 | t2)


def test_rollup_cascade(ix, docs_pdf, tiny_pdf):
    """Deleting only TURNS (doc_filter excludes rollups) still tombstones
    the affected conversations' rollup docs — the rollup's indexed text
    contains the deleted content."""
    s = BM25Searcher(ix)
    n_turns = len(tiny_pdf)
    turn_matches = {
        d for d in _docs_matching(docs_pdf, DEL_TERM) if d < n_turns
    }
    # rollup doc_ids are n_turns + rank(conv_id); recompute first-principles
    convs = sorted(tiny_pdf["conv_id"].unique())
    conv_rank = {c: i for i, c in enumerate(convs)}
    t = tiny_pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    conv_of_turn = t["conv_id"].to_numpy()
    cascaded = {
        n_turns + conv_rank[conv_of_turn[d]] for d in turn_matches
    }
    n = s.delete_by_query(DEL_TERM, doc_filter=F.col("is_rollup") == False)  # noqa: E712
    assert n == len(turn_matches | cascaded)
    # the rollups of affected conversations no longer serve
    live = set(r["doc_id"] for r in s.match_all(k=ix.n_docs, with_meta=False).collect())
    assert not live.intersection(cascaded)


def test_capped_surfaces_refuse_pending_deletes(ix):
    s = BM25Searcher(ix)
    s.delete_by_query(DEL_TERM)
    for call in [
        lambda: s.phrase_query("w0000 w0001"),
        lambda: s.phrase_prefix_query("w0000 w00"),
        lambda: s.span_first_query("w0000", end=3),
        lambda: s.match_synonyms("w0000", {"w0000": ["w0001"]}),
        lambda: s.top_k_batch(
            pd.DataFrame({"query_id": [0], "query_text": ["w0000"],
                          "k": [5], "mode": ["or"]})
        ),
    ]:
        with pytest.raises(ValueError, match="delete_by_query"):
            call()
    # explain: deleted doc raises, live doc still serves (tombstone-era stats)
    tomb_doc = s._deletes.limit(1).collect()[0]["doc_id"]
    with pytest.raises(ValueError, match="tombstoned"):
        s.explain_score("w0000", doc_id=int(tomb_doc))
    live_doc = s.top_k("w0000", k=1, with_meta=False).collect()[0]["doc_id"]
    assert s.explain_score("w0000", doc_id=int(live_doc)).count() > 0


def test_expunge_matches_live_corpus_oracle(spark, ix, docs_pdf):
    """expunge(): statistics recomputed over live docs; scoring matches a
    first-principles pandas oracle over the live corpus bit-for-bit
    (term_ids keep ascending-alphabetical order, so the accumulation
    order contract survives the rewrite)."""
    s = BM25Searcher(ix)
    tombs = _docs_matching(docs_pdf, DEL_TERM)
    s.delete_by_query(DEL_TERM)
    s2 = s.expunge()
    assert s2 is not s and s2.expunge() is s2  # no pending -> self

    live_pdf = docs_pdf[~docs_pdf["doc_id"].isin(tombs)].reset_index(drop=True)
    assert s2.ix.n_docs == len(live_pdf)
    assert abs(
        s2.ix.avgdl
        - np.mean([len(_TOK.findall(t.lower())) for t in live_pdf["text"]])
    ) < 1e-9

    # doc_ids preserved (external keys), tombstones physically gone
    got_ids = set(r["doc_id"] for r in s2.ix.docmap.select("doc_id").collect())
    assert got_ids == set(live_pdf["doc_id"].astype(int))

    oracle = PandasOracle(live_pdf, CFG)
    for q, mode in [("w0000 w0005", "or"), ("w0300 w0004", "or"),
                    ("w0002 w0004", "and"), ("w0300", "or")]:
        exp = oracle.top_k(q, k=50, mode=mode)
        got = s2.top_k(q, k=50, mode=mode, with_meta=False).toPandas()
        assert got["doc_id"].tolist() == exp["doc_id"].tolist(), (q, mode)
        np.testing.assert_array_equal(
            got["score"].to_numpy(np.float32), exp["score"].to_numpy(np.float32)
        )

    # dictionary statistics are LIVE: df('w0300') == 0 -> term gone
    assert (
        s2.ix.dictionary.filter(F.col("term") == DEL_TERM).count() == 0
    )
    df_w4 = s2.ix.dictionary.filter(F.col("term") == "w0004").collect()[0]["df"]
    assert df_w4 == len(_docs_matching(docs_pdf, "w0004") - tombs)

    # positions survive the rewrite: phrase serves again post-expunge
    assert s.ix.cfg.store_positions
    s2.phrase_query("w0000 w0001", k=5)  # must not raise


def test_delete_then_query_string(ix, docs_pdf):
    """query_string's generalized kernel masks tombstones in-kernel —
    the phrase escape hatch while deletes are pending."""
    s = BM25Searcher(ix)
    tombs = _docs_matching(docs_pdf, DEL_TERM)
    s.delete_by_query(DEL_TERM)
    hits = s.query_string('w0002 AND NOT w0005', k=ix.n_docs,
                          with_meta=False).toPandas()
    assert len(hits) > 0
    assert not set(hits["doc_id"]).intersection(tombs)


def test_discard_deletes_restores_full_view(ix):
    s = BM25Searcher(ix)
    n_full = s.count("")
    s.delete_by_query(DEL_TERM)
    assert s.count("") < n_full
    s.discard_deletes()
    assert s.count("") == n_full          # cancel path: full index again
    s.phrase_query("w0000 w0001", k=3)    # capped surfaces serve again
