"""B17 generic rescore hook + B18 token-stream highlighter."""

import re

import numpy as np
import pytest

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.functions.highlight import with_highlight

CFG = DEFAULT.with_(docs_per_shard=128, block_size=32)


@pytest.fixture(scope="module")
def searcher(spark, tiny_df):
    return BM25Searcher(build_index(tiny_df, CFG))


def test_rescore_reranks_and_matches_pandas(searcher):
    q, k, window, qw, rw = "w0000 w0003", 5, 20, 1.0, 0.5

    def boost_late_turns(pdf):
        return pdf["turn_idx"].to_numpy(np.float64) * 0.01

    got = searcher.rescore_top_k(
        q, boost_late_turns, k=k, window=window, query_weight=qw, rescore_weight=rw
    ).toPandas()

    base = searcher.top_k(q, k=window, with_meta=True).toPandas()
    base["rescore_score"] = boost_late_turns(base)
    base["final_score"] = qw * base["score"].astype(np.float64) + rw * base["rescore_score"]
    base = base.sort_values(["final_score", "doc_id"], ascending=[False, True]).head(k)

    assert got["doc_id"].tolist() == base["doc_id"].tolist()
    np.testing.assert_allclose(got["final_score"], base["final_score"], rtol=0, atol=0)
    assert got["rank"].tolist() == list(range(1, len(got) + 1))
    # the hook actually changed the order vs plain BM25 (window > k)
    plain = searcher.top_k(q, k=k, with_meta=False).toPandas()
    assert got["doc_id"].tolist() != plain["doc_id"].tolist()


def test_rescore_window_defaults_to_k(searcher):
    got = searcher.rescore_top_k("w0000", lambda pdf: np.zeros(len(pdf)), k=3).toPandas()
    plain = searcher.top_k("w0000", k=3, with_meta=False).toPandas()
    # zero rescore + window=k -> same docs, same relative order
    assert got["doc_id"].tolist() == plain["doc_id"].tolist()


def test_highlight_wraps_all_and_only_hits(spark, tiny_df):
    terms = ["w0000", "w0003"]
    hits = spark.createDataFrame([(1, 0), (2, 1)], "rank int, doc_id long")
    from bitcoin_ledger_2es_spark.operators.ids import assign_doc_ids

    docs = assign_doc_ids(tiny_df).select("doc_id", "text")
    out = with_highlight(hits, docs, terms).toPandas().set_index("doc_id")
    src = {r["doc_id"]: r["text"] for r in docs.filter("doc_id < 2").collect()}
    for did, text in src.items():
        toks = re.findall(r"[a-z0-9_]+", text.lower())
        expect = " ".join(f"<em>{t}</em>" if t in terms else t for t in toks)
        assert out.loc[did, "highlighted"] == expect
        frag = out.loc[did, "fragment"]
        assert len(frag.split(" ")) <= 7
        hit_idx = next((i for i, t in enumerate(toks) if t in terms), None)
        if hit_idx is not None:
            assert "<em>" in frag


def test_phrase_highlight_semantics(spark):
    """Phrase-aware marking: only tokens inside an ordered occurrence get
    wrapped (stray single terms stay bare); wrong-order / too-short docs
    are absent; the fragment is the BEST 7-token window (most marked
    tokens; ties -> earliest), not the first hit."""
    import pandas as pd

    from bitcoin_ledger_2es_spark.functions.highlight import phrase_highlight

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "the data is here and the data is there with more data alone",
            "data the",
            "the data",
            "short the",
            "x y z the data q r s t u v the data w",
        ],
    }))
    out = {int(r["doc_id"]): r for r in phrase_highlight(docs, ["the", "data"]).collect()}
    assert set(out) == {0, 2, 4}  # 1 wrong order, 3 no occurrence
    r0 = out[0]
    assert r0["n_phrase_hits"] == 2
    # stray trailing 'data' NOT marked; both occurrences marked
    assert r0["highlighted"].endswith("with more data alone")
    assert r0["highlighted"].count("<em>") == 4
    # best fragment covers BOTH occurrences (4 marked tokens), not just 1st
    assert r0["fragment"] == (
        "<em>the</em> <em>data</em> is here and <em>the</em> <em>data</em>"
    )
    # windows can't cover both hits in doc 4 -> tie -> earliest window
    assert out[4]["fragment"].startswith("x y z <em>the</em> <em>data</em>")
    assert out[2]["n_phrase_hits"] == 1
