"""Index-content invariants (FIXTURES.md §4, BASELINE.json):

* docmap joined back to transcripts reproduces `text` exactly under stable
  (conv_id, turn_idx) ordering (per-turn text equality invariant);
* doc_len == analyzer token count;
* dictionary df/cf consistent with decoded postings; block maxes dominate
  member scores; blocks respect block_size and ascending doc ranges;
* the whole index (canonically sorted rows) is identical when built at
  different parallelism and from permuted input row order.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark import build_index
from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.functions.analyze import tokenize_series
from bitcoin_ledger_2es_spark.functions.bm25 import contrib, idf
from bitcoin_ledger_2es_spark.functions.codec import decode_doc_gaps, decode_tfs

CFG = DEFAULT.with_(docs_per_shard=256, block_size=32)


@pytest.fixture(scope="module")
def ix(spark, tiny_df):
    return build_index(tiny_df, CFG)


def test_per_turn_text_equality(ix, tiny_df):
    """North-star invariant: per-turn text equality under stable ordering."""
    joined = (
        ix.docmap.filter(~F.col("is_rollup"))
        .join(tiny_df, ["conv_id", "turn_idx"], "inner")
        .select("doc_id", "conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values("doc_id")
    )
    assert len(joined) == tiny_df.count()
    src = tiny_df.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert joined["text"].tolist() == src["text"].tolist()
    assert joined["doc_id"].tolist() == list(range(len(src)))


def test_doc_len_is_token_count(ix, tiny_df):
    dm = (
        ix.docmap.filter(~F.col("is_rollup"))
        .join(tiny_df, ["conv_id", "turn_idx"])
        .select("doc_id", "doc_len", "text")
        .toPandas()
    )
    expect = tokenize_series(dm["text"], CFG).str.len()
    np.testing.assert_array_equal(dm["doc_len"].to_numpy(), expect.to_numpy())


def test_postings_consistency(ix):
    post = ix.postings.toPandas()
    dic = ix.dictionary.toPandas().set_index("term_id")
    stats = ix.corpus_stats.collect()[0]
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]

    assert (post["n_docs"] <= CFG.block_size).all()
    assert (post["first_doc_id"] <= post["last_doc_id"]).all()

    # decode everything; df/cf must match dictionary, inlined dls must match
    # docmap doc_len, block max must dominate
    dl_map = ix.docmap.select("doc_id", "doc_len").toPandas().set_index("doc_id")["doc_len"]
    by_term: dict[int, int] = {}
    cf: dict[int, int] = {}
    for r in post.itertuples(index=False):
        docs = decode_doc_gaps(r.doc_id_deltas, r.first_doc_id, r.n_docs)
        tfs = decode_tfs(r.tfs)
        dls = decode_tfs(r.dls)
        assert docs[-1] == r.last_doc_id
        assert len(docs) == len(tfs) == len(dls) == r.n_docs
        assert (np.diff(docs) > 0).all()
        # all docs within the block's shard
        assert (docs // CFG.docs_per_shard == r.shard_id).all()
        np.testing.assert_array_equal(dls, dl_map.loc[docs].to_numpy())
        by_term[r.term_id] = by_term.get(r.term_id, 0) + r.n_docs
        cf[r.term_id] = cf.get(r.term_id, 0) + int(tfs.sum())
    for tid, n in by_term.items():
        assert dic.loc[tid, "df"] == n
        assert dic.loc[tid, "cf"] == cf[tid]


def test_block_max_dominates(ix):
    post = ix.postings.toPandas()
    dic = ix.dictionary.toPandas().set_index("term_id")
    dl_map = ix.docmap.select("doc_id", "doc_len").toPandas().set_index("doc_id")["doc_len"]
    stats = ix.corpus_stats.collect()[0]
    for r in post.sample(n=min(400, len(post)), random_state=0).itertuples(index=False):
        docs = decode_doc_gaps(r.doc_id_deltas, r.first_doc_id, r.n_docs)
        tfs = decode_tfs(r.tfs)
        t_idf = idf(float(dic.loc[r.term_id, "df"]), stats["n_docs"])
        sc = contrib(tfs, dl_map.loc[docs].to_numpy(), t_idf, stats["avgdl"], CFG.k1, CFG.b)
        assert (sc.astype(np.float32) <= np.float32(r.block_max_score)).all()
    # dictionary max_score = max over blocks
    mx = post.groupby("term_id")["block_max_score"].max()
    got = dic["max_score"].astype(np.float32)
    assert (got.loc[mx.index].to_numpy() == mx.to_numpy(np.float32)).all()


def _canon(ix):
    post = ix.postings.toPandas().sort_values(["term_id", "shard_id", "block_id"]).reset_index(drop=True)
    post["doc_id_deltas"] = post["doc_id_deltas"].apply(bytes)
    post["tfs"] = post["tfs"].apply(bytes)
    dic = ix.dictionary.toPandas().sort_values("term_id").reset_index(drop=True)
    dm = ix.docmap.toPandas().sort_values("doc_id").reset_index(drop=True)
    return post, dic, dm


def test_index_identical_across_parallelism_and_row_order(spark, tiny_pdf):
    from bitcoin_ledger_2es_spark.sources.synth import TRANSCRIPTS_DDL

    a = build_index(spark.createDataFrame(tiny_pdf, TRANSCRIPTS_DDL).coalesce(2), CFG)
    perm = tiny_pdf.sample(frac=1.0, random_state=123).reset_index(drop=True)
    b = build_index(spark.createDataFrame(perm, TRANSCRIPTS_DDL).repartition(16), CFG)
    for x, y in zip(_canon(a), _canon(b)):
        pd.testing.assert_frame_equal(x, y)
