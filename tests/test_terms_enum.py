"""ES _terms_enum: prefix enumeration over the dictionary with
search_after pagination."""

import pytest

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT

CFG = DEFAULT.with_(docs_per_shard=512, block_size=32)


@pytest.fixture(scope="module")
def searcher(spark, tiny_df):
    return BM25Searcher(build_index(tiny_df, CFG))


def test_prefix_asc_order_and_size(searcher):
    got = searcher.terms_enum("w00", size=5).toPandas()["term"].tolist()
    all_w00 = sorted(
        r["term"] for r in searcher.ix.dictionary
        .filter("term LIKE 'w00%'").collect()
    )
    assert got == all_w00[:5]


def test_search_after_pages_cover_everything(searcher):
    all_w00 = sorted(
        r["term"] for r in searcher.ix.dictionary
        .filter("term LIKE 'w00%'").collect()
    )
    pages, after = [], None
    while True:
        pg = searcher.terms_enum("w00", size=7, search_after=after).toPandas()["term"].tolist()
        if not pg:
            break
        pages.extend(pg)
        after = pg[-1]
    assert pages == all_w00


def test_case_sensitivity_mirrors_lowercased_index(searcher):
    assert searcher.terms_enum("W00", size=3).count() == 3  # folded
    assert searcher.terms_enum("W00", size=3, case_insensitive=False).count() == 0
