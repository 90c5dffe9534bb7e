"""Multi-index search + ES _rollover over the alias registry."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.plans.build import read_index, write_index
from bitcoin_ledger_2es_spark.plans.multi import MultiSearcher
from bitcoin_ledger_2es_spark.plans.snapshot import (
    get_aliases,
    open_alias,
    put_alias,
    put_alias_multi,
    rollover,
    write_index_of,
)
from bitcoin_ledger_2es_spark.sources.synth import (
    TRANSCRIPTS_DDL,
    gen_transcripts_pdf,
)

CFG = DEFAULT.with_(docs_per_shard=256, block_size=32)


@pytest.fixture(scope="module")
def two_ix(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("multi")
    full = gen_transcripts_pdf(80, seed=11)
    convs = sorted(full["conv_id"].unique())
    paths = []
    for i, cs in enumerate([convs[:40], convs[40:]]):
        df = spark.createDataFrame(full[full["conv_id"].isin(cs)], TRANSCRIPTS_DDL)
        p = root / f"ix-{i:06d}"
        write_index(build_index(df, CFG), str(p))
        paths.append(str(p))
    return root, paths


def test_multi_top_k_merges_per_index_hits(spark, two_ix):
    root, paths = two_ix
    ss = {p: BM25Searcher(read_index(spark, p, CFG)) for p in paths}
    ms = MultiSearcher(ss)
    k = 15
    got = ms.top_k("w0001 w0005", k=k).toPandas()
    assert list(got["rank"]) == list(range(1, k + 1))
    # expected: union of per-index top-k, merged by (score, _index, doc_id)
    parts = []
    for p, s in ss.items():
        pdf = s.top_k("w0001 w0005", k=k).toPandas().drop(columns=["rank"])
        pdf["_index"] = p
        parts.append(pdf)
    exp = (
        pd.concat(parts)
        .sort_values(["score", "_index", "doc_id"], ascending=[False, True, True])
        .head(k)
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["_index"].tolist() == exp["_index"].tolist()
    assert np.array_equal(
        got["score"].to_numpy(np.float32), exp["score"].to_numpy(np.float32)
    )
    # _count across indexes = sum of member counts
    assert ms.count("w0001") == sum(s.count("w0001") for s in ss.values())


def test_multi_alias_open_and_filter(spark, two_ix):
    root, paths = two_ix
    reg = str(root)
    put_alias_multi(reg, "both", paths, doc_filter_sql="NOT is_rollup")
    s = open_alias(spark, reg, "both", CFG)
    assert isinstance(s, MultiSearcher)
    hits = s.top_k("w0001 w0005", k=20).toPandas()
    assert len(hits) == 20 and not hits["is_rollup"].any()
    # a missing non-write member must raise, never silently skip
    put_alias_multi(reg, "broken", [paths[0], str(root / "nope")],
                    write=paths[0])
    with pytest.raises(ValueError, match="missing on disk"):
        open_alias(spark, reg, "broken", CFG)


def test_rollover_conditions_and_atomic_swap(spark, two_ix, tiny_df):
    root, paths = two_ix
    reg = str(root)
    put_alias(reg, "live", paths[0])  # single form promotes on rollover
    # condition not met -> no-op, registry untouched
    out = rollover(reg, "live", max_docs=10**9)
    assert not out["rolled_over"] and "path" in get_aliases(reg)["live"]
    # dry_run never mutates even when met
    out = rollover(reg, "live", max_docs=1, dry_run=True)
    assert not out["rolled_over"] and out["conditions"]["max_docs"]
    assert "path" in get_aliases(reg)["live"]
    # met, but the auto-incremented target (ix-000001) is already a
    # WRITTEN index on disk -> refuse rather than adopt foreign data
    with pytest.raises(FileExistsError, match="already written"):
        rollover(reg, "live", max_docs=1)
    assert "path" in get_aliases(reg)["live"]  # refusal left registry intact
    # explicit fresh target -> rolls, single form promotes to multi
    out = rollover(reg, "live", max_docs=1,
                   new_index_path=str(root / "ix-fresh"))
    assert out["rolled_over"]
    ent = get_aliases(reg)["live"]
    assert ent["indices"] == [paths[0], str(root / "ix-fresh")]
    assert ent["write"] == str(root / "ix-fresh")


def test_rollover_lifecycle_end_to_end(spark, tmp_path):
    full = gen_transcripts_pdf(40, seed=13)
    convs = sorted(full["conv_id"].unique())
    df1 = spark.createDataFrame(full[full["conv_id"].isin(convs[:20])], TRANSCRIPTS_DDL)
    df2 = spark.createDataFrame(full[full["conv_id"].isin(convs[20:])], TRANSCRIPTS_DDL)
    reg = str(tmp_path)
    p1 = str(tmp_path / "logs-000001")
    write_index(build_index(df1, CFG), p1)
    put_alias(reg, "logs", p1)

    out = rollover(reg, "logs", max_docs=1)
    assert out["rolled_over"] and out["new_index"] == str(tmp_path / "logs-000002")
    ent = get_aliases(reg)["logs"]
    assert ent["indices"] == [p1, out["new_index"]]
    assert write_index_of(reg, "logs") == out["new_index"]

    # empty write index: alias still serves the old member alone
    s = open_alias(spark, reg, "logs", CFG)
    n_before = s.count("")
    assert n_before > 0

    # ingest into the write index, then the multi alias covers both
    write_index(build_index(df2, CFG), write_index_of(reg, "logs"))
    s2 = open_alias(spark, reg, "logs", CFG)
    assert isinstance(s2, MultiSearcher)
    assert s2.count("") > n_before
    hits = s2.top_k("w0001", k=10).toPandas()
    assert hits["_index"].nunique() >= 1 and len(hits) == 10

    # rolling again from the multi form keeps extending
    out2 = rollover(reg, "logs", max_docs=1)
    assert out2["rolled_over"] and out2["new_index"] == str(tmp_path / "logs-000003")
    assert get_aliases(reg)["logs"]["indices"][-1] == out2["new_index"]
    # refuse re-using an existing member or an already-written target
    with pytest.raises(FileExistsError):
        rollover(reg, "logs", new_index_path=p1)


def test_indices_boost_scales_scores_before_merge(spark, tiny_df):
    import numpy as np
    from bitcoin_ledger_2es_spark import BM25Searcher, build_index
    from bitcoin_ledger_2es_spark.config import DEFAULT
    from bitcoin_ledger_2es_spark.plans.multi import MultiSearcher

    cfg = DEFAULT.with_(docs_per_shard=128, block_size=32)
    s = BM25Searcher(build_index(tiny_df, cfg))
    ms = MultiSearcher({"a": s, "b": s})
    plain = ms.top_k("w0001", k=6, with_meta=False).toPandas()
    boosted = ms.top_k("w0001", k=6, with_meta=False,
                       indices_boost={"b": 2.0}).toPandas()
    # boost 2.0 on b: every b hit doubles (f32 of f64*2), a unchanged —
    # with identical members, the boosted index's hits now lead
    assert (boosted.iloc[0]["_index"], boosted.iloc[1]["_index"]) == ("b", "b")
    a_plain = plain[plain["_index"] == "a"].iloc[0]["score"]
    b_boost = boosted[boosted["_index"] == "b"].iloc[0]["score"]
    assert b_boost == np.float32(np.float64(a_plain) * 2.0)
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown indexes"):
        ms.top_k("w0001", indices_boost={"zzz": 2.0})
