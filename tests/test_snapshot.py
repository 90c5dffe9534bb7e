"""Snapshot/restore integrity + alias registry + filtered aliases."""

import json
import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from bitcoin_ledger_2es_spark import BM25Searcher, build_index
from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.plans.build import read_index, write_index
from bitcoin_ledger_2es_spark.plans.snapshot import (
    MANIFEST,
    delete_alias,
    get_aliases,
    open_alias,
    put_alias,
    restore_snapshot,
    snapshot_index,
    verify_snapshot,
)

CFG = DEFAULT.with_(docs_per_shard=256, block_size=32)


@pytest.fixture(scope="module")
def ix_path(spark, tiny_df, tmp_path_factory):
    p = tmp_path_factory.mktemp("snap") / "ix"
    write_index(build_index(tiny_df, CFG), str(p))
    return p


def test_snapshot_verify_restore_roundtrip(spark, ix_path, tmp_path):
    snap = tmp_path / "snap1"
    mf = snapshot_index(str(ix_path), str(snap))
    assert mf and all("sha256" in v for v in mf.values())
    assert verify_snapshot(str(snap)) == mf
    # immutable: a committed snapshot refuses re-take
    with pytest.raises(FileExistsError):
        snapshot_index(str(ix_path), str(snap))

    dest = tmp_path / "restored"
    restore_snapshot(str(snap), str(dest))
    a = BM25Searcher(read_index(spark, str(ix_path), CFG))
    b = BM25Searcher(read_index(spark, str(dest), CFG))
    qa = a.top_k("w0001 w0005", k=20, with_meta=False).toPandas()
    qb = b.top_k("w0001 w0005", k=20, with_meta=False).toPandas()
    assert qa["doc_id"].tolist() == qb["doc_id"].tolist()
    assert qa["score"].tolist() == qb["score"].tolist()
    with pytest.raises(FileExistsError):
        restore_snapshot(str(snap), str(dest))
    restore_snapshot(str(snap), str(dest), overwrite=True)  # rename-aside path


def test_snapshot_detects_corruption_and_partial(ix_path, tmp_path):
    snap = tmp_path / "snap2"
    snapshot_index(str(ix_path), str(snap))
    victim = next(p for p in sorted(snap.rglob("*.parquet")) if p.is_file())
    victim.write_bytes(victim.read_bytes()[:-1] + b"\x00")
    with pytest.raises(ValueError, match="corrupt"):
        verify_snapshot(str(snap))
    with pytest.raises(ValueError, match="corrupt"):
        restore_snapshot(str(snap), str(tmp_path / "nope"))
    assert not (tmp_path / "nope").exists()

    # an uncommitted snapshot (no manifest — crash residue) is refused...
    snap3 = tmp_path / "snap3"
    snapshot_index(str(ix_path), str(snap3))
    (snap3 / MANIFEST).unlink()
    with pytest.raises(ValueError, match="manifest"):
        verify_snapshot(str(snap3))
    # ...and re-taking over it succeeds (replace residue, then commit)
    mf = snapshot_index(str(ix_path), str(snap3))
    assert verify_snapshot(str(snap3)) == mf

    # an extra unmanifested file is an integrity failure too
    (snap3 / "stray.parquet").write_bytes(b"x")
    with pytest.raises(ValueError, match="unmanifested"):
        verify_snapshot(str(snap3))


def test_alias_registry_swap_and_filter(spark, tiny_df, ix_path, tmp_path):
    root = tmp_path / "reg"
    put_alias(str(root), "live", str(ix_path))
    assert get_aliases(str(root))["live"]["path"] == str(ix_path)

    s = open_alias(spark, str(root), "live", CFG)
    base = BM25Searcher(read_index(spark, str(ix_path), CFG))
    got = s.top_k("w0001 w0005", k=10, with_meta=False).toPandas()
    ref = base.top_k("w0001 w0005", k=10, with_meta=False).toPandas()
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()

    # atomic swap to a second index (the zero-downtime reindex idiom)
    ix2 = tmp_path / "ix2"
    shutil.copytree(ix_path, ix2)
    put_alias(str(root), "live", str(ix2))
    assert get_aliases(str(root))["live"]["path"] == str(ix2)
    assert json.loads((root / "aliases.json").read_text())  # valid JSON on disk

    delete_alias(str(root), "live")
    with pytest.raises(KeyError):
        open_alias(spark, str(root), "live", CFG)
    with pytest.raises(KeyError):
        delete_alias(str(root), "live")


def test_filtered_alias_applies_everywhere(spark, ix_path, tmp_path):
    root = tmp_path / "reg2"
    put_alias(str(root), "turns", str(ix_path), doc_filter_sql="NOT is_rollup")
    s = open_alias(spark, str(root), "turns", CFG)
    base = BM25Searcher(read_index(spark, str(ix_path), CFG))

    # scored path: identical to an explicit doc_filter on a plain searcher
    got = s.top_k("w0001 w0005", k=25, with_meta=True).toPandas()
    ref = base.top_k(
        "w0001 w0005", k=25, with_meta=True, doc_filter=~F.col("is_rollup")
    ).toPandas()
    assert not got["is_rollup"].any()
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert got["score"].tolist() == ref["score"].tolist()

    # full-match compound path honors the filter (post-hoc, exact)
    dm = s.dis_max(["w0001", "w0005"], k=1_000_000, with_meta=False).toPandas()
    rollup_ids = set(
        r.doc_id for r in base.ix.docmap.filter("is_rollup").select("doc_id").collect()
    )
    assert not (set(dm["doc_id"].tolist()) & rollup_ids)

    # the shard-capped phrase family refuses rather than silently ignoring
    with pytest.raises(ValueError, match="filtered alias"):
        s.phrase_query(["w0001", "w0005"])
