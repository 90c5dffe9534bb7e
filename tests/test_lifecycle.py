"""ILM-style lifecycle_tick: rollover + retention in one atomic pass,
disk deletes only after the registry commit and never for members other
aliases still reference."""

from pathlib import Path

import pytest

from bitcoin_ledger_2es_spark import build_index
from bitcoin_ledger_2es_spark.config import DEFAULT
from bitcoin_ledger_2es_spark.plans.build import write_index
from bitcoin_ledger_2es_spark.plans.snapshot import (
    get_aliases,
    lifecycle_tick,
    put_alias,
    put_alias_multi,
    write_index_of,
)
from bitcoin_ledger_2es_spark.sources.synth import (
    TRANSCRIPTS_DDL,
    gen_transcripts_pdf,
)

CFG = DEFAULT.with_(docs_per_shard=256, block_size=32)


@pytest.fixture()
def three_ix(spark, tmp_path):
    full = gen_transcripts_pdf(60, seed=21)
    convs = sorted(full["conv_id"].unique())
    paths = []
    for i in range(3):
        cs = convs[i * 20:(i + 1) * 20]
        df = spark.createDataFrame(full[full["conv_id"].isin(cs)], TRANSCRIPTS_DDL)
        p = str(tmp_path / f"logs-{i + 1:06d}")
        write_index(build_index(df, CFG), p)
        paths.append(p)
    return tmp_path, paths


def test_tick_requires_conditions(three_ix):
    root, paths = three_ix
    put_alias(str(root), "logs", paths[0])
    with pytest.raises(ValueError, match="max_docs or max_size"):
        lifecycle_tick(str(root), "logs", retention_members=2)


def test_tick_rolls_then_retires_and_deletes(three_ix):
    root, paths = three_ix
    reg = str(root)
    put_alias_multi(reg, "logs", paths, write=paths[2])
    out = lifecycle_tick(
        reg, "logs", max_docs=1, retention_members=2, delete_from_disk=True,
    )
    # rolled to logs-000004; retention 2 keeps [logs-000003(old write),
    # logs-000004(new write)] and retires the two oldest
    assert out["rolled_over"]
    ent = get_aliases(reg)["logs"]
    assert ent["indices"] == [paths[2], str(root / "logs-000004")]
    assert write_index_of(reg, "logs") == str(root / "logs-000004")
    assert sorted(out["removed"]) == sorted(paths[:2])
    assert sorted(out["deleted"]) == sorted(paths[:2])
    assert not Path(paths[0]).exists() and not Path(paths[1]).exists()


def test_tick_keeps_members_other_aliases_reference(three_ix):
    root, paths = three_ix
    reg = str(root)
    put_alias_multi(reg, "logs", paths, write=paths[2])
    put_alias(reg, "archive", paths[0])  # second alias pins the oldest
    out = lifecycle_tick(
        reg, "logs", max_docs=1, retention_members=2, delete_from_disk=True,
    )
    assert paths[0] in out["kept_referenced"] and Path(paths[0]).exists()
    assert paths[1] in out["deleted"] and not Path(paths[1]).exists()
    # retired from THIS alias regardless
    assert paths[0] not in get_aliases(reg)["logs"]["indices"]


def test_tick_condition_not_met_is_retention_only_noop(three_ix):
    root, paths = three_ix
    reg = str(root)
    put_alias_multi(reg, "logs", paths, write=paths[2])
    out = lifecycle_tick(reg, "logs", max_docs=10**9, retention_members=1)
    assert not out["rolled_over"]
    # retention still applies to the existing member list (write kept)
    assert get_aliases(reg)["logs"]["indices"] == [paths[2]]
    assert sorted(out["removed"]) == sorted(paths[:2])
    assert Path(paths[0]).exists()  # delete_from_disk not requested
