"""Connected-components dedup clustering vs a python union-find reference:
transitive chains, multiple components, singletons, determinism across
input partitioning, and log-round convergence on a long chain."""

import numpy as np
import pandas as pd
import pytest

from bitcoin_ledger_2es_spark.operators.clustering import (
    cluster_representatives,
    connected_components,
)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # compress to component MIN (find roots are mins by construction above)
    return {x: find(x) for x in parent}


def _run(spark, pairs, partitions=None):
    pdf = pd.DataFrame(pairs, columns=["doc_a", "doc_b"])
    df = spark.createDataFrame(pdf)
    if partitions:
        df = df.repartition(partitions)
    out = connected_components(df).toPandas()
    return dict(zip(out["doc_id"], out["rep_id"]))


def test_transitive_chain(spark):
    got = _run(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_matches_union_find_random_graph(spark):
    rng = np.random.default_rng(7)
    pairs = [tuple(sorted(map(int, rng.integers(0, 200, 2)))) for _ in range(300)]
    pairs = [(a, b) for a, b in pairs if a != b]
    exp = _union_find(pairs)
    got = _run(spark, pairs)
    assert got == exp


def test_long_chain_converges(spark):
    """A 150-node path graph: label propagation would need 150 rounds;
    star-contraction must finish within the O(log n) iteration budget."""
    pairs = [(i, i + 1) for i in range(150)]
    got = _run(spark, pairs)
    assert set(got.values()) == {0}
    assert len(got) == 151


def test_partitioning_invariance(spark):
    pairs = [(i, i + 1) for i in range(0, 60, 2)] + [(i, i + 30) for i in range(0, 30, 3)]
    a = _run(spark, pairs, partitions=1)
    b = _run(spark, pairs, partitions=16)
    assert a == b == _union_find(pairs)


def test_cluster_representatives_includes_singletons(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4, 5, 6]})
    )
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": [1, 2], "doc_b": [2, 3]})
    )
    out = cluster_representatives(docs, pairs).toPandas().set_index("doc_id")
    assert out.loc[1, "rep_id"] == 1 and out.loc[1, "is_rep"]
    assert out.loc[2, "rep_id"] == 1 and not out.loc[2, "is_rep"]
    assert out.loc[3, "rep_id"] == 1
    for d in (4, 5, 6):  # never paired -> own representative
        assert out.loc[d, "rep_id"] == d and out.loc[d, "is_rep"]
    # "drop the dups" view keeps exactly one doc per cluster
    kept = out[out["is_rep"]].index.tolist()
    assert sorted(kept) == [1, 4, 5, 6]


def test_empty_pairs(spark):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(pairs).count() == 0


def test_connected_components_raises_without_convergence(spark):
    """Exhausting max_iter before the star fixpoint must RAISE, never
    silently emit per-node min-neighbor labels (wrong representatives on
    adversarial graphs)."""
    import pandas as pd

    chain = spark.createDataFrame(
        pd.DataFrame({"doc_a": list(range(0, 40)), "doc_b": list(range(1, 41))})
    )
    with pytest.raises(RuntimeError, match="did not reach the star fixpoint"):
        connected_components(chain, max_iter=1)
    # with enough rounds the same graph converges fine
    out = connected_components(chain, max_iter=30).toPandas()
    assert (out["rep_id"] == 0).all()
