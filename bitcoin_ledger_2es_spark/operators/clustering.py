"""Dedup clustering: near-dup PAIRS -> connected components -> one
representative per cluster (the actionable "which doc to keep" output a
100 TB pipeline needs; MinHash/SimHash pair lists are not).

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce and
Beyond", ACM SoCC 2014), expressed as DataFrame joins/aggregations:

  * large-star: every node points its LARGER neighbors at its minimum
    neighborhood label;
  * small-star: every node points its smaller-or-equal neighbors (and
    itself) at that minimum;
  * iterate to fixpoint — O(log n) rounds, each round a bounded
    join + aggregation (no per-component state, no driver collect of
    edges), which is what makes it safe at 10^10+ edges where label
    propagation's O(diameter) rounds and GraphFrames' Pregel state are not.

Determinism: the fixpoint (each node -> component minimum) is unique, so
output is independent of parallelism and iteration internals. Lineage is
cut per round with localCheckpoint to keep plans bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(e: DataFrame) -> DataFrame:
    """Canonical undirected edge (u > v), self-loops removed, distinct."""
    return (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _checksum(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count("*").alias("n"), F.bit_xor(F.xxhash64("u", "v")).alias("h")
    ).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 30,
) -> DataFrame:
    """(doc_id, rep_id) for every node appearing in ``pairs``; ``rep_id`` =
    the component's minimum doc_id. Nodes absent from ``pairs`` are their
    own representative — join with the full id set downstream (see
    ``cluster_representatives``)."""
    e = _canon(
        pairs.select(
            F.col(a_col).cast("long").alias("u"), F.col(b_col).cast("long").alias("v")
        )
    ).localCheckpoint()
    if not e.take(1):
        return e.sparkSession.createDataFrame([], "doc_id long, rep_id long")

    prev = _checksum(e)
    converged = False
    for _ in range(max_iter):
        # ---- large-star: for each center u over its full (symmetric)
        # neighborhood, point every LARGER neighbor at m = min(N(u) ∪ {u})
        bi = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = bi.groupBy("u").agg(F.min("v").alias("mv"))
        ls = (
            bi.join(mins, "u")
            .withColumn("m", F.least("u", "mv"))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        e2 = _canon(ls)
        # ---- small-star: edges directed high->low; point every smaller
        # neighbor AND the center itself at the minimum neighbor
        mins2 = e2.groupBy("u").agg(F.min("v").alias("mv"))
        joined = e2.join(mins2, "u")
        ss = (
            joined.select(F.col("v").alias("u"), F.col("mv").alias("v"))
            .unionByName(joined.select("u", F.col("mv").alias("v")))
        )
        e = _canon(ss).localCheckpoint()
        cur = _checksum(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # emitting per-node min-neighbor labels from a non-fixpoint edge
        # set would be silently WRONG representatives on adversarial graphs
        raise RuntimeError(
            f"connected_components did not reach the star fixpoint within "
            f"max_iter={max_iter} rounds (expected O(log n)); raise max_iter"
        )
    # the (count, xor-hash) equality test could in principle terminate on a
    # hash collision — verify the fixpoint IS a star set: no node may
    # appear as both an edge source (u) and a target (v)
    if (
        e.select(F.col("v").alias("u"))
        .distinct()
        .join(e.select("u").distinct(), "u", "left_semi")
        .take(1)
    ):
        raise RuntimeError(
            "connected_components checksum converged on a non-star edge set "
            "(hash collision); rerun with a higher max_iter"
        )

    # fixpoint edges form stars (node -> component min); min() for safety
    labels = e.groupBy("u").agg(F.min("v").alias("rep_id")).select(
        F.col("u").alias("doc_id"), "rep_id"
    )
    roots = (
        e.select(F.col("v").alias("doc_id"))
        .distinct()
        .join(labels.select("doc_id"), "doc_id", "left_anti")
        .withColumn("rep_id", F.col("doc_id"))
    )
    return labels.unionByName(roots)


def cluster_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Every doc mapped to its cluster representative: (doc_id, rep_id,
    is_rep). Docs in no near-dup pair represent themselves. The "drop the
    dups" step is then ``filter(is_rep)`` — one broadcast-free left join."""
    comps = connected_components(pairs, a_col, b_col)
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(comps, "doc_id", "left")
        .withColumn("rep_id", F.coalesce("rep_id", "doc_id"))
        .withColumn("is_rep", F.col("rep_id") == F.col("doc_id"))
    )
