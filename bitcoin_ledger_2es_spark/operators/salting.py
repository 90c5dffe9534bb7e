"""Explicit skew handling: salted aggregation / join (SURVEY.md C10).

The engine's primary head-term skew defense is architectural: postings are
sharded by contiguous doc_id range, so a head term occurring in 10^11
documents arrives as many bounded (shard, term) groups — no task ever
sees more than ``docs_per_shard`` postings of one term (operators/
postings.py). These utilities are the generic form of the same idea for
relational stages where a single group key is hot:

  * ``salted_sum_count`` — two-phase aggregation: partial agg on
    (key, salt), final agg on key. Use when map-side combine alone can't
    contain a hot key (e.g. high-cardinality secondary grouping).
  * ``salted_broadcast_left`` — replicate the small side per salt so a
    skewed big-side key spreads over ``n_salts`` tasks in the join.

Salts are deterministic (hash of a carried column), preserving the
engine-wide reproducibility contract. AQE's skew-join splitting stays
enabled as the runtime backstop (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, from_col: str, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n_salts) from an existing column's hash."""
    return df.withColumn(salt_col, F.pmod(F.xxhash64(F.col(from_col)), F.lit(n_salts)))


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """sum/count per key via two-phase salted aggregation.

    Phase 1 shuffles on (key, salt) — a hot key spreads over n_salts
    reducers; phase 2 merges n_salts partials per key (tiny)."""
    salt_src = salt_from or value_col
    partial = (
        with_salt(df, salt_src, n_salts)
        .groupBy(*key_cols, "_salt")
        .agg(F.sum(value_col).alias("_s"), F.count("*").alias("_c"))
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_s").alias(f"sum_{value_col}"), F.sum("_c").alias("count")
    )


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    salt_from: str | None = None,
) -> DataFrame:
    """Equi-join where ``big`` is skewed on ``on``: salt the big side,
    explode the small side across all salts, join on (key, salt)."""
    b = with_salt(big, salt_from or on, n_salts)
    s = small.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return b.join(s, [on, "_salt"]).drop("_salt")


def hot_keys(df: DataFrame, key_cols: list[str], min_count: int) -> DataFrame:
    """Exact hot-key detection (count >= min_count) — partial agg makes
    this one bounded shuffle; broadcast the result to route hot keys
    through the salted path and cold keys through the plain one."""
    return df.groupBy(*key_cols).agg(F.count("*").alias("n")).filter(F.col("n") >= min_count)
