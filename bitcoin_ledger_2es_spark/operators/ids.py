"""Stable, parallelism-invariant dense ID assignment (SURVEY.md C1).

The north star requires docIDs "assigned under stable (conv_id, turn_idx)
ordering" and an index identical at any parallelism. A naive
``row_number() OVER (ORDER BY ...)`` is a single-task global window — a
non-starter at 10^12 rows. Instead we compute a *distributed exclusive
prefix sum*:

    1. range-partition the rows by the key (global order across
       partitions), sort within partitions;
    2. a mapInArrow pass tags each row with its partition id and its local
       0-based rank + local exclusive cumsum of an optional value column;
    3. one cheap aggregate collects (count, sum) per partition (P rows);
    4. the driver cumsums those into per-partition offsets; a broadcast
       join adds them back.

The result equals the row's exact global rank / prefix sum under the total
key order — a pure function of the data, independent of partition
boundaries and core count (range partitioning guarantees partition p's keys
all sort before partition p+1's). The tagged frame is persisted between
the two passes so both see the same shuffle output; on a cluster use
MEMORY_AND_DISK (recomputation is only a determinism risk if the shuffle
itself is lost AND boundaries resample, which Spark's shuffle reuse
prevents).

Doc IDs use a two-level scheme so the heavy table is never persisted:
rank conversations once (one row per conversation), then
``doc_id = conv_offset + rank-within-conversation`` via a window bounded by
conversation length. The transcripts table is shuffled exactly once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel as SL

RANK_COL = "_rank"
PSUM_COL = "_psum"


def _tagger(value_col: str | None):
    def _tag(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        vacc = 0
        for batch in batches:
            import numpy as np

            n = batch.num_rows
            arrs = list(batch.columns)
            names = batch.schema.names + ["_pid", "_lrank"]
            arrs.append(pa.array(np.full(n, pid, dtype=np.int32)))
            arrs.append(pa.array(np.arange(seen, seen + n, dtype=np.int64)))
            if value_col is not None:
                v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
                csum = np.cumsum(v)
                local_excl = vacc + csum - v
                arrs.append(pa.array(local_excl))
                names.append("_lpsum")
                vacc += int(csum[-1]) if n else 0
            yield pa.RecordBatch.from_arrays(arrs, names=names)
            seen += n

    return _tag


def with_global_rank(
    df: DataFrame,
    key_cols: list[str],
    rank_col: str = RANK_COL,
    value_col: str | None = None,
    psum_col: str = PSUM_COL,
    num_partitions: int | None = None,
    return_totals: bool = False,
):
    """Add ``rank_col`` = 0-based global rank under key order, and (if
    ``value_col`` given) ``psum_col`` = exclusive prefix sum of that column
    in the same order. Keys should be a unique total order.

    With ``return_totals`` returns ``(df, {"rows": N, "value_sum": S})`` —
    the grand totals fall out of the per-partition stats collect for FREE
    (the offsets cumsum already computes them), saving callers a separate
    aggregation job over the frame."""
    spark = df.sparkSession
    p = num_partitions or max(spark.sparkContext.defaultParallelism, 2)
    # RangePartitioner SAMPLES its input (a full pass) before the shuffle
    # (a second pass): persist so the upstream aggregation runs once
    df = df.persist(SL.MEMORY_AND_DISK)
    keyed = df.repartitionByRange(p, *key_cols).sortWithinPartitions(*key_cols)
    extra = [T.StructField("_pid", T.IntegerType()), T.StructField("_lrank", T.LongType())]
    if value_col is not None:
        extra.append(T.StructField("_lpsum", T.LongType()))
    schema_out = T.StructType(list(keyed.schema.fields) + extra)
    tagged = keyed.mapInArrow(_tagger(value_col), schema=schema_out).persist(SL.MEMORY_AND_DISK)

    aggs = [F.count("*").alias("_n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("_vs"))
    stats = {r["_pid"]: r for r in tagged.groupBy("_pid").agg(*aggs).collect()}
    rows, racc, vacc = [], 0, 0
    for pid in sorted(stats):
        rows.append((int(pid), racc, vacc))
        racc += stats[pid]["_n"]
        vacc += stats[pid]["_vs"] or 0 if value_col is not None else 0
    off_df = spark.createDataFrame(rows, "_pid int, _roff long, _voff long")

    out = tagged.join(F.broadcast(off_df), "_pid").withColumn(
        rank_col, F.col("_roff") + F.col("_lrank")
    )
    if value_col is not None:
        out = out.withColumn(psum_col, F.col("_voff") + F.col("_lpsum"))
    out = out.drop("_pid", "_lrank", "_lpsum", "_roff", "_voff")
    if return_totals:
        return out, {"rows": int(racc), "value_sum": int(vacc)}
    return out


def conversation_offsets(transcripts: DataFrame, return_totals: bool = False):
    """Per-conversation (conv_id, n_turns, conv_rank, conv_offset):
    conv_offset = exclusive prefix sum of turn counts in conv_id order;
    conv_rank = dense 0-based conversation rank. One row per conversation,
    computed with map-side partial aggregation then the distributed
    prefix-sum above — no global single-task window anywhere.

    With ``return_totals``: (df, {"rows": n_convs, "value_sum": n_turns})."""
    sizes = transcripts.groupBy("conv_id").agg(F.count("*").alias("n_turns"))
    return with_global_rank(
        sizes, ["conv_id"], rank_col="conv_rank", value_col="n_turns",
        psum_col="conv_offset", return_totals=return_totals,
    )


def assign_doc_ids(transcripts: DataFrame, offsets: DataFrame | None = None) -> DataFrame:
    """Add stable dense ``doc_id`` under (conv_id, turn_idx) total order.

    doc_id = conv_offset(conv_id) + rank(turn_idx within conv). The window
    partition is a single conversation (<= dozens of rows), so there is no
    global-sort bottleneck; the transcripts table is shuffled once on
    conv_id for the window, and the join with the (1 row/conv) offsets table
    rides the same partitioning.
    """
    offs = (offsets or conversation_offsets(transcripts)).select("conv_id", "conv_offset")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        transcripts.join(offs, "conv_id")
        .withColumn("doc_id", (F.col("conv_offset") + F.row_number().over(w) - 1).cast("long"))
        .drop("conv_offset")
    )
