"""Lineage + resumable index build (SURVEY.md C12/C13, north rule:
"resumable from checkpoint with per-partition lineage + metrics").

The build is decomposed into idempotent stages, each logged to an
append-only ``lineage`` parquet table:

    stage 'docmap'        partition_id = -1        (docmap + corpus_stats)
    stage 'dictionary'    partition_id = -1        (term dictionary, no max_score yet)
    stage 'postings'      partition_id = shard_id  (one row per committed shard)
    stage 'finalize'      partition_id = -1        (dictionary max_score, _SUCCESS)

Shards are committed in waves (cfg.n_waves Spark jobs); a killed build
re-run with the same arguments:

  * skips stages already COMPLETE in lineage;
  * recomputes the (deterministic) upstream frames;
  * anti-joins pending shards and builds only those;

yielding a byte-identical index to an uninterrupted build. Parquet job
commit makes each wave all-or-nothing: a wave that died mid-write left
only uncommitted temporary files, which resume clears.

Every lineage row carries rows_in/rows_out, a content checksum
(sum of xxhash64 over the shard's postings rows), attempt, and
started/finished timestamps — the per-partition metrics feed
(rows/sec per stage is derivable from the log; see plans/metrics.py).
"""

from __future__ import annotations

import shutil
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..operators.postings import (
    dictionary_from_blocks,
    finalize_blocks,
    spimi_blocks,
    with_shard,
)
from .build import (
    CORPUS_STATS_DDL,
    IndexFrames,
    cfg_from_stats_row,
    check_positions_budget,
    corpus_stats_row,
    read_index,
    tokenized_documents,
)

LINEAGE_DDL = (
    "partition_id int, stage string, status string, rows_in long, rows_out long, "
    "checksum string, attempt int, started_ts timestamp, finished_ts timestamp"
)


def _now():
    return datetime.now(timezone.utc)


def read_lineage(spark: SparkSession, path: str) -> DataFrame:
    p = Path(path) / "lineage"
    if p.exists() and any(p.glob("*.parquet")):
        return spark.read.parquet(str(p))
    return spark.createDataFrame([], LINEAGE_DDL)


def _log(spark: SparkSession, path: str, rows: list[tuple]) -> None:
    spark.createDataFrame(rows, LINEAGE_DDL).coalesce(1).write.mode("append").parquet(
        f"{path}/lineage"
    )


def _completed(lineage: DataFrame, stage: str) -> set[int]:
    return {
        r["partition_id"]
        for r in lineage.filter(
            (F.col("stage") == stage) & (F.col("status") == "COMPLETE")
        ).select("partition_id").distinct().collect()
    }


def _shard_checksums(postings_on_disk: DataFrame, shards: list[int]) -> dict[int, tuple[int, str]]:
    """(rows, checksum) per shard from the committed parquet — validates the
    write and produces the lineage checksum in one columnar pass. ``poss``
    joins the hash only when present, so partial indexes written before the
    positions stream existed still resume (their checksums stay stable)."""
    cols = ["term_id", "block_id", "first_doc_id", "last_doc_id",
            "n_docs", "doc_id_deltas", "tfs", "dls"]
    if "poss" in postings_on_disk.columns:
        cols.append("poss")
    rows = (
        postings_on_disk.filter(F.col("shard_id").isin(shards))
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64(*cols)).alias("h"),
        )
        .collect()
    )
    return {r["shard_id"]: (r["n"], format(r["h"] & (2**64 - 1), "016x")) for r in rows}


def build_index_resumable(
    spark: SparkSession,
    transcripts: DataFrame,
    path: str,
    cfg: EngineConfig = DEFAULT,
    _fail_after_wave: int | None = None,
    _fail_before_log: int | None = None,
) -> IndexFrames:
    """Build (or resume building) the on-disk index at ``path``.

    ``_fail_after_wave`` / ``_fail_before_log`` are test-only fault
    injection: raise after N committed waves (after / before the lineage
    append) to exercise the kill/resume/byte-identical contract on both
    sides of the commit point.
    """
    lineage = read_lineage(spark, path)

    # RESUME GUARD: a prior (partial) build persisted its content config in
    # corpus_stats at the docmap stage. Resuming with a DIFFERENT
    # content-affecting config (docs_per_shard, analyzer, block_size, ...)
    # would mix shards built under two configs into one index silently —
    # committed shards are skipped, pending ones rebuilt with the new cfg.
    # Fail loudly instead; execution-only knobs may differ freely.
    if -1 in _completed(lineage, "docmap"):
        row = spark.read.parquet(f"{path}/corpus_stats").collect()[0].asDict()
        persisted = cfg_from_stats_row(row, cfg)
        if persisted.content_key() != cfg.content_key():
            raise ValueError(
                "resume with a different content config than the original "
                f"build: persisted {persisted.content_key()} vs caller "
                f"{cfg.content_key()}. Finish the build with the original "
                "config, or delete the partial index to rebuild."
            )

    # clean any uncommitted temporary output from a killed wave
    tmp = Path(path) / "postings" / "_temporary"
    if tmp.exists():
        shutil.rmtree(tmp, ignore_errors=True)

    # reconcile the crash window BETWEEN parquet commit and lineage append:
    # a wave whose parquet job committed but whose lineage rows were never
    # written leaves on-disk shard dirs that still count as 'pending' — a
    # naive resume would re-append them, duplicating every posting block.
    # Lineage is the source of truth: delete any shard partition dir not
    # logged COMPLETE before rebuilding it.
    logged = _completed(lineage, "postings")
    pdir = Path(path) / "postings"
    if pdir.exists():
        for d in pdir.glob("shard_id=*"):
            try:
                sid = int(d.name.split("=", 1)[1])
            except ValueError:
                continue
            if sid not in logged:
                shutil.rmtree(d, ignore_errors=True)

    # ---- deterministic upstream (recomputed on resume; pure function of input)
    src = transcripts.repartition(
        spark.sparkContext.defaultParallelism * 2, "conv_id"
    ).persist()
    docs, _ = tokenized_documents(src, cfg)
    docs = docs.persist()
    docmap = with_shard(docs.select("doc_id", "conv_id", "turn_idx", "doc_len", "is_rollup"), cfg)
    rows_in = src.count()
    n_docs, avgdl, max_dl = docmap.agg(
        F.count("*"), F.avg("doc_len"), F.max("doc_len")
    ).collect()[0]
    n_docs, avgdl = int(n_docs), float(avgdl or 0.0)
    check_positions_budget(cfg, int(max_dl or 0))
    src.unpersist()

    # ---- stage: docmap + corpus_stats
    if -1 not in _completed(lineage, "docmap"):
        t0 = _now()
        docmap.repartition("shard_id").sortWithinPartitions("doc_id").write.mode(
            "overwrite"
        ).partitionBy("shard_id").parquet(f"{path}/docmap")
        spark.createDataFrame(
            [corpus_stats_row(n_docs, avgdl, cfg)], CORPUS_STATS_DDL
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/corpus_stats")
        _log(spark, path, [(-1, "docmap", "COMPLETE", rows_in, n_docs, "", 1, t0, _now())])

    # ---- stage: dictionary (term ids + df/cf; max_score comes at finalize)
    raw_blocks = spimi_blocks(docs.select("doc_id", "doc_len", "text"), cfg).persist()
    if -1 not in _completed(lineage, "dictionary"):
        t0 = _now()
        dictionary = dictionary_from_blocks(raw_blocks)
        dictionary.write.mode("overwrite").parquet(f"{path}/dictionary_base")
        n_terms = spark.read.parquet(f"{path}/dictionary_base").count()
        _log(spark, path, [(-1, "dictionary", "COMPLETE", n_docs, n_terms, "", 1, t0, _now())])
    dictionary = spark.read.parquet(f"{path}/dictionary_base")

    # ---- stage: postings, in waves of shards
    all_shards = list(range((max(n_docs - 1, 0) // cfg.docs_per_shard) + 1))
    done = _completed(read_lineage(spark, path), "postings")
    pending = [s for s in all_shards if s not in done]
    if pending:
        waves = max(1, min(cfg.n_waves, len(pending)))
        chunk = -(-len(pending) // waves)
        for w in range(waves):
            wave_shards = pending[w * chunk : (w + 1) * chunk]
            if not wave_shards:
                break
            t0 = _now()
            wave_df = raw_blocks.filter(F.col("shard_id").isin(wave_shards))
            finalize_blocks(wave_df, dictionary, n_docs, avgdl, cfg).repartition(
                "shard_id"
            ).sortWithinPartitions("term_id", "block_id").write.mode("append").partitionBy(
                "shard_id"
            ).parquet(f"{path}/postings")
            if _fail_before_log is not None and w + 1 >= _fail_before_log:
                raw_blocks.unpersist()
                docs.unpersist()
                raise RuntimeError(f"injected failure before logging wave {w + 1}")
            sums = _shard_checksums(spark.read.parquet(f"{path}/postings"), wave_shards)
            t1 = _now()
            _log(
                spark,
                path,
                [
                    (int(s), "postings", "COMPLETE", -1, int(sums.get(s, (0, ""))[0]),
                     sums.get(s, (0, ""))[1], 1, t0, t1)
                    for s in wave_shards
                ],
            )
            if _fail_after_wave is not None and w + 1 >= _fail_after_wave:
                raw_blocks.unpersist()
                docs.unpersist()
                raise RuntimeError(f"injected failure after wave {w + 1}")
    raw_blocks.unpersist()

    # ---- stage: finalize (dictionary max_score over committed postings)
    if -1 not in _completed(read_lineage(spark, path), "finalize"):
        t0 = _now()
        postings = spark.read.parquet(f"{path}/postings")
        dict_full = dictionary.join(
            postings.groupBy("term_id").agg(F.max("block_max_score").alias("max_score")),
            "term_id",
            "left",
        ).select("term", "term_id", "df", "cf", "max_score")
        p = spark.sparkContext.defaultParallelism
        dict_full.repartitionByRange(p, "term").sortWithinPartitions("term").write.mode(
            "overwrite"
        ).parquet(f"{path}/dictionary")
        _log(spark, path, [(-1, "finalize", "COMPLETE", -1, -1, "", 1, t0, _now())])

    docs.unpersist()
    ix = read_index(spark, path, cfg)
    ix.cfg = cfg  # keep caller's full config (k1/b already round-trip)
    return ix
