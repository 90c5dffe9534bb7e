#!/usr/bin/env python
"""Per-phase build timing at $SPARK_GRAFT_CPUS to find non-scaling time."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from bitcoin_ledger_2es_spark.config import DEFAULT
    from bitcoin_ledger_2es_spark.operators.postings import (
        dictionary_from_blocks,
        finalize_blocks,
        spimi_blocks,
        with_shard,
    )
    from bitcoin_ledger_2es_spark.plans.build import tokenized_documents
    from bitcoin_ledger_2es_spark.session import get_spark
    from bitcoin_ledger_2es_spark.sources.transcripts import read_transcripts

    spark = get_spark("profile", cores=CPUS, shuffle_partitions=max(32, 2 * CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    tpath = str(REPO / ".cache" / "transcripts_n100000_s42.parquet")
    cfg = DEFAULT.with_(docs_per_shard=32768)

    t = {}
    t0 = time.monotonic()
    transcripts = read_transcripts(spark, tpath)
    n = transcripts.count()
    t["read_count"] = time.monotonic() - t0

    t0 = time.monotonic()
    docs, _ = tokenized_documents(transcripts, cfg)
    docs = docs.persist()
    n_docs = docs.count()
    t["ids_rollup_tokenize"] = time.monotonic() - t0

    t0 = time.monotonic()
    docmap = with_shard(docs.select("doc_id", "conv_id", "turn_idx", "doc_len", "is_rollup"), cfg)
    stats = docmap.agg(F.count("*"), F.avg("doc_len")).collect()[0]
    avgdl = float(stats[1])
    t["docmap_stats"] = time.monotonic() - t0

    t0 = time.monotonic()
    raw = spimi_blocks(docs.select("doc_id", "doc_len", "text"), cfg).persist()
    nb = raw.count()
    t["spimi_invert"] = time.monotonic() - t0

    t0 = time.monotonic()
    dictionary = dictionary_from_blocks(raw)
    nt = dictionary.count()
    t["dictionary_rank"] = time.monotonic() - t0

    t0 = time.monotonic()
    postings = finalize_blocks(raw, dictionary, n_docs, avgdl, cfg).persist()
    np_ = postings.count()
    t["finalize_blockmax"] = time.monotonic() - t0

    t0 = time.monotonic()
    dict_full = dictionary.join(
        postings.groupBy("term_id").agg(F.max("block_max_score").alias("max_score")),
        "term_id", "left",
    ).persist()
    dict_full.count()
    t["dict_maxscore"] = time.monotonic() - t0

    out = {"cpus": CPUS, "n_turns": n, "n_docs": n_docs, "n_blocks": nb, "n_terms": nt,
           "n_postrows": np_, "total": round(sum(t.values()), 2),
           **{k: round(v, 2) for k, v in t.items()}}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
