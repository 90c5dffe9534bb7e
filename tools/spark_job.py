"""spark-submit entry point for the engine (SURVEY.md §7 M8 packaging).

The north-rule deployment shape: the engine ships as a ``--py-files``
zip, the driver program is this file, and the cluster is whatever
``spark-submit`` was pointed at — the code contains no master/cores
assumptions (``SparkSession.builder.getOrCreate()`` adopts the submitted
conf; every partitioning decision keys off data-size knobs in
``EngineConfig``, not executor counts).

    cd <repo> && zip -qr /tmp/engine.zip bitcoin_ledger_2es_spark
    spark-submit --py-files /tmp/engine.zip tools/spark_job.py \
        build --input /data/transcripts --format iceberg \
        --index /data/ix --resume --positions

    spark-submit --py-files /tmp/engine.zip tools/spark_job.py \
        query --index /data/ix --q "spark shuffle join" --k 10

    spark-submit --py-files /tmp/engine.zip tools/spark_job.py \
        compact --root /data/nrt_root

Local smoke (same code path, local master):
    python tools/spark_job.py build --input .cache/transcripts_n1000_s42.parquet \
        --index /tmp/ix_smoke
Each command prints ONE JSON result line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

# local runs: the repo root provides the package; under spark-submit the
# --py-files zip does (and this insert is a harmless no-op)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from pyspark.sql import SparkSession

    return SparkSession.builder.appName("bitcoin-ledger-2es-spark").getOrCreate()


def _cfg(args):
    from bitcoin_ledger_2es_spark.config import DEFAULT

    kw = {}
    if args.docs_per_shard:
        kw["docs_per_shard"] = args.docs_per_shard
    if getattr(args, "positions", False):
        kw["store_positions"] = True
    return DEFAULT.with_(**kw) if kw else DEFAULT


def cmd_build(args) -> dict:
    from bitcoin_ledger_2es_spark.plans.build import build_index, write_index
    from bitcoin_ledger_2es_spark.plans.lineage import build_index_resumable
    from bitcoin_ledger_2es_spark.sources.transcripts import read_transcripts

    spark = _spark()
    cfg = _cfg(args)
    src = read_transcripts(spark, args.input, fmt=args.format)
    t0 = time.time()
    if args.resume:
        ix = build_index_resumable(spark, src, args.index, cfg)
    else:
        ix = build_index(src, cfg)
        write_index(ix, args.index)
    return {
        "cmd": "build",
        "index": args.index,
        "n_docs": ix.n_docs,
        "avgdl": round(ix.avgdl, 6),
        "resumable": bool(args.resume),
        "sec": round(time.time() - t0, 3),
    }


def cmd_query(args) -> dict:
    from bitcoin_ledger_2es_spark.plans.build import read_index
    from bitcoin_ledger_2es_spark.plans.query import BM25Searcher

    spark = _spark()
    s = BM25Searcher(read_index(spark, args.index))
    t0 = time.time()
    rows = s.top_k(args.q, k=args.k, mode=args.mode).collect()
    return {
        "cmd": "query",
        "q": args.q,
        "sec": round(time.time() - t0, 3),
        "hits": [
            {"rank": r["rank"], "doc_id": r["doc_id"],
             "score": float(r["score"]), "conv_id": r["conv_id"]}
            for r in rows
        ],
    }


def cmd_compact(args) -> dict:
    from bitcoin_ledger_2es_spark.streaming.incremental import compact

    spark = _spark()
    t0 = time.time()
    ix = compact(spark, args.root, _cfg(args))
    return {
        "cmd": "compact",
        "root": args.root,
        "n_docs": ix.n_docs,
        "sec": round(time.time() - t0, 3),
    }


def cmd_soft_delete(args) -> dict:
    """ES _delete_by_query over the NRT segment store, soft (sidecar
    tombstones, zero segment rewrites) by default; --physical runs the
    rename-aside segment rewrite instead."""
    from bitcoin_ledger_2es_spark.streaming.incremental import (
        delete_by_query,
        soft_delete_by_query,
    )

    spark = _spark()
    t0 = time.time()
    fn = delete_by_query if args.physical else soft_delete_by_query
    n = fn(spark, args.root, args.q, cfg=_cfg(args))
    return {
        "cmd": "delete-by-query",
        "root": args.root,
        "physical": bool(args.physical),
        "deleted": int(n),
        "sec": round(time.time() - t0, 3),
    }


def cmd_expunge(args) -> dict:
    """ES _forcemerge?only_expunge_deletes for the durable store:
    physically remove soft-deleted docs by rewriting ONLY the segments
    that hold tombstone sidecars."""
    from bitcoin_ledger_2es_spark.streaming.incremental import expunge_store

    spark = _spark()
    t0 = time.time()
    n = expunge_store(spark, args.root, _cfg(args))
    return {
        "cmd": "expunge",
        "root": args.root,
        "removed": int(n),
        "sec": round(time.time() - t0, 3),
    }


def cmd_snapshot(args) -> dict:
    from bitcoin_ledger_2es_spark.plans.snapshot import (
        restore_snapshot,
        snapshot_index,
        verify_snapshot,
    )

    t0 = time.time()
    if args.restore_to:
        restore_snapshot(args.snap, args.restore_to, overwrite=args.overwrite)
        action, n = "restore", len(verify_snapshot(args.snap))
    elif args.verify:
        action, n = "verify", len(verify_snapshot(args.snap))
    else:
        action, n = "snapshot", len(snapshot_index(args.index, args.snap))
    return {"cmd": "snapshot", "action": action, "files": n,
            "sec": round(time.time() - t0, 3)}


def cmd_alias(args) -> dict:
    from bitcoin_ledger_2es_spark.plans.snapshot import (
        delete_alias,
        get_aliases,
        put_alias,
    )

    if args.set:
        put_alias(args.root, args.name, args.set, doc_filter_sql=args.filter)
    elif args.delete:
        delete_alias(args.root, args.name)
    return {"cmd": "alias", "aliases": get_aliases(args.root)}


def cmd_rollover(args) -> dict:
    from bitcoin_ledger_2es_spark.plans.snapshot import rollover

    out = rollover(
        args.root, args.name,
        max_docs=args.max_docs, max_size_bytes=args.max_size_bytes,
        new_index_path=args.new_index, dry_run=args.dry_run,
    )
    return {"cmd": "rollover", **out}


def cmd_lifecycle(args) -> dict:
    from bitcoin_ledger_2es_spark.plans.snapshot import lifecycle_tick

    out = lifecycle_tick(
        args.root, args.name,
        max_docs=args.max_docs, max_size_bytes=args.max_size_bytes,
        retention_members=args.retention, delete_from_disk=args.delete,
    )
    return {"cmd": "lifecycle", **out}


def cmd_esql(args) -> dict:
    from bitcoin_ledger_2es_spark.plans.esql import esql

    spark = _spark()
    fmt = args.format
    tables = {}
    for spec in args.table:
        name, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"--table takes name=path, got {spec!r}")
        reader = spark.read.format(fmt)
        tables[name] = reader.load(path)
    t0 = time.time()
    rows = esql(args.q, tables).limit(args.max_rows).collect()
    return {
        "cmd": "esql",
        "sec": round(time.time() - t0, 3),
        "rows": [r.asDict(recursive=True) for r in rows],
    }


def cmd_ingest(args) -> dict:
    """Apply an ES ingest pipeline (a JSON list of processors — the
    PUT _ingest/pipeline body's `processors` array) to a table and
    write the transformed frame back out."""
    from bitcoin_ledger_2es_spark.functions.ingest import apply_pipeline

    spark = _spark()
    processors = json.loads(Path(args.pipeline).read_text())
    df = spark.read.format(args.format).load(args.input)
    t0 = time.time()
    out = apply_pipeline(df, processors)
    out.write.mode("overwrite").format(args.format).save(args.output)
    n = spark.read.format(args.format).load(args.output).count()
    return {
        "cmd": "ingest",
        "sec": round(time.time() - t0, 3),
        "processors": len(processors),
        "rows": n,
        "columns": spark.read.format(args.format).load(args.output).columns,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="spark_job.py", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (optionally resumable) index")
    b.add_argument("--input", required=True, help="transcripts table path")
    b.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    b.add_argument("--index", required=True, help="output index path")
    b.add_argument("--resume", action="store_true",
                   help="lineage-checkpointed build (resumes after failure)")
    b.add_argument("--positions", action="store_true",
                   help="store token positions (match_phrase support)")
    b.add_argument("--docs-per-shard", type=int, default=0)
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="BM25 top-k against an on-disk index")
    q.add_argument("--index", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--mode", default="or", choices=["or", "and"])
    q.add_argument("--docs-per-shard", type=int, default=0)
    q.set_defaults(fn=cmd_query)

    c = sub.add_parser("compact", help="merge NRT segments into one index")
    c.add_argument("--root", required=True)
    c.add_argument("--docs-per-shard", type=int, default=0)
    c.set_defaults(fn=cmd_compact)

    dq = sub.add_parser(
        "delete-by-query", help="soft (sidecar) or --physical delete over a segment store"
    )
    dq.add_argument("--root", required=True)
    dq.add_argument("--q", required=True)
    dq.add_argument("--physical", action="store_true")
    dq.add_argument("--docs-per-shard", type=int, default=0)
    dq.set_defaults(fn=cmd_soft_delete)

    ex = sub.add_parser("expunge", help="rewrite segments holding soft-delete sidecars")
    ex.add_argument("--root", required=True)
    ex.add_argument("--docs-per-shard", type=int, default=0)
    ex.set_defaults(fn=cmd_expunge)

    s = sub.add_parser("snapshot", help="take / verify / restore a snapshot")
    s.add_argument("--index", help="index path (when taking a snapshot)")
    s.add_argument("--snap", required=True, help="snapshot path")
    s.add_argument("--verify", action="store_true", help="verify only")
    s.add_argument("--restore-to", help="restore the snapshot to this path")
    s.add_argument("--overwrite", action="store_true")
    s.set_defaults(fn=cmd_snapshot)

    a = sub.add_parser("alias", help="list / set / delete index aliases")
    a.add_argument("--root", required=True, help="alias registry directory")
    a.add_argument("--name", help="alias name (for --set/--delete)")
    a.add_argument("--set", help="index path the alias should point at")
    a.add_argument("--filter", help="optional docmap predicate (filtered alias)")
    a.add_argument("--delete", action="store_true")
    a.set_defaults(fn=cmd_alias)

    r = sub.add_parser("rollover", help="ES _rollover an alias's write index")
    r.add_argument("--root", required=True, help="alias registry directory")
    r.add_argument("--name", required=True)
    r.add_argument("--max-docs", type=int, default=None)
    r.add_argument("--max-size-bytes", type=int, default=None)
    r.add_argument("--new-index", default=None)
    r.add_argument("--dry-run", action="store_true")
    r.set_defaults(fn=cmd_rollover)

    il = sub.add_parser("lifecycle", help="ILM tick: rollover + retention")
    il.add_argument("--root", required=True)
    il.add_argument("--name", required=True)
    il.add_argument("--max-docs", type=int, default=None)
    il.add_argument("--max-size-bytes", type=int, default=None)
    il.add_argument("--retention", type=int, default=None,
                    help="members to keep after the tick")
    il.add_argument("--delete", action="store_true",
                    help="rmtree retired members no alias references")
    il.set_defaults(fn=cmd_lifecycle)

    e = sub.add_parser("esql", help="run an ES|QL pipeline over tables")
    e.add_argument("--q", required=True, help="the ES|QL query string")
    e.add_argument("--table", action="append", required=True,
                   metavar="NAME=PATH", help="repeatable table binding")
    e.add_argument("--format", default="parquet")
    e.add_argument("--max-rows", type=int, default=100,
                   help="cap on rows collected to the driver")
    e.set_defaults(fn=cmd_esql)

    ig = sub.add_parser(
        "ingest", help="apply an ES ingest pipeline to a table")
    ig.add_argument("--pipeline", required=True,
                    help="path to a JSON file holding the processors array")
    ig.add_argument("--input", required=True)
    ig.add_argument("--output", required=True)
    ig.add_argument("--format", default="parquet")
    ig.set_defaults(fn=cmd_ingest)

    args = p.parse_args(argv)
    print(json.dumps(args.fn(args)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
