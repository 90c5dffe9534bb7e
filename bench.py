#!/usr/bin/env python
"""Headline benchmark (driver-run per round; also the local feedback loop).

Measures, at $SPARK_GRAFT_SF_DIR scale (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]:

  * index-build throughput over the deterministic synthetic transcripts
    corpus sized to the scale factor (FIXTURES.md: bench >= 10^5
    conversations at sf0.1) — the north-star metric (turns/sec);
  * BM25 top-k latency over the reference query set (p50/p95, warm);
  * a few headline relational/contract queries at the sf dir.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, ...extras}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = REPO / ".cache"


def _sf_from_dir(d: str) -> float:
    name = Path(d).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def corpus_path(n_conv: int) -> str:
    CACHE.mkdir(exist_ok=True)
    p = CACHE / f"transcripts_n{n_conv}_s42.parquet"
    if not p.exists():
        from bitcoin_ledger_2es_spark.sources.synth import write_transcripts_parquet

        write_transcripts_parquet(str(p), n_conv, seed=42)
    return str(p)


def _probe_host() -> dict:
    """Host-noise probe reading (tools/dram_probe.py): embedded in every
    recorded JSON so each run carries its own cleanliness evidence —
    steady <= ~0.35 s/iter means the numbers measure the engine, not a
    hypervisor noise window (BENCH/host_noise_r4.md)."""
    sys.path.insert(0, str(REPO / "tools"))
    try:
        from dram_probe import probe

        ts = probe(iters=4)
        return {"probe_iters_sec": ts, "probe_steady_sec": min(ts)}
    finally:
        sys.path.pop(0)


def main() -> None:
    sf = _sf_from_dir(SF_DIR)
    n_conv = max(200, int(1_000_000 * sf))
    host = {} if os.environ.get("BENCH_NO_PROBE") else _probe_host()

    t_gen0 = time.monotonic()
    tpath = corpus_path(n_conv)
    t_gen = time.monotonic() - t_gen0

    from bitcoin_ledger_2es_spark import BM25Searcher, build_index
    from bitcoin_ledger_2es_spark.config import DEFAULT
    from bitcoin_ledger_2es_spark.contract import QUERIES
    from bitcoin_ledger_2es_spark.session import get_spark
    from bitcoin_ledger_2es_spark.sources.synth import gen_query_set
    from bitcoin_ledger_2es_spark.sources.transcripts import read_transcripts

    # SPARK_GRAFT_TASK_CPUS caps CONCURRENT tasks (task.cpus=N on
    # local[CPUS] -> CPUS/N tasks at once) without touching index content:
    # this host's memory bandwidth saturates at ~8 memory-bound build
    # workers (BENCH/BASELINE.md dram_ceiling), so the build subprocess
    # below sets it; query stages keep full parallelism in THIS session.
    task_cpus = os.environ.get("SPARK_GRAFT_TASK_CPUS")
    spark = get_spark(
        "bench", cores=CPUS, shuffle_partitions=max(32, 2 * CPUS),
        extra={"spark.task.cpus": task_cpus} if task_cpus else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries: dict[str, float] = {}

    transcripts = read_transcripts(spark, tpath)
    n_turns = transcripts.count()

    # shards sized so the build/query fan out to ~2x cores at this corpus
    # size. SPARK_GRAFT_DPS pins the shard width explicitly — required for
    # scaling measurements (bench_scaling.py), where both parallelism
    # levels must build the IDENTICAL index (dps is content-affecting).
    docs_total_est = int(n_turns * 1.25)
    dps = int(
        os.environ.get("SPARK_GRAFT_DPS")
        or max(4096, 1 << (docs_total_est // (2 * CPUS)).bit_length())
    )
    cfg = DEFAULT.with_(docs_per_shard=dps)

    from bitcoin_ledger_2es_spark.plans.build import read_index, write_index

    ix_path = str(CACHE / f"ix_n{n_conv}_dps{dps}")
    build_only = bool(os.environ.get("BENCH_BUILD_ONLY"))
    # Full-bench runs build in a SUBPROCESS with task.cpus=CPUS//8
    # (-> ~CPUS/4 concurrent build tasks): the SPIMI build is memory-
    # bandwidth-bound and this host's DRAM ceiling sits at ~8 concurrent
    # memory-bound workers (measured: 76 s capped vs 119 s uncapped,
    # best-of-N, same index bytes — task.cpus is NOT content-affecting,
    # byte-identity across parallelism is pytest-pinned). Queries stay in
    # THIS session at full parallelism. bench_scaling.py calls the
    # BENCH_BUILD_ONLY path directly and is unaffected (no cap unless it
    # sets SPARK_GRAFT_TASK_CPUS itself).
    sub = None
    build_reps = int(os.environ.get("BENCH_BUILD_REPS", "2"))
    if not build_only and os.environ.get("BENCH_SUBPROCESS_BUILD", "1") != "0":
        import subprocess

        env = dict(os.environ)
        env.update({
            "BENCH_BUILD_ONLY": "1",
            "BENCH_NO_PROBE": "1",  # the parent already probed this run
            "BENCH_WRITE_INDEX": ix_path,
            "SPARK_GRAFT_DPS": str(dps),
            # target ~8 concurrent build workers (the DRAM ceiling):
            # task.cpus = CPUS/8, no cap at or below 8 cores
            "SPARK_GRAFT_TASK_CPUS": env.get(
                "SPARK_GRAFT_TASK_CPUS", str(max(1, CPUS // 8))
            ),
        })
        proc = subprocess.run(
            [sys.executable, str(REPO / "bench.py")],
            env=env, capture_output=True, text=True,
        )
        lines = [ln for ln in proc.stdout.splitlines() if ln.startswith('{"metric"')]
        if lines:
            sub = json.loads(lines[-1])
        else:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)

    if sub is not None:
        queries["index_build"] = sub["queries"]["index_build"]
        queries["index_write"] = sub["queries"]["index_write"]
        t_build = queries["index_build"]
        turns_per_sec = n_turns / t_build
    else:
        # best-of-N build: this host's run-to-run spread on identical code
        # is large (87 s vs 139 s at local[8] hours apart —
        # BENCH/BASELINE.md); min-of-repeats reports the engine, not the
        # neighbor noise
        t_build = float("inf")
        ix = None
        for _ in range(build_reps):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            ix = build_index(transcripts, cfg)
            ix.postings.count()  # force materialization (persisted)
            t_build = min(t_build, time.monotonic() - t0)
        queries["index_build"] = round(t_build, 3)
        turns_per_sec = n_turns / t_build

        # the write is part of the pipeline and is reported (index_write);
        # a pure build-only probe (bench_scaling.py) skips it unless the
        # parent asked for the index via BENCH_WRITE_INDEX
        if not build_only or os.environ.get("BENCH_WRITE_INDEX"):
            t0 = time.monotonic()
            write_index(ix, ix_path)
            queries["index_write"] = round(time.monotonic() - t0, 3)

        if build_only:
            out = {
                "metric": "index_build_sec",
                "value": round(t_build, 3),
                "unit": "sec",
                "queries": dict(queries),
                "sf": sf,
                "n_conv": n_conv,
                "n_turns": int(n_turns),
                "n_docs_indexed": ix.n_docs,
                "build_turns_per_sec": round(turns_per_sec, 1),
                "cpus": CPUS,
                **host,
            }
            print(json.dumps(out))
            spark.stop()
            return

    # serve queries from the PERSISTED index, the deployment shape: the
    # on-disk layout enables the partition-aligned zero-exchange scan
    # (auto-selected), measured 2.1x faster per query than the in-memory
    # groupBy path on this host.
    on_disk = read_index(spark, ix_path, cfg)
    searcher = BM25Searcher(on_disk)
    assert searcher.aligned, "expected the zero-exchange aligned path"
    qset = gen_query_set()
    reps = int(os.environ.get("BENCH_QUERY_REPS", "3"))
    lat: list[float] = []
    # warm-up pass (JVM/Arrow spin-up), then best-of-N per query: the host
    # shows +-50% run-to-run variance (BENCH/BASELINE.md), and min-of-N
    # reports the engine, not neighbor noise
    for q in qset.head(6).itertuples(index=False):
        searcher.top_k(q.query_text, k=int(q.k), mode=q.mode).collect()
    for q in qset.itertuples(index=False):
        best = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            searcher.top_k(q.query_text, k=int(q.k), mode=q.mode).collect()
            best = min(best, time.monotonic() - t0)
        lat.append(best)
        queries[f"bm25_q{int(q.query_id):02d}"] = round(best, 4)
    lat_sorted = sorted(lat)
    p50 = lat_sorted[len(lat) // 2]
    p95 = lat_sorted[min(len(lat) - 1, int(len(lat) * 0.95))]

    # ES _msearch analogue: ALL queries in ONE job (amortizes the per-query
    # Spark-job floor that dominates p50) — best-of-N wall time
    batch_pdf = qset[["query_id", "query_text", "k", "mode"]]
    t_batch = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        searcher.top_k_batch(batch_pdf).collect()
        t_batch = min(t_batch, time.monotonic() - t0)
    queries["bm25_msearch_all"] = round(t_batch, 4)

    # compound-query layer (round 4): dis_max / boosting / collapse over
    # the same on-disk aligned index — all-match subquery scoring + one
    # doc_id combine exchange (BENCH/PLANS.md), so these bound the cost of
    # the ES compound surface, not just single top-k. Same warm-up +
    # best-of-N discipline.
    q2 = [qset.iloc[0].query_text, qset.iloc[1].query_text]
    compound = {
        "dis_max": lambda: searcher.dis_max(
            q2, tie_breaker=0.3, k=10, with_meta=False).collect(),
        "boosting": lambda: searcher.boosting(
            q2[0], q2[1], negative_boost=0.5, k=10, with_meta=False).collect(),
        "collapse": lambda: searcher.collapse_topk(q2[0], k=10).collect(),
    }
    # round-5 session 3: the ES|QL FORK/FUSE hybrid — two scored MATCH
    # branches + rrf fusion; bounds the retriever-tree cost (two engine
    # scans + k-row fuse)
    from bitcoin_ledger_2es_spark.plans.esql import esql as _esql_run

    compound["esql_fork_fuse"] = lambda: _esql_run(
        'FROM ix METADATA _score'
        f' | FORK (WHERE MATCH(text, "{q2[0]}")'
        ' | SORT _score DESC, doc_id ASC | LIMIT 20)'
        f' (WHERE MATCH(text, "{q2[1]}")'
        ' | SORT _score DESC, doc_id ASC | LIMIT 20)'
        ' | FUSE | SORT _score DESC, doc_id ASC | LIMIT 10'
        ' | KEEP doc_id, _score',
        indexes={"ix": searcher}).collect()
    for name, fn in compound.items():
        fn()  # warm-up
        best = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        queries[name] = round(best, 4)

    # relational tail queries: same warm-up + best-of-N discipline as the
    # bm25 set — their single-shot timings showed phantom 3x regressions on
    # unchanged code under this host's +-50% run-to-run noise. Skipped when
    # the sf dir has no driver tables (e.g. a synthetic-corpus-only sf1
    # scale run): only these four read the sf parquet tables.
    if Path(SF_DIR).is_dir():
        for name in ("stats_agg", "join_revenue", "bm25_topk", "window_lag"):
            QUERIES[name](spark, SF_DIR).collect()  # warm-up
            best = float("inf")
            for _ in range(reps):
                t0 = time.monotonic()
                QUERIES[name](spark, SF_DIR).collect()
                best = min(best, time.monotonic() - t0)
            queries[name] = round(best, 3)

    total = sum(queries.values())
    out = {
        "metric": "index_build_plus_query_suite_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_conv": n_conv,
        "n_turns": int(n_turns),
        "n_docs_indexed": on_disk.n_docs,
        "build_turns_per_sec": round(turns_per_sec, 1),
        "query_p50_sec": round(p50, 4),
        "query_p95_sec": round(p95, 4),
        "msearch_all_sec": round(t_batch, 4),
        "msearch_per_query_sec": round(t_batch / max(1, len(lat)), 4),
        "query_reps": reps,
        "build_reps": build_reps,
        "cpus": CPUS,
        "gen_sec": round(t_gen, 3),
        **host,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
