#!/usr/bin/env python
"""Executor-ISOLATED scaling point (VERDICT r4 Next-round #4): the KG
pipeline on `local-cluster[1,8,mem]` vs `local-cluster[4,8,mem]` —
separate executor JVMs with their OWN heaps, GC, and Python worker
pools, the closest in-sandbox analog of the north rule's N -> 4N
EXECUTOR regime (local[8] vs local[32] shares one JVM heap, so its
scaling residual conflates plan behavior with single-heap GC).

Each level runs in a fresh subprocess (a JVM cannot change master
mid-session). Same materialized corpus, same per-executor shape
(8 cores / fixed heap), only the executor COUNT varies. Steal-gated
like bench_scaling; event-log task decomposition itemizes executor
run/CPU/GC seconds per accepted window so the residual is attributable
(heap-local GC vs shared memory bandwidth vs scheduler).

Results appended to BENCH/BASELINE.md by hand (the md section quotes
this script's JSON verbatim); prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

N_CONVS = int(os.environ.get("SPARK_GRAFT_LC_CONVS", "1600000"))
RUNS = int(os.environ.get("SPARK_GRAFT_LC_RUNS", "2"))
MAX_ATTEMPTS = int(os.environ.get("SPARK_GRAFT_LC_ATTEMPTS", "5"))
STEAL_MAX = float(os.environ.get("SPARK_GRAFT_STEAL_MAX", "6"))
EXEC_CORES = int(os.environ.get("SPARK_GRAFT_LC_EXEC_CORES", "8"))
EXEC_MEM_MB = int(os.environ.get("SPARK_GRAFT_LC_EXEC_MB", "12288"))
LEVELS = (1, 4)  # N and 4N executors
N_FILES = int(os.environ.get("SPARK_GRAFT_SCALE_FILES", "256"))
CORPUS = f"/tmp/delm_lc_transcripts_{N_CONVS}_p{N_FILES}"
EVDIR = "/tmp/delm_lc_eventlogs"

from bench_util import parse_task_windows, steal_counters  # noqa: E402


def _ensure_corpus() -> None:
    if Path(CORPUS, "_SUCCESS").exists():
        return
    from delm_spark.data.synthetic import generate_transcripts
    from delm_spark.session import get_spark

    spark = get_spark(app_name="delm-lc-gen", cores=32)
    generate_transcripts(
        spark, n_convs=N_CONVS, n_hot=N_CONVS // 1000, partitions=N_FILES
    ).write.mode("overwrite").parquet(CORPUS)
    spark.stop()


def run_level(n_execs: int) -> dict:
    from pyspark.sql import SparkSession

    from delm_spark.data.synthetic import entity_dictionary, generate_transcripts  # noqa: F401
    from delm_spark.kg.pipeline import PipelineConfig, run_pipeline

    evdir = Path(EVDIR) / f"execs{n_execs}"
    evdir.mkdir(parents=True, exist_ok=True)
    total_cores = n_execs * EXEC_CORES
    spark = (
        SparkSession.builder.master(
            f"local-cluster[{n_execs},{EXEC_CORES},{EXEC_MEM_MB}]"
        )
        .appName(f"delm-lc-{n_execs}")
        .config("spark.executorEnv.PYTHONPATH", str(REPO))
        .config("spark.sql.shuffle.partitions", str(total_cores * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", str(evdir))
        .config("spark.eventLog.compress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tr = spark.read.parquet(CORPUS)
    n_turns = tr.count()
    # warmup (untimed): JIT, Python worker spin-up, page cache
    run_pipeline(spark, tr, entity_dictionary(spark), PipelineConfig()).edges.count()

    accepted, rejected, windows, n = [], [], [], 0
    for _ in range(MAX_ATTEMPTS):
        spark.catalog.clearCache()
        s0, t0c = steal_counters()
        w0 = int(time.time() * 1000)
        t0 = time.perf_counter()
        res = run_pipeline(spark, tr, entity_dictionary(spark), PipelineConfig())
        n = res.edges.count()
        wall = round(time.perf_counter() - t0, 1)
        w1 = int(time.time() * 1000)
        s1, t1c = steal_counters()
        steal = round((s1 - s0) / max(t1c - t0c, 1) * 100, 1)
        entry = {"wall_sec": wall, "steal_pct": steal}
        if steal <= STEAL_MAX:
            accepted.append(entry)
            windows.append((w0, w1))
        else:
            rejected.append(entry)
        if len(accepted) >= RUNS:
            break
    spark.stop()
    time.sleep(2)
    stats = [
        {k: w[k] for k in ("task_sec", "cpu_sec", "gc_sec", "n_tasks", "n_jobs")}
        for w in parse_task_windows(evdir, windows)
    ]
    for e, ts in zip(accepted, stats):
        e.update(ts)
    best = min((e["wall_sec"] for e in accepted), default=float("nan"))
    return {
        "n_execs": n_execs,
        "total_cores": total_cores,
        "accepted": accepted,
        "rejected": rejected,
        "best_sec": best,
        "n_triples": n,
        "n_turns": n_turns,
        "triples_per_sec": round(n / best, 1) if accepted else 0.0,
    }


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--level":
        print("LEVELJSON " + json.dumps(run_level(int(sys.argv[2]))))
        return
    _ensure_corpus()
    results = []
    env = dict(os.environ, PYTHONPATH=str(REPO))
    for n_execs in LEVELS:
        p = subprocess.run(
            [sys.executable, __file__, "--level", str(n_execs)],
            capture_output=True,
            text=True,
            env=env,
            cwd=str(REPO),
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("LEVELJSON ")]
        if not line:
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
            raise SystemExit(f"level {n_execs} failed")
        results.append(json.loads(line[-1][len("LEVELJSON "):]))
    low, high = results
    ratio = high["total_cores"] / low["total_cores"]
    eff = round(
        (high["triples_per_sec"] / low["triples_per_sec"]) / ratio, 3
    ) if low["triples_per_sec"] else 0.0
    print(
        json.dumps(
            {
                "metric": "lc_scaling",
                "n_convs": N_CONVS,
                "exec_cores": EXEC_CORES,
                "exec_mem_mb": EXEC_MEM_MB,
                "levels": results,
                "speedup": round(
                    high["triples_per_sec"] / low["triples_per_sec"], 2
                ) if low["triples_per_sec"] else 0.0,
                "scaling_efficiency": eff,
            }
        )
    )


if __name__ == "__main__":
    main()
