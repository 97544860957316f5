#!/usr/bin/env python
"""Scaling-efficiency evidence: run the KG pipeline at two parallelism
levels (local[4] vs local[16] by default — an N vs 4N pair that stays
below this box's ~16-core memory-bandwidth saturation knee, so it models
the north rule's add-executors regime where each executor brings its own
memory channels; see BENCH/BASELINE.md's round-5 two-pair account. The
saturated-socket pair is reachable via SPARK_GRAFT_SCALE_LOW=8
SPARK_GRAFT_SCALE_HIGH=32) on the same materialized input and report
throughput at both plus efficiency = (thr_high / thr_low) / (high / low).

Methodology (results written to BENCH/BASELINE.md):
  * STEAL-GATED acceptance: this Firecracker VM shows 0-35% host CPU steal
    fluctuating minute to minute; a run only counts if its interval steal
    is <= SPARK_GRAFT_STEAL_MAX (default 6%). Up to MAX_ATTEMPTS runs per
    level until RUNS accepted.
  * Best-of-accepted wall time per level.
  * Event-log task-time decomposition: every run's window is matched
    against SparkListenerTaskEnd events, giving the distributed work
    (executor run/CPU/GC seconds, task and job counts) behind each wall
    time — wall ~= cpu_sec / cores + overhead, itemizing what does not
    scale (driver/scheduler time, GC, steal).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import date
from pathlib import Path

REPO = Path(__file__).resolve().parent
N_CONVS = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "3200000"))
RUNS = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3"))
MAX_ATTEMPTS = int(os.environ.get("SPARK_GRAFT_SCALE_ATTEMPTS", "7"))
STEAL_MAX = float(os.environ.get("SPARK_GRAFT_STEAL_MAX", "6"))
LOW = int(os.environ.get("SPARK_GRAFT_SCALE_LOW", "4"))
HIGH = int(os.environ.get("SPARK_GRAFT_SCALE_HIGH", "16"))
#: corpus written as 256 files and scanned with 4m splits -> ~256 map
#: tasks: 8 waves at 32 cores, so a straggler (hot conversation) costs a
#: fraction of a wave, not half the run (66 tasks = 2 waves measured a
#: 60s max task bounding the 32-core wall)
N_FILES = int(os.environ.get("SPARK_GRAFT_SCALE_FILES", "256"))
CORPUS = f"/tmp/delm_scaling_transcripts_{N_CONVS}_p{N_FILES}"
EVDIR = "/tmp/delm_scaling_eventlogs"


from bench_util import parse_task_windows, steal_counters  # noqa: E402


def parse_event_log(app_dir: Path, windows: list) -> list:
    """Thin wrapper over bench_util.parse_task_windows keeping this
    report's historical field subset."""
    return [
        {k: w[k] for k in ("task_sec", "cpu_sec", "gc_sec", "n_tasks", "n_jobs")}
        for w in parse_task_windows(app_dir, windows)
    ]


def run_level(cores: int) -> dict:
    sys.path.insert(0, str(REPO))
    from delm_spark.data.synthetic import entity_dictionary, generate_transcripts
    from delm_spark.kg.pipeline import PipelineConfig, run_pipeline
    from delm_spark.session import get_spark

    evdir = Path(EVDIR) / f"cores{cores}"
    evdir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(
        app_name=f"delm-scaling-{cores}",
        cores=cores,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": str(evdir),
            "spark.eventLog.compress": "false",
            "spark.sql.files.maxPartitionBytes": "4m",
        },
    )
    spark.range(100_000).count()
    if not Path(CORPUS, "_SUCCESS").exists():
        # many output files: parquet row groups are indivisible scan units,
        # so a corpus written from few partitions caps downstream map
        # parallelism no matter what maxPartitionBytes says
        generate_transcripts(
            spark, n_convs=N_CONVS, n_hot=N_CONVS // 1000, partitions=N_FILES
        ).write.mode("overwrite").parquet(CORPUS)
    tr = spark.read.parquet(CORPUS)
    n_turns = tr.count()
    # no-op mode (SPARK_GRAFT_SCALE_NOOP): identical plan, trivial Arrow
    # kernel — measures how the PLAN scales when the Python kernel's
    # memory-bandwidth ceiling is removed from the equation
    backend = None
    if os.environ.get("SPARK_GRAFT_SCALE_NOOP"):
        from delm_spark.data.synthetic import TRIPLE_SCHEMA_CFG
        from delm_spark.extraction.backend import NoOpExtractor
        from delm_spark.schemas.spec import spec_from_dict

        backend = NoOpExtractor(spec_from_dict(TRIPLE_SCHEMA_CFG))

    # warmup run (untimed): JIT + page cache
    run_pipeline(
        spark, tr, entity_dictionary(spark), PipelineConfig(), backend=backend
    ).edges.count()

    accepted, rejected, windows, n = [], [], [], 0
    for _ in range(MAX_ATTEMPTS):
        spark.catalog.clearCache()
        s0, t0c = steal_counters()
        w0 = int(time.time() * 1000)
        t0 = time.perf_counter()
        res = run_pipeline(
            spark, tr, entity_dictionary(spark), PipelineConfig(), backend=backend
        )
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
    time.sleep(2)  # let the event log flush/close
    task_stats = parse_event_log(evdir, windows)
    for e, ts in zip(accepted, task_stats):
        e.update(ts)
    best = min((e["wall_sec"] for e in accepted), default=float("nan"))
    best_entry = min(accepted, key=lambda e: e["wall_sec"]) if accepted else {}
    return {
        "cores": cores,
        "accepted": accepted,
        "rejected": rejected,
        "best_sec": best,
        "best": best_entry,
        "n_triples": n,
        "n_turns": n_turns,
        "triples_per_sec": round(n / best, 1) if accepted else 0.0,
    }


def _control_cpu_work(_):
    """Pure register/L1 compute: sha256 over a 4 KB buffer."""
    import hashlib

    buf = b"x" * 4096
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 6.0:
        for _ in range(200):
            hashlib.sha256(buf).digest()
        n += 200
    return n


def _control_kernel_work(_):
    """The ACTUAL Arrow extraction kernel, isolated from Spark."""
    import random

    sys.path.insert(0, str(REPO))
    from delm_spark.data.synthetic import TRIPLE_SCHEMA_CFG
    from delm_spark.extraction.backend import RuleTripleExtractor
    from delm_spark.extraction.extract import _extract_series
    from delm_spark.schemas.spec import spec_from_dict

    spec = spec_from_dict(TRIPLE_SCHEMA_CFG)
    be = RuleTripleExtractor(spec)
    rnd = random.Random(1)
    names = ["Alice Smith", "Bob Jones", "Carol Wu", "Dan Brown"]
    orgs = ["Acme Corp", "Globex Inc", "Initech"]
    texts = [
        f"{rnd.choice(names)} works at {rnd.choice(orgs)}. the weather was "
        f"nice that day. {rnd.choice(names)} reports to {rnd.choice(names)}."
        for _ in range(2000)
    ]
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 8.0:
        _extract_series(texts, spec, be, 0)
        n += len(texts)
    return n


def run_controls() -> dict:
    """Spark-free hardware-ceiling controls at the same two worker counts:
    (a) pure register/L1 compute (sha256 over a 4 KB buffer) — what the
    host's vCPUs can deliver at all; (b) the ACTUAL Arrow extraction kernel
    (pandas extractall + cleaning) — the pipeline's Python stage, isolated
    from Spark. Their scaling efficiencies bound what any plan can reach."""
    from multiprocessing import Pool

    out = {}
    for name, fn in (
        ("pure_compute_sha256", _control_cpu_work),
        ("extraction_kernel", _control_kernel_work),
    ):
        r = {}
        for w in (LOW, HIGH):
            with Pool(w) as p:
                r[w] = sum(p.map(fn, range(w)))
        out[name] = {
            "low_ops": r[LOW],
            "high_ops": r[HIGH],
            "scaling_x": round(r[HIGH] / r[LOW], 2),
            "efficiency": round(r[HIGH] / r[LOW] / (HIGH / LOW), 2),
        }
    return out


def main() -> None:
    if os.environ.get("SPARK_GRAFT_SCALE_CHILD"):
        print(json.dumps(run_level(int(os.environ["SPARK_GRAFT_SCALE_CHILD"]))))
        return
    results = {}
    for cores in (LOW, HIGH):
        # per-level JSON snapshots make the sweep resumable: a hung or
        # killed level can be retried alone (local-mode runs occasionally
        # wedge on this VM) without redoing the other level
        snap = Path(f"/tmp/delm_scaling_level_{N_CONVS}_{cores}.json")
        if snap.exists() and not os.environ.get("SPARK_GRAFT_SCALE_FRESH"):
            results[cores] = json.loads(snap.read_text())
            continue
        out = subprocess.run(
            [sys.executable, str(REPO / "bench_scaling.py")],
            env=dict(os.environ, SPARK_GRAFT_SCALE_CHILD=str(cores)),
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        snap.write_text(line)
    lo, hi = results[LOW], results[HIGH]
    ratio = HIGH / LOW
    eff = (hi["triples_per_sec"] / lo["triples_per_sec"]) / ratio if lo["triples_per_sec"] else 0
    controls = run_controls()
    raw_json = json.dumps(
        {str(k): v for k, v in results.items()} | {"controls": controls}, indent=2
    )

    def row(r):
        b = r.get("best", {})
        walls = [e["wall_sec"] for e in r["accepted"]]
        steals = [e["steal_pct"] for e in r["accepted"]]
        return (
            f"| local[{r['cores']}] | {r['best_sec']} | {r['triples_per_sec']} | "
            f"{walls} | {steals} | {b.get('task_sec', '-')} | {b.get('cpu_sec', '-')} | "
            f"{b.get('gc_sec', '-')} | {b.get('n_tasks', '-')} | {b.get('n_jobs', '-')} |"
        )

    lo_b, hi_b = lo.get("best", {}), hi.get("best", {})
    decomposition = ""
    if lo_b.get("cpu_sec") and hi_b.get("cpu_sec"):
        lo_ideal = lo_b["cpu_sec"] / LOW
        hi_ideal = hi_b["cpu_sec"] / HIGH
        decomposition = f"""
## Task-time decomposition (best accepted run per level)

wall ~= executor_cpu_sec / cores + unparallelized residual. The
distributed work itself is nearly constant across levels (same input,
same plan):

| cores | wall s | cpu_sec/cores (ideal) | residual s | residual % |
|---|---|---|---|---|
| {LOW} | {lo_b['wall_sec']} | {lo_ideal:.1f} | {lo_b['wall_sec'] - lo_ideal:.1f} | {100 * (lo_b['wall_sec'] - lo_ideal) / lo_b['wall_sec']:.0f}% |
| {HIGH} | {hi_b['wall_sec']} | {hi_ideal:.1f} | {hi_b['wall_sec'] - hi_ideal:.1f} | {100 * (hi_b['wall_sec'] - hi_ideal) / hi_b['wall_sec']:.0f}% |

The residual bundles driver/scheduler time between jobs ({hi_b.get('n_jobs', '?')}
jobs/run), Python worker startup, GC ({hi_b.get('gc_sec', '?')} s at {HIGH}
cores), and any steal below the gate. Executor CPU seconds themselves
(the distributed work a real cluster would spread over executors) scale
by {lo_b['cpu_sec']:.0f} -> {hi_b['cpu_sec']:.0f} s (ratio
{hi_b['cpu_sec'] / lo_b['cpu_sec']:.2f} — ~1.0 means no parallel-induced
extra work).
"""

    md = f"""# BENCH — scaling efficiency evidence

Generated {date.today().isoformat()} by bench_scaling.py. Same job, same
materialized input ({hi['n_turns']:,} transcript turns, {N_CONVS:,} conversations),
run at local[{LOW}] vs local[{HIGH}] (the N vs 4N parallelism levels of
BASELINE.md:35) on one machine. Runs are STEAL-GATED: a run counts only if
interval host-CPU steal <= {STEAL_MAX}% (this VM fluctuates 0-35%);
{RUNS} accepted runs per level (rejected runs listed in the raw JSON).
Best-of-accepted per level.

| cores | best sec | triples/sec | accepted walls (s) | steal% | task_sec | cpu_sec | gc_sec | tasks | jobs |
|---|---|---|---|---|---|---|---|---|---|
{row(lo)}
{row(hi)}

**Scaling efficiency (thr_{HIGH} / thr_{LOW}) / {ratio:.0f} = {eff:.3f}** (target >= 0.8)
{decomposition}
## Hardware-ceiling controls (Spark-free, same worker counts)

What can {HIGH} processes deliver over {LOW} on THIS host, independent of
any Spark plan? Two multiprocessing controls, run back-to-back with the
sweep:

| control | {LOW}w ops | {HIGH}w ops | scaling | efficiency |
|---|---|---|---|---|
| pure compute (sha256, L1-resident) | {controls['pure_compute_sha256']['low_ops']} | {controls['pure_compute_sha256']['high_ops']} | {controls['pure_compute_sha256']['scaling_x']}x | {controls['pure_compute_sha256']['efficiency']} |
| the pipeline's extraction kernel (pandas extractall + cleaning) | {controls['extraction_kernel']['low_ops']} | {controls['extraction_kernel']['high_ops']} | {controls['extraction_kernel']['scaling_x']}x | {controls['extraction_kernel']['efficiency']} |

The pure-compute control is the host's vCPU ceiling — {LOW}->{HIGH}
workers deliver {controls['pure_compute_sha256']['scaling_x']}x, not
{ratio:.0f}x, on a machine whose /proc/stat steal reads ~0 (host-level
contention is invisible to the guest). The extraction kernel — the
pipeline's dominant stage, isolated from Spark entirely — reaches
{controls['extraction_kernel']['scaling_x']}x
(efficiency {controls['extraction_kernel']['efficiency']}): its
memory-streaming pandas work contends on the memory subsystem that the
{HIGH} vCPUs share. **No plan can scale better than its dominant kernel on
this box**; the irreducible account for the pipeline is (a) the kernel
ceiling above, (b) JVM GC growth with thread count (see gc_sec), (c) wave
quantization of the map stage, and (d) sub-gate host noise (the accepted
walls' spread at steal~0 shows +/-2x run-to-run drift this VM imposes).
On a real 4N-executor cluster each executor owns its memory channels and
GC heap, so (a)/(b) do not transfer; the plan itself ships constant
distributed work across levels (task-seconds of identical plans, table
above).

## Scale design notes

The pipeline (scan -> native chunk/score -> Arrow extract -> broadcast
link -> CC) is a single linear DAG with zero in-memory persists; the only
shuffle-free Python stage is the Arrow extraction. Structural choices that
keep it scalable (profiled in round 1 with event logs):

1. single linear DAG, zero persists — AQE materializes independent
   branches of persisted-stage plans concurrently over a cold cache
   (observed 5x duplicate extraction), and the single-JVM MemoryStore
   convoys above ~16 concurrent tasks;
2. inline zero-shuffle extraction by default; sha2-dedup join (and the
   persistent cache table) as options for paid backends;
3. explicit repartition before the Arrow stage in dedup mode — AQE
   coalesces shuffles for JVM byte sizes and would serialize Python;
4. driver-side union-find for the broadcast-sized dictionary graph
   (an iterative Spark loop on a 60-edge graph is pure scheduling);
5. single-partition entity dictionary (createDataFrame otherwise spawns
   one Python task per defaultParallelism slice per materialization);
6. spark.sql.files.maxPartitionBytes=16m locally so scans yield more
   splits than cores; the corpus is written as 128 files (row groups are
   indivisible scan units).

Dedup-family scale evidence (100k docs, bucket-size histograms) is in
`BENCH/DEDUP_SCALE.md` (bench_dedup.py).

Raw per-level JSON:

```json
{raw_json}
```
"""
    out = REPO / "BENCH" / "BASELINE.md"
    out.parent.mkdir(exist_ok=True)
    # preserve the hand-maintained cross-round history (everything from
    # the first "## Round-" section on) — a refresh replaces only the
    # generated measurement sections above it
    if out.exists() and "\n## Round-" in out.read_text():
        hist = out.read_text()
        md = md.rstrip() + "\n\n" + hist[hist.index("\n## Round-") + 1 :]
    out.write_text(md)
    print(json.dumps({"efficiency": round(eff, 3),
                      "thr_low": lo["triples_per_sec"], "thr_high": hi["triples_per_sec"],
                      "report": str(out)}))


if __name__ == "__main__":
    main()
