#!/usr/bin/env python
"""Distributed connected-components scale bench (>=5M edges).

The CORRECTNESS query (connected_components_demo) proves the iterative
min-label + pointer-jumping path at 15k rows; this is the scale evidence
point: a deterministic mixed graph of STAR components (fan-in skew: 100
spokes per hub) and CHAIN components (diameter 64: the shape that breaks
plain O(diameter) propagation), run through the SAME
kg/canonicalize.connected_components code with driver_cutoff=0.

Reports: iteration count (pointer jumping => O(log diameter); asserted
<= 12 for diameter-64 chains where plain propagation would need 64),
per-iteration wall, shuffle write volume per iteration (event-log
TaskEnd metrics), the num_partitions derivation, and a closed-form
component census check (component count + exact size histogram + min-label
invariant). Steal-gated like bench_dedup.py. Writes BENCH/CC_SCALE.md and
prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import date
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

N_STAR_EDGES = int(os.environ.get("SPARK_GRAFT_CC_STAR_EDGES", "2500000"))
N_CHAIN_EDGES = int(os.environ.get("SPARK_GRAFT_CC_CHAIN_EDGES", "2500000"))
SPOKES = 100          # star fan-in
CHAIN_LEN = 64        # edges per chain (diameter 64)
# whole components only — a trailing partial star/chain would break the
# closed-form census
N_STAR_EDGES -= N_STAR_EDGES % SPOKES
N_CHAIN_EDGES -= N_CHAIN_EDGES % CHAIN_LEN
CHAIN_BASE = 10**10   # id offset separating chain nodes from star nodes
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
STEAL_MAX = float(os.environ.get("SPARK_GRAFT_STEAL_MAX", "10"))
MAX_ATTEMPTS = int(os.environ.get("SPARK_GRAFT_CC_ATTEMPTS", "3"))
EDGES = f"/tmp/delm_cc_edges_{N_STAR_EDGES}_{N_CHAIN_EDGES}"
EVDIR = "/tmp/delm_cc_eventlog"


from bench_util import parse_task_windows, steal_counters  # noqa: E402


def make_edges(spark):
    """Star c: hub c*200 <- spokes c*200+1..+SPOKES. Chain c: nodes
    CHAIN_BASE + c*100 + (0..CHAIN_LEN), consecutive edges."""
    from pyspark.sql import functions as F

    stars = spark.range(0, N_STAR_EDGES, 1, 64).select(
        ((F.col("id") / SPOKES).cast("long") * 200).alias("src"),
        (
            (F.col("id") / SPOKES).cast("long") * 200
            + 1
            + F.col("id") % SPOKES
        ).alias("dst"),
    )
    chains = spark.range(0, N_CHAIN_EDGES, 1, 64).select(
        (
            F.lit(CHAIN_BASE)
            + (F.col("id") / CHAIN_LEN).cast("long") * 100
            + F.col("id") % CHAIN_LEN
        ).alias("src"),
    ).withColumn("dst", (F.col("src") + 1))
    return stars.unionByName(chains)


def shuffle_per_window(app_dir: Path, windows: list) -> list:
    """Shuffle/task/job sums per wall window (bench_util event-log walk)."""
    return [
        {k: w[k] for k in ("shuffle_write_mb", "shuffle_records", "n_tasks", "n_jobs")}
        for w in parse_task_windows(app_dir, windows)
    ]


def main() -> None:
    from pyspark.sql import functions as F

    from delm_spark.kg import canonicalize
    from delm_spark.kg.canonicalize import connected_components
    from delm_spark.session import get_spark

    evdir = Path(EVDIR)
    evdir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(
        app_name="delm-cc-bench",
        cores=CORES,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": str(evdir),
            "spark.eventLog.compress": "false",
        },
    )
    spark.range(100_000).count()  # JIT warmup
    if not Path(EDGES, "_SUCCESS").exists():
        make_edges(spark).write.mode("overwrite").parquet(EDGES)
    edges = spark.read.parquet(EDGES)
    n_edges = edges.count()  # warm page cache

    n_stars = N_STAR_EDGES // SPOKES
    n_chains = N_CHAIN_EDGES // CHAIN_LEN
    expected_components = n_stars + n_chains

    run = None
    for _ in range(MAX_ATTEMPTS):
        s0, c0 = steal_counters()
        t0_ms = int(time.time() * 1000)
        t0 = time.perf_counter()
        cc = connected_components(edges, driver_cutoff=0)
        n_nodes = cc.count()
        wall = round(time.perf_counter() - t0, 2)
        t1_ms = int(time.time() * 1000)
        s1, c1 = steal_counters()
        st = round((s1 - s0) / max(c1 - c0, 1) * 100, 1)
        attempt = {
            "wall_sec": wall,
            "steal_pct": st,
            "n_nodes": n_nodes,
            "iterations": canonicalize.LAST_RUN_ITERATIONS,
            "iter_seconds": list(canonicalize.LAST_RUN_ITER_SECONDS),
            "window": (t0_ms, t1_ms),
            "labels": cc,
        }
        # keep the LOWEST-steal attempt; never silently publish the last
        if run is None or st < run["steal_pct"]:
            run = attempt
        if st <= STEAL_MAX:
            break
    cc = run.pop("labels")

    # O(log diameter) evidence: plain propagation needs 64 rounds for the
    # chains; pointer jumping must land far under that
    assert run["iterations"] <= 12, run["iterations"]

    # closed-form component census: count, exact size histogram, min-label
    sizes = cc.groupBy("component").agg(
        F.count("*").alias("sz"), F.min("node").alias("mn")
    )
    census = {
        int(r["sz"]): int(r["n"])
        for r in sizes.groupBy("sz").agg(F.count("*").alias("n")).collect()
    }
    bad_min = sizes.filter(F.col("component") != F.col("mn")).count()
    assert bad_min == 0
    assert census == {SPOKES + 1: n_stars, CHAIN_LEN + 1: n_chains}, census

    # num_partitions derivation: ~1M symmetrized edges per partition,
    # clamped to the shuffle width
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    derived = max(1, min(width, 2 * n_edges // 1_000_000 + 1))

    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    time.sleep(2)  # event-log flush
    shuffle = shuffle_per_window(evdir, [run.pop("window")])[0]

    summary = {
        "n_edges": n_edges,
        "n_star_components": n_stars,
        "n_chain_components": n_chains,
        "expected_components": expected_components,
        "census_ok": True,
        "num_partitions_derived": derived,
        "cores": CORES,
        "run": run,
        "shuffle": shuffle,
        "edges_per_sec": round(n_edges / run["wall_sec"], 1),
    }
    print(json.dumps(summary))

    iters = run["iter_seconds"]
    iter_rows = "\n".join(
        f"| {i + 1} | {s} |" for i, s in enumerate(iters)
    )
    md = f"""# BENCH — distributed connected components at {n_edges:,} edges

Generated {date.today().isoformat()} by bench_cc.py on local[{CORES}]
(steal-gated <= {STEAL_MAX}%; measured steal {run['steal_pct']}%).

Graph: {n_stars:,} star components ({SPOKES} spokes per hub — fan-in
skew) + {n_chains:,} chain components (diameter {CHAIN_LEN} — the shape
that defeats plain O(diameter) label propagation). 64-bit long node ids
(exercises the typed convergence sentinel). Same
`kg/canonicalize.connected_components` code as the oracle-checked demo,
`driver_cutoff=0`.

| metric | value |
|---|---|
| edges | {n_edges:,} |
| nodes labeled | {run['n_nodes']:,} |
| wall | {run['wall_sec']} s |
| edges/sec | {round(n_edges / run['wall_sec']):,} |
| iterations | {run['iterations']} (pointer jumping; plain propagation needs {CHAIN_LEN}) |
| shuffle write | {shuffle['shuffle_write_mb']} MB / {shuffle['shuffle_records']:,} records |
| jobs / tasks | {shuffle['n_jobs']} / {shuffle['n_tasks']} (window spans symmetrization, {run['iterations']} iteration checkpoints, AQE stage jobs, and the label count) |
| num_partitions (derived) | {derived} (~1M symmetrized edges per partition, clamped to {width}) |

Per-iteration wall (each row is ONE job: neighbor-min + pointer jump +
eager checkpoint, convergence observed via the same job's metrics):

| iteration | sec |
|---|---|
{iter_rows}

Correctness census (closed-form, no label-propagation logic): component
count == {expected_components:,} (= stars + chains), size histogram exactly
{{{SPOKES + 1}: {n_stars:,}, {CHAIN_LEN + 1}: {n_chains:,}}}, and every
component label equals the component's min node id. All asserted in-run.

100-TB read: per-iteration work is two hash-partitioned exchanges of the
label frame (bounded by node count, not edge count after the first
dedup), the iteration count is logarithmic in diameter, and the star
fan-in skew is absorbed by the groupBy partial aggregation (map-side
combine of neighbor-min messages) — no single-key hotspot reaches the
reduce side with more than its partial minima.
"""
    out = Path(__file__).resolve().parent / "BENCH" / "CC_SCALE.md"
    out.write_text(md)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
