"""Shared bench-harness helpers: the /proc/stat steal gate and the
Spark event-log task-window parser. One implementation — the five bench
scripts must measure identically (a fix applied to one copy silently
skewing the others is exactly the drift this module removes)."""

from __future__ import annotations

import json
from pathlib import Path


def steal_counters():
    """(steal_ticks, total_ticks) from the first /proc/stat line; sample
    around a run and gate on the interval percentage."""
    f = open("/proc/stat").readline().split()
    return int(f[8]), sum(int(x) for x in f[1:9])


def parse_task_windows(app_dir: Path, windows: list) -> list:
    """Per-(t0_ms, t1_ms)-window sums over SparkListenerTaskEnd /
    JobStart events in an UNCOMPRESSED event-log directory: task/cpu/GC
    seconds, shuffle write volume, task and job counts. Tasks attribute
    to a window by Launch Time."""
    out = [
        {
            "task_sec": 0.0,
            "cpu_sec": 0.0,
            "gc_sec": 0.0,
            "shuffle_write_mb": 0.0,
            "shuffle_records": 0,
            "n_tasks": 0,
            "n_jobs": 0,
        }
        for _ in windows
    ]
    app_dir = Path(app_dir)
    files = sorted(app_dir.glob("**/*")) if app_dir.is_dir() else [app_dir]
    for fp in files:
        if not fp.is_file():
            continue
        with open(fp, errors="replace") as f:
            for line in f:
                if (
                    '"SparkListenerTaskEnd"' not in line
                    and '"SparkListenerJobStart"' not in line
                ):
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    ts = ev.get("Submission Time", 0)
                    for i, (a, b) in enumerate(windows):
                        if a <= ts <= b:
                            out[i]["n_jobs"] += 1
                    continue
                ts = ev.get("Task Info", {}).get("Launch Time", 0)
                m = ev.get("Task Metrics") or {}
                sw = m.get("Shuffle Write Metrics") or {}
                for i, (a, b) in enumerate(windows):
                    if a <= ts <= b:
                        o = out[i]
                        o["n_tasks"] += 1
                        o["task_sec"] += m.get("Executor Run Time", 0) / 1e3
                        o["cpu_sec"] += m.get("Executor CPU Time", 0) / 1e9
                        o["gc_sec"] += m.get("JVM GC Time", 0) / 1e3
                        o["shuffle_write_mb"] += (
                            sw.get("Shuffle Bytes Written", 0) / 1e6
                        )
                        o["shuffle_records"] += sw.get(
                            "Shuffle Records Written", 0
                        )
    for o in out:
        for k in ("task_sec", "cpu_sec", "gc_sec", "shuffle_write_mb"):
            o[k] = round(o[k], 1)
    return out
