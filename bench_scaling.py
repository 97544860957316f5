#!/usr/bin/env python
"""Scaling-efficiency evidence: run bench.py at two parallelism levels
(local[8] vs local[32] — the in-sandbox stand-in for N vs 4N executors,
per BASELINE.json) on the same input and report throughput at both plus
efficiency = (throughput_32 / throughput_8) / 4. Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import date
from pathlib import Path

REPO = Path(__file__).resolve().parent
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_at(cores: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores), SPARK_GRAFT_SF_DIR=SF_DIR)
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    low, high = 8, 32
    r_low = run_at(low)
    r_high = run_at(high)
    thr_low = r_low["value"]
    thr_high = r_high["value"]
    eff = (thr_high / thr_low) / (high / low) if thr_low else 0.0

    md = f"""# BENCH — scaling efficiency evidence

Generated {date.today().isoformat()} by bench_scaling.py. Same job, same
input ({SF_DIR} testdata + sf-scaled synthetic transcript corpus), run at
two parallelism levels on one machine — the in-sandbox stand-in for N vs
4N executors (BASELINE.json north rule).

| cores | triples/sec | kg_pipeline sec | suite total sec |
|---|---|---|---|
| local[{low}] | {thr_low} | {r_low['queries']['kg_pipeline']} | {r_low['total_sec']} |
| local[{high}] | {thr_high} | {r_high['queries']['kg_pipeline']} | {r_high['total_sec']} |

**Scaling efficiency (throughput_{high} / throughput_{low}) / {high // low} = {eff:.3f}**
(target >= 0.8)

Per-query seconds at local[{high}]:

```json
{json.dumps(r_high['queries'], indent=2)}
```

Per-query seconds at local[{low}]:

```json
{json.dumps(r_low['queries'], indent=2)}
```
"""
    out = REPO / "BENCH" / "BASELINE.md"
    out.parent.mkdir(exist_ok=True)
    out.write_text(md)
    print(json.dumps({"throughput_low": thr_low, "throughput_high": thr_high,
                      "efficiency": round(eff, 3), "report": str(out)}))


if __name__ == "__main__":
    main()
