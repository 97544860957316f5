#!/usr/bin/env python
"""Round-6 optimization measurement harness (guide §1).

Separate from the FROZEN bench.py: times each suite query with the same
methodology (df.count(), best-of-N) AND captures `.explain("formatted")`
to plans/r06/<query>_<tag>.txt so plan claims are auditable.

Usage:
  python bench_extra.py [--tag before|after] [--queries q1,q2,...]
                        [--runs 2] [--plans-only]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

SUITE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "broadcast_brand_revenue",
    "window_top_orders_per_customer",
    "events_sessionize",
    "exact_dedup_docs",
    "minhash_lsh_pairs_docs",
    "simhash_pairs_docs",
    "embedding_topk_cosine",
    "lsh_topk_embeddings",
    "regex_split_chunks",
    "majority_vote_lang",
    "near_dup_pipeline_docs",
    "fuzzy_score_docs",
    "decontam_ngram_docs",
    "gopher_quality_docs",
    "unigram_lm_docs",
    "bm25_search_docs",
    "kmeans_clusters_embeddings",
    "kmv_distinct_tokens",
    "hll_users_events",
    "weighted_sample_docs",
    "tfidf_top_terms_docs",
    "link_prediction_kg",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans-only", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from delm_spark.session import get_spark

    spark = get_spark(app_name="delm-spark-bench-extra", cores=CORES)
    from pyspark.sql import functions as F

    # same warmup as bench.py
    spark.range(100_000).count()
    _w = spark.range(100_000).withColumn("k", F.col("id") % 50)
    _d = spark.createDataFrame([(i, str(i)) for i in range(50)], "k long, v string")
    _w.join(F.broadcast(_d), "k").count()

    def _noop(it):
        for pdf in it:
            yield pdf

    _w.mapInPandas(_noop, schema=_w.schema).count()

    qs = entry_mod.queries()
    names = args.queries.split(",") if args.queries else SUITE
    plans_dir = Path(__file__).resolve().parent / "plans" / "r06"
    plans_dir.mkdir(parents=True, exist_ok=True)

    timings: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        # plan capture (untimed; uses a fresh DataFrame)
        df0 = qs[name](spark, SF_DIR)
        plan_txt = df0._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        (plans_dir / f"{name}_{args.tag}.txt").write_text(plan_txt)
        if args.plans_only:
            continue
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.count()
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = runs
        gc.collect()
        spark._jvm.System.gc()
        print(json.dumps({"q": name, "runs": runs, "min": min(runs)}), flush=True)

    if timings:
        print(
            json.dumps(
                {
                    "tag": args.tag,
                    "sf_dir": SF_DIR,
                    "mins": {k: min(v) for k, v in timings.items()},
                    "total_min": round(sum(min(v) for v in timings.values()), 3),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
