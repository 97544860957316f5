#!/usr/bin/env python
"""Single spark-submit entry for the corpus-curation pipeline.

    zip -r delm_spark.zip delm_spark
    spark-submit --py-files delm_spark.zip submit_curation.py \\
        --documents s3://bucket/raw_docs_parquet_or_catalog.table \\
        --output    s3://bucket/curated \\
        [--test-set s3://bucket/benchmarks.parquet] \\
        [--budget 2048] [--near-dup-threshold 0.5] [--no-redact]

Runs `delm_spark.curate.run_curation` (exact dedup -> MinHash near-dup
-> Gopher rules -> decontamination -> PII redaction -> sequence
packing) and writes:

  <output>/dispositions/   one row per INPUT doc: (doc_id, status,
                           pack_id, n_tokens), partitioned by status so
                           audits prune to the slice they need
  <output>/corpus/         the kept documents with redacted text and
                           their pack assignment, sorted within
                           partitions by (pack_id, doc_id) so a training
                           reader streams packs in order

Like submit_job.py, the script declares the job only — master, cores,
and memory belong to spark-submit/cluster conf — and the plan contains
no per-row Python (the whole chain is native column expressions).
"""

from __future__ import annotations

import argparse
import json


def _read(spark, ident: str):
    if "/" in ident or ident.endswith(".parquet"):
        return spark.read.parquet(ident)
    return spark.table(ident)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--documents", required=True,
                    help="parquet path or catalog table of raw documents "
                         "(doc_id, text)")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--test-set", default=None,
                    help="held-out benchmark table for decontamination "
                         "(doc_id, text); omit to skip the stage")
    ap.add_argument("--budget", type=int, default=2048,
                    help="tokens per training pack")
    ap.add_argument("--near-dup-threshold", type=float, default=0.5,
                    help="exact-Jaccard threshold for the near-dup stage; "
                         "negative disables the stage")
    ap.add_argument("--decontam-n", type=int, default=8,
                    help="word-n-gram width for decontamination")
    ap.add_argument("--no-redact", action="store_true",
                    help="skip PII redaction")
    ap.add_argument("--no-quality", action="store_true",
                    help="skip the Gopher quality stage")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("delm-spark-curate").getOrCreate()

    from delm_spark.curate import CurationConfig, run_curation
    from delm_spark.operators.curation import redact_pii

    docs = _read(spark, args.documents)
    test_df = _read(spark, args.test_set) if args.test_set else None
    config = CurationConfig(
        near_dup_threshold=(
            None if args.near_dup_threshold < 0 else args.near_dup_threshold
        ),
        quality=not args.no_quality,
        decontam_n=args.decontam_n,
        redact=not args.no_redact,
        pack_budget=args.budget,
    )
    disp = run_curation(docs, test_df=test_df, config=config)

    disp.write.partitionBy("status").mode("overwrite").parquet(
        f"{args.output}/dispositions"
    )
    disp_r = spark.read.parquet(f"{args.output}/dispositions")
    kept_ids = disp_r.filter("status = 'kept'").select("doc_id", "pack_id")
    corpus = (
        docs.join(kept_ids, "doc_id")
        .select(
            "doc_id",
            "pack_id",
            (redact_pii(F.col("text")) if not args.no_redact else F.col("text"))
            .alias("text"),
        )
        .sortWithinPartitions("pack_id", "doc_id")
    )
    corpus.write.mode("overwrite").parquet(f"{args.output}/corpus")

    census = {
        r["status"]: r["n"]
        for r in disp_r.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(json.dumps({"output": args.output, "census": census}))


if __name__ == "__main__":
    main()
