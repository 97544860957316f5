#!/usr/bin/env python
"""Single spark-submit entry for the corpus-curation pipeline.

    zip -r delm_spark.zip delm_spark
    spark-submit --py-files delm_spark.zip submit_curation.py \\
        --documents s3://bucket/raw_docs_parquet_or_catalog.table \\
        --output    s3://bucket/curated \\
        # or, for the BASELINE.json transcript shape:
        # --transcripts s3://bucket/transcripts --output s3://bucket/curated \\
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
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--documents",
                     help="parquet path or catalog table of raw documents "
                          "(doc_id, text)")
    src.add_argument("--transcripts",
                     help="parquet path or catalog table of raw multi-turn "
                          "transcripts (conv_id, turn_idx, role, text, ...); "
                          "runs the transcript-curation variant: turn "
                          "assembly + structural gates before the dedup/"
                          "redact/pack chain")
    ap.add_argument("--min-turns", type=int, default=4,
                    help="transcript mode: drop conversations shorter than "
                         "this as 'too_short'")
    ap.add_argument("--max-tool-pct", type=int, default=40,
                    help="transcript mode: drop conversations whose "
                         "tool-role turn share exceeds this percent")
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

    from delm_spark.curate import (
        CurationConfig,
        TranscriptCurationConfig,
        assemble_conversations,
        run_curation,
        run_transcript_curation,
    )
    from delm_spark.operators.curation import redact_pii

    test_df = _read(spark, args.test_set) if args.test_set else None
    near_dup = None if args.near_dup_threshold < 0 else args.near_dup_threshold
    if args.transcripts:
        turns = _read(spark, args.transcripts)
        config = TranscriptCurationConfig(
            min_turns=args.min_turns,
            max_tool_pct=args.max_tool_pct,
            near_dup_threshold=near_dup,
            decontam_n=args.decontam_n,
            redact=not args.no_redact,
            pack_budget=args.budget,
        )
        disp = run_transcript_curation(turns, test_df=test_df, config=config)
        id_col, docs = "conv_id", assemble_conversations(turns)
    else:
        docs = _read(spark, args.documents)
        config = CurationConfig(
            near_dup_threshold=near_dup,
            quality=not args.no_quality,
            decontam_n=args.decontam_n,
            redact=not args.no_redact,
            pack_budget=args.budget,
        )
        disp = run_curation(docs, test_df=test_df, config=config)
        id_col = "doc_id"

    disp.write.partitionBy("status").mode("overwrite").parquet(
        f"{args.output}/dispositions"
    )
    disp_r = spark.read.parquet(f"{args.output}/dispositions")
    kept_ids = disp_r.filter("status = 'kept'").select(id_col, "pack_id")
    corpus = (
        docs.join(kept_ids, id_col)
        .select(
            id_col,
            "pack_id",
            (redact_pii(F.col("text")) if not args.no_redact else F.col("text"))
            .alias("text"),
        )
        .sortWithinPartitions("pack_id", id_col)
    )
    corpus.write.mode("overwrite").parquet(f"{args.output}/corpus")

    census = {
        r["status"]: r["n"]
        for r in disp_r.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(json.dumps({"output": args.output, "census": census}))


if __name__ == "__main__":
    main()
