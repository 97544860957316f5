#!/usr/bin/env python
"""Single spark-submit entry for the whole KG pipeline (north rule: "run
via spark-submit --py-files on a multi-executor cluster").

    zip -r delm_spark.zip delm_spark
    spark-submit --py-files delm_spark.zip submit_job.py \\
        --transcripts s3://bucket/transcripts_parquet_or_catalog.table \\
        --dictionary  s3://bucket/dictionary.parquet \\
        --output      s3://bucket/kg_out \\
        [--config config.yaml] [--checkpoint-dir hdfs://.../staging]

The script declares the job only — no master, cores, or memory are
hard-coded; spark-submit/cluster conf owns those. Inputs containing a
path separator are read as parquet; bare dotted names are read from the
session catalog (Iceberg tables via a configured SparkCatalog). Output is
nodes/ and edges/ under --output (written through the session's
configured codec, parquet+zstd by default).

ONE job, no per-row Python: the pipeline is a single linear DataFrame DAG
whose only Python stages are Arrow-batched (mapInPandas extraction;
plan-asserted in tests/test_plan_quality.py), matching the north star's
"no per-row Python, vectorized pandas/Arrow UDFs only" constraint.
"""

from __future__ import annotations

import argparse
import json


def _read(spark, ident: str):
    if "/" in ident or ident.endswith(".parquet"):
        return spark.read.parquet(ident)
    return spark.table(ident)


def _same_path(a: str, b: str) -> bool:
    """True when two output identifiers resolve to the same location.
    Scheme-qualified URIs (s3://, hdfs://) compare after trailing-slash
    normalization; bare local paths additionally resolve symlinks."""
    import os

    a, b = a.rstrip("/"), b.rstrip("/")
    if "://" in a or "://" in b:
        return a == b
    return os.path.realpath(a) == os.path.realpath(b)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--transcripts", required=True,
                    help="parquet path or catalog table of transcripts")
    ap.add_argument("--dictionary", required=True,
                    help="parquet path or catalog table of the entity dictionary")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--config", default=None, help="DELM-format config.yaml")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="staging dir for resumable stage checkpoints")
    ap.add_argument("--embedding-link", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="resolve unlinked mention residue via trigram-"
                         "embedding LSH candidates after the exact "
                         "dictionary join (north-star 'dictionary + "
                         "embedding blocking'); a config file's "
                         "pipeline.embedding_link takes precedence")
    ap.add_argument("--merge-into", default=None,
                    help="existing KG output dir (nodes/ + edges/) to "
                         "merge this batch into with exactly-once-per-"
                         "conversation semantics (kg/update.py): edges "
                         "from conversations already present are dropped, "
                         "nodes re-derived from the merged endpoints; the "
                         "merged graph is written to --output")
    ap.add_argument("--analytics", action="store_true",
                    help="also materialize graph analytics over the "
                         "canonical graph: degree_distribution/, "
                         "pagerank/ and communities/ (4-round LPA) under "
                         "--output (kg/graph.py, kg/communities.py)")
    ap.add_argument("--pagerank-iters", type=int, default=10,
                    help="power iterations for --analytics PageRank")
    ap.add_argument("--quality", action="store_true",
                    help="also materialize the publish-gate family over "
                         "the written edges: consistency report, "
                         "functional-fact resolution, induced entity "
                         "types, and type-signature violations")
    ap.add_argument("--walks-length", type=int, default=0,
                    help="when > 0, also materialize walks/ — one "
                         "deterministic hash-seeded random walk of this "
                         "length per canonical node (kg/walks.py), the "
                         "graph-embedding training corpus")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("delm-spark-kg").getOrCreate()

    from delm_spark.config import DelmConfig
    from delm_spark.kg.pipeline import PipelineConfig, run_pipeline

    if args.config:
        config = DelmConfig.from_yaml(args.config).to_pipeline_config()
    else:
        config = PipelineConfig(embedding_link=args.embedding_link)
    if args.checkpoint_dir:
        config.checkpoint_dir = args.checkpoint_dir

    transcripts = _read(spark, args.transcripts)
    dictionary = _read(spark, args.dictionary)
    res = run_pipeline(spark, transcripts, dictionary, config)
    out_nodes, out_edges = res.nodes, res.edges
    merge_counters: dict = {}
    if args.merge_into:
        from delm_spark.kg.update import merge_graph, nodes_from_edges

        existing = spark.read.parquet(f"{args.merge_into}/edges")
        _, out_edges = merge_graph(existing, res.edges, counters=merge_counters)
        if _same_path(args.merge_into, args.output):
            # in-place incremental merge (the natural workflow): the merged
            # plan still READS {output}/edges, so overwriting it would fail
            # mid-write with Spark's cannot-overwrite-a-path-being-read-from
            # error AFTER nodes/ was already replaced, leaving the KG dir
            # inconsistent. Materialize the merged edges (cut lineage from
            # the input files) before any overwrite of the directory.
            out_edges = out_edges.localCheckpoint(eager=True)
        out_nodes = nodes_from_edges(out_edges)
    # partitioned graph tables (north star): edges by predicate (bounded
    # cardinality -> per-relation partition pruning), nodes clustered by
    # entity_id (row-group min/max stats prune point lookups)
    out_nodes.sortWithinPartitions("entity_id").write.mode("overwrite").parquet(
        f"{args.output}/nodes"
    )
    out_edges.write.partitionBy("pred").mode("overwrite").parquet(
        f"{args.output}/edges"
    )
    n_nodes = spark.read.parquet(f"{args.output}/nodes").count()
    n_edges = spark.read.parquet(f"{args.output}/edges").count()
    out = {"nodes": n_nodes, "edges": n_edges, "output": args.output}
    if args.merge_into:
        # nonzero dropped_conv_ids on a feed believed conv-disjoint means
        # upstream re-delivery or a conversation split across batches —
        # surfaced so partial-overlap batches are detectable, not silent
        out["merge"] = merge_counters

    if args.analytics:
        # day-after queries over the *written* canonical graph — one scan
        # of the final partitioned table, not a recompute of the pipeline
        # DAG (kg/graph.py scale notes apply: hash aggs + one shuffle per
        # PageRank iteration, no all-pairs work)
        from delm_spark.kg.communities import label_propagation
        from delm_spark.kg.graph import degree_distribution, pagerank

        graph = spark.read.parquet(f"{args.output}/edges").select(
            F.col("subj_canonical").alias("src"),
            F.col("obj_canonical").alias("dst"),
        )
        degree_distribution(graph).write.mode("overwrite").parquet(
            f"{args.output}/degree_distribution"
        )
        pagerank(graph, iters=args.pagerank_iters).write.mode("overwrite").parquet(
            f"{args.output}/pagerank"
        )
        label_propagation(graph, iters=4).write.mode("overwrite").parquet(
            f"{args.output}/communities"
        )
        out["analytics"] = ["degree_distribution", "pagerank", "communities"]

    if args.quality:
        # the publish gate + typing family over the *written* edges —
        # same one-scan discipline as --analytics (kg/quality.py and
        # kg/typing.py scale notes apply: combinable aggs, broadcast
        # signature table, entity-keyed joins)
        from delm_spark.kg.quality import (
            consistency_report,
            resolve_functional,
        )
        from delm_spark.kg.typing import (
            infer_entity_types,
            signature_table,
            type_violations,
        )

        edges = spark.read.parquet(f"{args.output}/edges")
        kw = dict(subj_col="subj_canonical", obj_col="obj_canonical")
        # edges are OCCURRENCE-grained (one row per extraction; repeats
        # are support) — duplicate_triple must count extra copies of the
        # full occurrence key, not of the fact
        consistency_report(
            edges,
            occurrence_cols=["conv_id", "turn_idx", "chunk_pos", "item_pos"],
            **kw,
        ).write.mode("overwrite").parquet(f"{args.output}/quality_report")
        resolve_functional(edges, **kw).write.mode("overwrite").parquet(
            f"{args.output}/functional_resolution"
        )
        sig = signature_table(spark)
        etypes = infer_entity_types(edges, sig, **kw)
        etypes.write.mode("overwrite").parquet(f"{args.output}/entity_types")
        # reuse the just-written type table instead of re-voting the corpus
        type_violations(
            edges,
            sig,
            types=spark.read.parquet(f"{args.output}/entity_types"),
            **kw,
        ).write.mode("overwrite").parquet(f"{args.output}/type_violations")
        out["quality"] = [
            "quality_report",
            "functional_resolution",
            "entity_types",
            "type_violations",
        ]

    if args.walks_length > 0:
        from delm_spark.kg.walks import random_walks

        graph = spark.read.parquet(f"{args.output}/edges").select(
            F.col("subj_canonical").alias("src"),
            F.col("obj_canonical").alias("dst"),
        )
        random_walks(graph, length=args.walks_length).write.mode(
            "overwrite"
        ).parquet(f"{args.output}/walks")
        out["walks_length"] = args.walks_length

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
