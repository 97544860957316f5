#!/usr/bin/env python
"""KG-pipeline stage isolation (guide §1.4): times each pipeline stage
with a noop sink at $SPARK_GRAFT_SF_DIR scale, best-of-N. Untimed corpus
generation identical to bench.py. Does not touch bench.py."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    from pyspark.sql import functions as F

    from delm_spark.data.synthetic import entity_dictionary, generate_transcripts
    from delm_spark.kg.pipeline import (
        PipelineConfig,
        chunk_transcripts,
        run_pipeline,
        score_and_filter,
    )
    from delm_spark.session import get_spark

    sf_name = Path(SF_DIR).name
    n_convs = {"sf0.001": 500, "sf0.01": 5000, "sf0.1": 50000}.get(
        sf_name, max(500, int(500_000 * float(sf_name.replace("sf", ""))))
    )
    spark = get_spark(app_name="delm-kg-stages", cores=CORES)
    spark.range(100_000).count()

    corpus_path = f"/tmp/delm_bench_transcripts_{sf_name}_{n_convs}"
    if not Path(corpus_path, "_SUCCESS").exists():
        generate_transcripts(
            spark, n_convs=n_convs, n_hot=max(2, n_convs // 1000), partitions=64
        ).write.mode("overwrite").parquet(corpus_path)
    transcripts = spark.read.parquet(corpus_path)
    transcripts.count()

    cfg = PipelineConfig()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, fn):
        runs = []
        for _ in range(N_RUNS):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"stage:{name}")
            t0 = time.perf_counter()
            fn()
            runs.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"stage": name, "runs": runs, "min": min(runs)}), flush=True)

    dictionary = entity_dictionary(spark)

    # stage 1-3: chunk + score/filter
    def chunks_df():
        return score_and_filter(
            chunk_transcripts(transcripts), cfg.keywords, cfg.score_threshold,
            cfg.score_op,
        )

    timed("chunks_noop", lambda: noop(chunks_df()))

    # + stage 4: extraction
    from delm_spark.extraction.backend import RuleTripleExtractor
    from delm_spark.extraction.extract import extract_chunks
    from delm_spark.schemas.spec import spec_from_dict

    spec = spec_from_dict(cfg.schema_cfg)
    backend = RuleTripleExtractor(spec)

    def extracted_df():
        df = chunks_df().select("conv_id", "turn_idx", "chunk_pos", "delm_text_chunk")
        return extract_chunks(df, spec, backend, dedup=False)

    timed("extracted_noop", lambda: noop(extracted_df()))

    # + stage 5: triples (from_json + posexplode)
    from delm_spark.kg.pipeline import triples_from_extracted

    timed("triples_noop", lambda: noop(triples_from_extracted(extracted_df(), spec)))

    # + link
    from delm_spark.kg.linking import link_mentions

    timed(
        "linked_noop",
        lambda: noop(link_mentions(triples_from_extracted(extracted_df(), spec), dictionary)),
    )

    # full pipeline (count like bench.py)
    def full():
        res = run_pipeline(spark, transcripts, dictionary, cfg)
        res.edges.count()

    timed("edges_count_full", full)

    spark.stop()


if __name__ == "__main__":
    main()
