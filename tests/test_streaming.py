"""Structured Streaming parity: the streaming pipeline over a file-source
stream produces exactly the batch pipeline's triples, and the streaming
checkpoint makes a second drain a no-op."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from delm_spark.data.synthetic import entity_dictionary, generate_transcripts
from delm_spark.kg.pipeline import PipelineConfig, run_pipeline
from delm_spark.streaming.stream import (
    read_transcript_stream,
    run_stream_to_parquet,
    streaming_triples,
)


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    src = base / "src"
    out = base / "out"
    ckpt = base / "ckpt"
    t = generate_transcripts(spark, n_convs=30)
    t.repartition(4).write.parquet(str(src))
    return {"src": str(src), "out": str(out), "ckpt": str(ckpt), "batch_input": t}


def _drain(spark, dirs):
    stream = read_transcript_stream(spark, dirs["src"], max_files_per_trigger=2)
    triples = streaming_triples(stream)
    q = run_stream_to_parquet(triples, dirs["out"], dirs["ckpt"])
    q.awaitTermination(300)


def test_stream_matches_batch(spark, stream_dirs):
    _drain(spark, stream_dirs)
    got = {
        tuple(r)
        for r in spark.read.parquet(stream_dirs["out"])
        .select("conv_id", "turn_idx", "chunk_pos", "item_pos", "subj", "pred", "obj")
        .collect()
    }
    batch = run_pipeline(
        spark,
        spark.read.parquet(stream_dirs["src"]),
        entity_dictionary(spark),
        PipelineConfig(),
    )
    expected = {
        tuple(r)
        for r in batch.triples.select(
            "conv_id", "turn_idx", "chunk_pos", "item_pos", "subj", "pred", "obj"
        ).collect()
    }
    assert got == expected and len(got) > 0


def test_stream_checkpoint_makes_redrain_noop(spark, stream_dirs):
    before = spark.read.parquet(stream_dirs["out"]).count()
    _drain(spark, stream_dirs)  # same checkpoint: nothing new to process
    after = spark.read.parquet(stream_dirs["out"]).count()
    assert after == before
