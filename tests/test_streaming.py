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


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessionizer: gap-closed sessions emit with
    exact bounds/counts; the still-open session stays in state."""
    import datetime as dt

    from delm_spark.streaming.stateful import sessionize_stream

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return base + dt.timedelta(minutes=minutes)

    rows = [
        # user 1: session A (0, 10min), gap > 30min, session B (open)
        (1, ts(0)), (1, ts(10)), (1, ts(120)),
        # user 2: one long session, closed by a later far event
        (2, ts(0)), (2, ts(20)), (2, ts(40)), (2, ts(300)),
    ]
    src = tmp_path / "events_in"
    src.mkdir()
    spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "batch0"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "batch0"))
    )
    sessions = sessionize_stream(stream, gap_sec=1800)
    out = tmp_path / "sessions_out"
    q = (
        sessions.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(str(out)).collect()
    }
    epoch = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    assert (1, epoch, epoch + 600, 2) in got  # user 1 session A closed by gap
    assert (2, epoch, epoch + 2400, 3) in got  # user 2 first session closed
    # user 1's open session (@120min) is closed by EVENT-TIME TIMEOUT: the
    # watermark (max ts 300min - 2h = 180min) passed 120min + gap
    assert (1, epoch + 7200, epoch + 7200, 1) in got
    # user 2's open session (@300min) is beyond the watermark -> still open
    assert len(got) == 3
