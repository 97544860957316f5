"""Multimodal binary-column plumbing: schema, batching, dedup, stubbed
decode determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delm_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_media_features,
    media_dedup_by_content,
    require_real_decoders,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synthetic_media(spark, n=60).cache()
    df.count()
    return df


def test_feature_extraction_shape_and_determinism(spark, media):
    feats = extract_media_features(media).cache()
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 60
    for r in rows.values():
        assert len(r["features"]) == FEATURE_DIM
        assert r["n_bytes"] > 0 and len(r["content_sha"]) == 64
    # deterministic across runs
    again = {r["media_id"]: r["features"] for r in extract_media_features(media).collect()}
    assert all(again[k] == rows[k]["features"] for k in rows)


def test_custom_decoder_plugs_in(spark, media):
    import numpy as np

    feats = extract_media_features(
        media, decoder=lambda b, kind: np.zeros(FEATURE_DIM, dtype=np.float32)
    )
    row = feats.first()
    assert row["features"] == [0.0] * FEATURE_DIM


def test_real_decoder_stub_raises():
    with pytest.raises(NotImplementedError):
        require_real_decoders()


def test_media_dedup_by_content(spark):
    base = synthetic_media(spark, n=10)
    dup = base.withColumn("media_id", F.concat(F.lit("z_"), F.col("media_id")))
    both = base.unionByName(dup)
    kept = media_dedup_by_content(both)
    assert kept.count() == 10
    # min media_id wins: originals sort before "z_"-prefixed copies
    assert all(not r["media_id"].startswith("z_") for r in kept.collect())


def test_plan_is_arrow_batched(spark, media):
    df = extract_media_features(media)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    assert "MapInPandas" in plan
