"""Incremental KG maintenance (kg/update.py): merging per-batch pipeline
outputs must equal the from-scratch build exactly, and re-delivered
batches must be no-ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from delm_spark.data.synthetic import entity_dictionary, generate_transcripts
from delm_spark.kg.pipeline import PipelineConfig, run_pipeline
from delm_spark.kg.update import merge_graph, nodes_from_edges


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _split_corpus(spark):
    """One synthetic corpus split into two disjoint conv batches."""
    full = generate_transcripts(spark, n_convs=80)
    b1 = full.filter(F.crc32(F.col("conv_id")) % 2 == 0)
    b2 = full.filter(F.crc32(F.col("conv_id")) % 2 == 1)
    return full, b1, b2


def test_incremental_merge_equals_from_scratch(spark):
    full, b1, b2 = _split_corpus(spark)
    d = entity_dictionary(spark)
    cfg = PipelineConfig()
    scratch = run_pipeline(spark, full, d, cfg)
    r1 = run_pipeline(spark, b1, d, cfg)
    r2 = run_pipeline(spark, b2, d, cfg)
    nodes, edges = merge_graph(r1.edges, r2.edges)
    assert _rows(edges) == _rows(scratch.edges)
    assert _rows(nodes) == _rows(scratch.nodes)


def test_incremental_merge_equals_from_scratch_with_embedding_link(spark):
    full, b1, b2 = _split_corpus(spark)
    d = entity_dictionary(spark)
    cfg = PipelineConfig(embedding_link=True)
    scratch = run_pipeline(spark, full, d, cfg)
    r1 = run_pipeline(spark, b1, d, cfg)
    r2 = run_pipeline(spark, b2, d, cfg)
    nodes, edges = merge_graph(r1.edges, r2.edges)
    assert _rows(edges) == _rows(scratch.edges)
    assert _rows(nodes) == _rows(scratch.nodes)


def test_redelivered_batch_is_noop(spark):
    _, b1, b2 = _split_corpus(spark)
    d = entity_dictionary(spark)
    cfg = PipelineConfig()
    r1 = run_pipeline(spark, b1, d, cfg)
    r2 = run_pipeline(spark, b2, d, cfg)
    _, merged = merge_graph(r1.edges, r2.edges)
    # deliver batch 2 again: nothing changes
    nodes2, merged2 = merge_graph(merged, r2.edges)
    assert _rows(merged2) == _rows(merged)
    assert _rows(nodes2) == _rows(nodes_from_edges(merged))


def test_nodes_from_edges_matches_pipeline_nodes(spark):
    full, _, _ = _split_corpus(spark)
    res = run_pipeline(spark, full, entity_dictionary(spark), PipelineConfig())
    assert _rows(nodes_from_edges(res.edges)) == _rows(res.nodes)
