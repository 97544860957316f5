"""Incremental KG maintenance: merge a new transcript batch's extraction
into existing nodes/edges tables.

The north-star pipeline materializes partitioned nodes/edges tables; in
production those tables are APPENDED to per ingestion batch, not rebuilt
from 10^12 turns. Incremental correctness here is exact, not
approximate, because every per-triple output is batch-local by
construction: the canonical map derives from the DICTIONARY alone
(kg/canonicalize.canonical_map — driver union-find over the alias graph,
corpus-independent) and embedding residue resolution is per-surface
against the same dictionary. Therefore

    merge(run_pipeline(batch1), run_pipeline(batch2))
        == run_pipeline(batch1 UNION batch2)          (as row sets)

— pinned by tests/test_incremental_kg.py, the same invariant style as
incremental_dedup (exact == from-scratch).

Re-delivered batches are the operational hazard (at-least-once ingestion
feeds): `merge_graph` drops incoming edges whose conv_id is already
present — exactly-once per conversation — so the merge is idempotent.

Scale shape: the edge merge is ONE left-anti semi-join of the (small)
incremental batch against the existing table's conv_id projection — a
pruned single-column scan (Iceberg: partition/bloom pruning serves it
without a full read); the union itself is a metadata append. Nodes are
re-derived from edge endpoints (two map-side projections + one dedup on
entity_id), preserving the build invariant nodes == endpoints(edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nodes_from_edges(edges: DataFrame) -> DataFrame:
    """Node table implied by an edge table: every endpoint with its
    canonical component (same derivation as run_pipeline's build_nodes)."""
    return (
        edges.select(
            F.col("subj_id").alias("entity_id"),
            F.col("subj_canonical").alias("canonical_id"),
        )
        .unionByName(
            edges.select(
                F.col("obj_id").alias("entity_id"),
                F.col("obj_canonical").alias("canonical_id"),
            )
        )
        .dropDuplicates(["entity_id"])
    )


def merge_graph(
    existing_edges: DataFrame,
    new_edges: DataFrame,
    conv_col: str = "conv_id",
    counters: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Merge a new batch's edges into the existing edge table with
    exactly-once-per-conversation semantics; returns (nodes, edges).

    Conversations already present in `existing_edges` are dropped from
    the incoming batch wholesale (a re-delivered batch is a no-op), so
    calling merge_graph twice with the same batch is idempotent.

    PRECONDITION — conv-disjoint batches: the merge == from-scratch
    invariant holds only when each conversation's turns arrive in ONE
    batch. A batch carrying NEW edges for a conv_id already merged (a
    conversation continuing across ingestion windows, or a corrected
    re-extraction) is dropped at conversation granularity, NOT merged
    turn-by-turn. Pass `counters` (any dict) to detect this: it is
    filled with `dropped_conv_ids` (incoming conversations suppressed by
    the exactly-once guard) and `fresh_conv_ids` — a nonzero drop count
    on a feed believed conv-disjoint means re-delivery or a split
    conversation upstream. The two counts cost two single-column
    distinct-count jobs on the (small) batch side only.

    Edges from genuinely new conversations append as-is — per-triple
    outputs are batch-local (see module docstring), so no
    recanonicalization pass is needed.
    """
    fresh = new_edges.join(
        existing_edges.select(conv_col).distinct(), conv_col, "left_anti"
    )
    if counters is not None:
        n_incoming = new_edges.select(conv_col).distinct().count()
        n_fresh = fresh.select(conv_col).distinct().count()
        counters["dropped_conv_ids"] = n_incoming - n_fresh
        counters["fresh_conv_ids"] = n_fresh
    edges = existing_edges.unionByName(fresh)
    return nodes_from_edges(edges), edges
