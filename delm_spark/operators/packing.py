"""Sequence packing: assign documents to fixed token-budget training
sequences ("packs") in a stable global order.

The tokenization-stage operator of a training-data pipeline: documents
are laid out one after another in id order and each is assigned to the
pack in which it STARTS (document-boundary binning — packs may overflow
by at most one document, the standard concat-then-chunk layout's
document-preserving variant).

The naive formulation is a GLOBAL window cumulative sum — a
single-partition sort at 100 TB. This implementation is the classic
two-phase distributed prefix sum instead:

  1. rows are grouped into deterministic id-range blocks; the cumsum
     WITHIN each block is a partitioned window (parallel, shuffle on
     the block key);
  2. per-block totals (one row per block — corpus_size / block_size
     rows, millions at most) get the global running offset with a tiny
     window of their own;
  3. offsets join back on the block key — same partitioning as step 1,
     so Catalyst reuses the exchange.

The DuckDB oracle runs the sequential `SUM() OVER (ORDER BY id)`
formulation, proving the distributed prefix sum computes exactly the
sequential semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from delm_spark.operators.text import whitespace_token_count

__all__ = ["pack_sequences", "pack_summary"]


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 2048,
    block_size: int = 100_000,
) -> DataFrame:
    """Assign each document a `pack_id` (int64): packs are consecutive
    `budget`-token windows over the id-ordered token stream, and a doc
    belongs to the pack its first token falls in. Returns
    (id_col, n_tokens, pack_id). `block_size` trades shuffle width
    against the size of the per-block offset table (corpus_rows /
    block_size rows); any value yields identical output.

    `id_col` must be NUMERIC: the block key `id div block_size` is only
    order-preserving (the prefix-sum correctness condition) for numeric
    ids — a string id would ANSI-fail the division, or with ANSI off
    silently null the block key and drop every row from the join."""
    from pyspark.sql.types import NumericType

    if not isinstance(df.schema[id_col].dataType, NumericType):
        raise TypeError(
            f"pack_sequences needs a numeric id_col for its "
            f"order-preserving block key; {id_col!r} is "
            f"{df.schema[id_col].dataType.simpleString()} — derive a "
            f"numeric rank first"
        )
    tok = whitespace_token_count(F.col(text_col)).cast("long")
    base = df.select(
        F.col(id_col),
        tok.alias("n_tokens"),
        (F.col(id_col) / block_size).cast("long").alias("__blk"),
    )
    w_in = (
        Window.partitionBy("__blk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = base.withColumn("__cs_in", F.sum("n_tokens").over(w_in))
    w_blk = (
        Window.orderBy("__blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy("__blk")
        .agg(F.sum("n_tokens").alias("__bt"))
        .select(
            "__blk",
            F.coalesce(F.sum("__bt").over(w_blk), F.lit(0)).alias("__off"),
        )
    )
    return within.join(offsets, "__blk").select(
        id_col,
        "n_tokens",
        F.expr(f"(__off + __cs_in - n_tokens) div {budget}").alias("pack_id"),
    )


def pack_summary(packed: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-pack census over `pack_sequences` output: document count,
    token total, and the id span (packs are contiguous id ranges by
    construction, so min/max fully describe membership)."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )
