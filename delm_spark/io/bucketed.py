"""Bucketed staging tables: shuffle-free co-located joins at scale.

At 100 TB the dominant repeated cost of the KG pipeline's relational side
is re-shuffling big fact tables on the same join key run after run
(chunks x extractions on record id, triples x triples on entity id).
Bucketing pre-partitions the data ON DISK by the join key: two tables
bucketed by the same key into the same bucket count join with NO exchange
on either side — Spark matches bucket files pairwise (SortMergeJoin with
both exchanges elided; only intra-bucket sorts remain).

Spark's bucketing rides the session catalog (`saveAsTable` +
`bucketBy`) — plain `.parquet(path)` writes cannot carry bucket metadata.
The helpers here wrap that, defaulting to the current database, and the
plan property is asserted in tests/test_bucketed.py (joining two tables
bucketed on the key shows zero Exchange nodes even with broadcast joins
disabled).

Reference tie-in: the reference consolidates extraction batches by
re-reading feather files (experiment_manager.py:385-484) — at Spark scale
the staging analog is a bucketed table keyed by the downstream join key,
so consolidation never pays the shuffle again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (optionally sorted) catalog table.

    `n_buckets` should be sized so one bucket of the LARGER table fits an
    executor's memory at target scale (e.g. 100 TB / 64k buckets ~ 1.6 GB);
    both sides of a co-located join must use the same n_buckets and key.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata only survives the catalog
    read path — a direct parquet read of the same files would lose it)."""
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the plan
    contains no Exchange on either side (asserted in tests)."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on, how
    )
