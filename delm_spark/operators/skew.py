"""Hot-key (skew) handling: salting + two-phase aggregation.

The transcript corpus is Zipf-skewed by construction (a head of hot
conversations with hundreds of turns). Three mechanisms, by situation:

  1. AQE skew-join splitting — on by default in the session factory
     (`spark.sql.adaptive.skewJoin.enabled`); covers join-side skew.
  2. Salted repartition — for the Python-heavy extraction stage, a
     round-robin `repartition(n)` suffices because rows carry composite
     keys (no per-partition ordering assumption); for key-preserving
     stages use `repartition_salted` (key + deterministic salt).
  3. Two-phase salted aggregation — for algebraic aggregates over a
     skewed key: partial agg on (key, salt) spreads the hot key over
     `buckets` reducers, final agg on key combines partials. This is
     what map-side combine does for sums/counts already; the explicit
     form also covers collect-heavy aggs where the partial result is a
     bounded reduction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(df_cols: list, buckets: int) -> Column:
    """Deterministic salt in [0, buckets): hash of the full row key —
    no RNG state, stable across retries (rand() is not)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df_cols]), F.lit(buckets))


def repartition_salted(
    df: DataFrame, n_partitions: int, key: str, buckets: int, salt_by: list | None = None
) -> DataFrame:
    """Repartition on (key, salt) so one hot key spreads over `buckets`
    partitions while cold keys stay co-located per (key, salt) pair."""
    salted = df.withColumn("__salt", salt_col(salt_by or df.columns, buckets))
    return salted.repartition(n_partitions, F.col(key), F.col("__salt")).drop("__salt")


def salted_count(
    df: DataFrame, key: str, buckets: int = 16, salt_by: list | None = None
) -> DataFrame:
    """Two-phase count per key: partial count on (key, salt), final sum on
    key. Returns (key, n)."""
    salted = df.withColumn("__salt", salt_col(salt_by or df.columns, buckets))
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__pn"))
    return partial.groupBy(key).agg(F.sum("__pn").alias("n"))


def salted_sum(
    df: DataFrame, key: str, value: str, buckets: int = 16, salt_by: list | None = None
) -> DataFrame:
    """Two-phase sum per key. Returns (key, total)."""
    salted = df.withColumn("__salt", salt_col(salt_by or df.columns, buckets))
    partial = salted.groupBy(key, "__salt").agg(F.sum(value).alias("__ps"))
    return partial.groupBy(key).agg(F.sum("__ps").alias("total"))
