"""Seeded sampling (S12).

The reference samples exactly n records with a fixed seed
(/root/reference/src/delm/delm.py:237-240, seed 42 constants.py:110:
`df.sample(n=sample_size, random_state=SYSTEM_RANDOM_SEED)`). Spark's
`df.sample` is fraction-based AND partitioning-dependent, so the
distributed equivalent keys the selection on a deterministic hash of the
row's natural key: order by xxhash64(seed, key), take n. Catalyst plans
orderBy+limit as TakeOrderedAndProject (per-partition top-n + driver
merge) — no global sort shuffle, stable under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SYSTEM_RANDOM_SEED = 42  # reference constants.py:110


def seeded_sample(
    df: DataFrame, n: int, key_cols: list, seed: int = SYSTEM_RANDOM_SEED
) -> DataFrame:
    """Exactly-n deterministic sample keyed on `key_cols`."""
    h = F.xxhash64(F.lit(f"sample{seed}"), *[F.col(c) for c in key_cols])
    return df.orderBy(h.asc(), *[F.col(c) for c in key_cols]).limit(n)


def seeded_sample_records(
    df: DataFrame, n: int, record_col: str, seed: int = SYSTEM_RANDOM_SEED
) -> DataFrame:
    """Sample n RECORDS (all rows of each sampled record), the reference's
    record-level sample semantics: pick record ids by hash order, then a
    broadcast semi-join keeps their rows."""
    ids = seeded_sample(df.select(record_col).distinct(), n, [record_col], seed)
    return df.join(F.broadcast(ids), record_col, "left_semi")
