"""Mergeable cardinality sketches: k-minimum-values (KMV) and
HyperLogLog — the 100-TB answer to "how many distinct X" when an exact
count-distinct shuffle is too expensive or the counts must be merged
across partitions/days/shards.

Spark ships approx_count_distinct (HLL++), but its register hashing is
engine-internal: the result is not reproducible outside Spark, so it
cannot sit under this repo's cross-engine correctness oracle, and its
sketch bytes cannot be merged by a non-Spark consumer. These two
operators use md5-derived hashes and EXACT integer arithmetic end to
end, so DuckDB re-derives the estimate bit-for-bit and the register /
min-hash tables are portable.

- `kmv_distinct` (Bar-Yossef et al. 2002): keep the k smallest 48-bit
  hashes; estimate = (k-1) * 2^48 / h_k. Plan: one distinct-hash
  shuffle + TakeOrdered(k) (per-partition partial top-k, only k rows
  per partition ever reach the driver-side limit). Exact (returns the
  true count) whenever the true cardinality < k.
- `hll_cardinality` (Flajolet et al. 2007): p=8 -> 256 registers from
  the first 2 md5 hex chars, rank rho from the next 24 bits. The
  harmonic mean is computed as the exact BIGINT sum
  S = sum_j 2^(25 - M_j) (so 1/S replaces sum 2^-M / 2^25), and the
  estimate alpha * m^2 / sum(2^-M) becomes the exact integer
  (alpha_micro * m^2 * 2^25) div S — every quantity fits comfortably
  in 63 bits at p=8. Small-range linear counting uses the repo's
  micronat discipline (ln applied only to whole-sketch integer counts,
  never per-row floats). Plan: one map pass + a 256-row aggregation —
  the register table is map-side combinable (max per register), the
  canonical mergeable-sketch shape.

The reference (Center-for-Applied-AI/delm) has no sketch/approximate
operators; these extend the training-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH48 = 1 << 48  # KMV hash space: 12 md5 hex chars


def _h48(c: Column) -> Column:
    """First 48 bits of md5 as a BIGINT (sign-safe, SQL-reproducible:
    DuckDB ('0x' || substr(md5(x), 1, 12))::BIGINT)."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10).cast(
        "long"
    )


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """k-minimum-values distinct-count sketch over `col`.

    Returns one row (k_used, kth_hash, est_distinct). est_distinct is
    the exact distinct count when fewer than k distinct hashes exist,
    else the KMV estimator (k-1) * 2^48 div kth_hash.
    """
    if not 2 <= k <= 1 << 20:
        raise ValueError(f"k must be in [2, 2^20], got {k}")
    mins = (
        df.select(_h48(F.col(col)).alias("__h"))
        .distinct()
        .orderBy("__h")
        .limit(k)
    )
    return mins.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("__h").alias("kth_hash"),
    ).select(
        "k_used",
        "kth_hash",
        F.when(F.col("k_used") < k, F.col("k_used"))
        .otherwise(
            F.expr(f"CAST({(k - 1) * _HASH48} AS BIGINT) div kth_hash")
        )
        .cast("long")
        .alias("est_distinct"),
    )


def hll_alpha_micro(m: int) -> int:
    """alpha_m of the HLL paper in exact micro-units (m >= 128 branch),
    quantized once on the driver so Spark and the SQL oracle share the
    same integer constant."""
    return round(0.7213 / (1 + 1.079 / m) * 1_000_000)


def hll_cardinality(df: DataFrame, col: str, p: int = 8) -> DataFrame:
    """HyperLogLog distinct-count estimate over `col`, exact-integer.

    p=8 is fixed by the 63-bit headroom analysis in the module
    docstring (m=256 registers, 24-bit rank field, rho in [1, 25]);
    other p would need re-derived bounds, so it is validated hard.

    Returns one row (m, n_used, s_scaled, est_distinct):
      s_scaled     — sum_j 2^(25 - M_j) over all m registers (empty
                     registers contribute 2^25), the exact harmonic
                     denominator scaled by 2^25,
      est_distinct — linear counting m * ln(m / n_empty) when the raw
                     estimate <= 2.5 m and empty registers exist
                     (micronat-quantized ln of whole-sketch counts),
                     else the raw (alpha_micro * m^2 * 2^25) div s.
    """
    if p != 8:
        raise ValueError(f"only p=8 is supported (integer bounds), got {p}")
    m = 1 << p
    alpha_micro = hll_alpha_micro(m)
    h = F.md5(F.col(col).cast("string"))
    rem_hex = F.substring(h, 3, 6)
    rem = F.conv(rem_hex, 16, 10).cast("long")
    # rho = leading zeros of the 24-bit field + 1; conv(hex, 16, 2)
    # strips leading zeros, so its length IS the bit length
    rho = F.when(rem == 0, F.lit(25)).otherwise(
        F.lit(25) - F.length(F.conv(rem_hex, 16, 2))
    )
    regs = (
        df.select(
            F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("__reg"),
            rho.alias("__rho"),
        )
        .groupBy("__reg")
        .agg(F.max("__rho").alias("M"))
    )
    agg = regs.agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 25 - M)")).alias(
            "__s_used"
        ),
    )
    s = (
        F.col("__s_used")
        + (F.lit(m) - F.col("n_used")) * F.lit(1 << 25).cast("long")
    ).alias("s_scaled")
    raw_micro = F.expr(
        f"CAST({alpha_micro * m * m} AS BIGINT) * {1 << 25} div "
        f"(__s_used + ({m} - n_used) * {1 << 25})"
    )
    n_empty = F.lit(m) - F.col("n_used")
    # m * ln(m / V) with ln in micronats of integer counts (repo-standard
    # quantization: floor(ln * 1e6 + 0.5) applied to m and V only)
    lc_micro = F.lit(m) * (
        F.floor(F.log(F.lit(float(m))) * 1e6 + 0.5).cast("long")
        - F.floor(F.log(n_empty.cast("double")) * 1e6 + 0.5).cast("long")
    )
    est_micro = F.when(
        (n_empty > 0) & (raw_micro * 2 <= F.lit(5_000_000) * m), lc_micro
    ).otherwise(raw_micro)
    # exact integer floor-div: strip the remainder first so the double
    # division is a representable-multiple / 1e6 (est_micro < 2^53)
    est = ((est_micro - est_micro % 1_000_000) / 1_000_000).cast("long")
    return agg.select(
        F.lit(m).alias("m"),
        "n_used",
        s,
        est.alias("est_distinct"),
    )
