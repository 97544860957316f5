"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — correctness baseline; native `aggregate`/
    `zip_with` dot product, single pass, no UDF
  * LSH-bucketed ANN — scale path: random-hyperplane signatures block the
    candidate space; exact cosine re-rank inside buckets. Hyperplanes are
    derived deterministically from xxhash64 so no RNG state ships around.

At 100 TB the brute-force path is a broadcast of the (small) query set
against a full scan — embarrassingly parallel, no shuffle; the ANN path
shuffles once on bucket id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine(a: Column, b: Column) -> Column:
    return (
        dot(a, b) / (F.greatest(l2_norm(a) * l2_norm(b), F.lit(1e-12)))
    ).cast("double")


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. `queries` (query_id, embedding) is
    broadcast; ranking is a window per query id.

    Returns (query_id, vec_id, score, rank).
    """
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        )
    )
    scored = embeddings.crossJoin(q).select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine(F.col(vec_col), F.col("__qv")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(dim: int, plane_idx: int) -> Column:
    """Deterministic pseudo-random hyperplane: component j has sign derived
    from xxhash64(plane, j). Values in {-1.0, +1.0} suffice for sign-LSH."""
    return F.array(
        *[
            F.when(
                F.xxhash64(F.lit(f"plane{plane_idx}"), F.lit(j)) % 2 == 0, F.lit(1.0)
            ).otherwise(F.lit(-1.0))
            for j in range(dim)
        ]
    )


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-LSH bucket id: n_planes-bit signature of hyperplane sign bits."""
    acc = F.lit(0).cast("long")
    for p in range(n_planes):
        bit = (dot(vec, _hyperplane(dim, p)) >= 0).cast("long")
        acc = acc + bit * F.lit(1 << p)
    return acc


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket,
    exact cosine re-rank inside. Trades recall for a ~2^n_planes candidate
    reduction; rerun with fewer planes (or multi-probe) for higher recall."""
    from pyspark.sql import Window

    emb_b = embeddings.withColumn("__bkt", lsh_bucket(F.col(vec_col), dim, n_planes))
    q_b = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        ).withColumn("__bkt", lsh_bucket(F.col("__qv"), dim, n_planes))
    )
    scored = emb_b.join(q_b, "__bkt").select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine(F.col(vec_col), F.col("__qv")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
