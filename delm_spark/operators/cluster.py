"""Distributed k-means (Lloyd's algorithm) in exact integer arithmetic.

The missing clustering primitive for training-data curation: domain
discovery / data mixing (cluster the corpus, then stratify the mix by
cluster), SemDeDup-style cell construction, and IVF coarse quantizers
trained on the data instead of sampled from it. The reference
(Center-for-Applied-AI/delm) has no clustering; this follows the repo's
oracle discipline — every number a DuckDB SQL replica can re-derive
bit-for-bit:

* vectors are quantized ONCE to BIGINT micro-units
  (``floor(x * 1e6)`` — floor of an IEEE double is engine-independent),
* distances are exact integer squared-L2 (micro^2 units),
* centroid updates are integer mean ``sum div count`` (both Spark ``div``
  and DuckDB ``//`` truncate toward zero — verified on negatives),
* assignment argmin ties break to the smallest cluster_id,
* init is the md5-ordered deterministic pick the IVF operator already
  uses (`similarity.py ivf_centroids`), so no RNG state leaks into the
  contract.

Exact integer arithmetic makes every aggregation ORDER-INDEPENDENT — the
float Lloyd update ``mean(vec)`` would differ between partitionings in
the last ulp and could flip an assignment; the integer form cannot.

Scale shape (100 TB / 1000-executor framing):

* the input is quantized and ``localCheckpoint``-ed once — each Lloyd
  iteration re-reads the materialized micro-vectors, never the source
  scan (at cluster scale this is the standard persist-the-working-set
  pattern; k iterations = k passes is Lloyd's irreducible cost);
* centroids are k x dim BIGINTs (k<=4096 -> <=2 MiB) — ALWAYS broadcast;
  the assignment is a broadcast nested-loop over k candidates folded by
  a single min(struct) aggregation, no shuffle;
* the update is ONE hash aggregation per iteration shuffled on
  cluster_id with map-side partial sums (dim sum columns + count) —
  bytes shuffled per iteration: O(k x dim x partitions), independent of
  row count;
* distance math is native Catalyst HOFs (zip_with + aggregate) inside
  whole-stage codegen — no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def vec_micro(vec: Column) -> Column:
    """array<float|double> -> array<bigint> micro-units, floor semantics
    (identical in Spark and DuckDB for IEEE doubles)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * MICRO).cast("long")
    )


def _dist2(a: Column, b: Column) -> Column:
    """Exact BIGINT squared L2 between two micro-unit arrays — a native
    zip_with + aggregate fold (codegen, no Python)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans_init(
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "kmeans",
) -> DataFrame:
    """Deterministic seed centroids: the k vectors whose
    ``md5(id || '|salt')`` sorts smallest (the IVF convention —
    quasi-random, engine-reproducible, no RNG). Returns
    (cluster_id 0..k-1 in md5 order, centroid: array<bigint> micro)."""
    from pyspark.sql import Window

    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|" + salt)))
    picked = (
        embeddings.select(key.alias("__k"), vec_micro(F.col(vec_col)).alias("centroid"))
        .orderBy("__k")
        .limit(k)
    )
    # k rows only — the single-partition window is over the already-
    # limited seed set, not the corpus.
    return picked.select(
        (F.row_number().over(Window.orderBy("__k")) - 1).alias("cluster_id"),
        "centroid",
    )


def kmeans_assign(
    vectors_micro: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "vm",
) -> DataFrame:
    """Nearest-centroid assignment with ZERO shuffle of the big side.

    The k centroids are packed into ONE row (collect_list aggregation of
    the tiny centroid table — never the corpus), broadcast, and attached
    by a broadcast nested-loop join of a single row; the argmin is then a
    per-row native fold: ``array_min(transform(cands, c -> struct(dist,
    cluster_id)))`` — struct ordering gives (smallest distance, then
    smallest cluster_id) without recomputing the distance per comparison.
    No groupBy, no exchange, no Python; the only bound is the packed
    centroid row (k x dim x 8 bytes — 2 MiB at k=4096, dim=64).

    Input vectors must already be micro-unit arrays (see `vec_micro`).
    Returns (id_col, vec_col, cluster_id, dist_micro2)."""
    packed = centroids.agg(
        F.collect_list(F.struct("cluster_id", "centroid")).alias("__cands")
    )
    best = F.array_min(
        F.transform(
            F.col("__cands"),
            lambda c: F.struct(
                _dist2(F.col(vec_col), c["centroid"]).alias("dist_micro2"),
                c["cluster_id"].alias("cluster_id"),
            ),
        )
    )
    return (
        vectors_micro.crossJoin(F.broadcast(packed))
        .select(F.col(id_col), F.col(vec_col), best.alias("__best"))
        .select(
            id_col,
            vec_col,
            F.col("__best.cluster_id").alias("cluster_id"),
            F.col("__best.dist_micro2").alias("dist_micro2"),
        )
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "kmeans",
) -> DataFrame:
    """Lloyd's algorithm for `iters` fixed iterations in exact integer
    arithmetic. Returns the final centroid table
    (cluster_id, centroid: array<bigint> micro).

    Per iteration: broadcast-assign (no shuffle) -> ONE hash aggregation
    on cluster_id computing per-dimension integer sums + count (map-side
    combinable) -> centroid = sum div count (truncate toward zero, ==
    DuckDB ``//``). A cluster that loses all members keeps its previous
    centroid. Centroids are localCheckpoint-ed each iteration (k x dim —
    tiny) so the plan does not grow exponentially with iters."""
    # one-row bounded collect: the dimensionality drives codegen width
    dim = int(
        embeddings.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()[0]["d"]
    )
    vm = embeddings.select(
        F.col(id_col), vec_micro(F.col(vec_col)).alias("vm")
    ).localCheckpoint(eager=True)
    cent = kmeans_init(embeddings, k, id_col, vec_col, salt).localCheckpoint(
        eager=True
    )
    sums = [
        F.sum(F.element_at(F.col("vm"), i + 1)).alias(f"__s{i}") for i in range(dim)
    ]
    mean_arr = F.array(
        *[F.expr(f"__s{i} div __cnt").cast("long") for i in range(dim)]
    )
    for _ in range(iters):
        assigned = kmeans_assign(vm, cent, id_col=id_col, vec_col="vm")
        newc = (
            assigned.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("__cnt"), *sums)
            .select("cluster_id", mean_arr.alias("__newc"))
        )
        cent = (
            cent.join(newc, "cluster_id", "left")
            .select(
                "cluster_id",
                F.coalesce(F.col("__newc"), F.col("centroid")).alias("centroid"),
            )
            .localCheckpoint(eager=True)
        )
    return cent


def kmeans_cluster(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "kmeans",
) -> DataFrame:
    """Fit + final assignment: (id_col, cluster_id, dist_micro2), one row
    per input vector."""
    cent = kmeans_fit(embeddings, k, iters, id_col, vec_col, salt)
    vm = embeddings.select(F.col(id_col), vec_micro(F.col(vec_col)).alias("vm"))
    return kmeans_assign(vm, cent, id_col=id_col, vec_col="vm").select(
        id_col, "cluster_id", "dist_micro2"
    )
