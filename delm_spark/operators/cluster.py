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


def _assign_best_expr(cent_rows, vec_col: str) -> Column:
    """argmin struct over a CONSTANT-FOLDED literal centroid array (r6):
    the centroid table is model state (k x dim BIGINTs, <= 2 MiB at the
    k=4096 ceiling), so shipping it as a literal — folded ONCE by
    ConstantFolding, never re-evaluated per row — replaces the broadcast
    crossJoin of a packed row without changing a single distance or
    tie-break (same struct types: long dist, int cluster_id)."""
    cands = F.array(
        *[
            F.struct(
                F.lit(int(cid)).alias("cluster_id"),
                F.array(*[F.lit(int(x)) for x in c])
                .cast("array<bigint>")
                .alias("centroid"),
            )
            for cid, c in cent_rows
        ]
    )
    return F.array_min(
        F.transform(
            cands,
            lambda c: F.struct(
                _dist2(F.col(vec_col), c["centroid"]).alias("dist_micro2"),
                c["cluster_id"].alias("cluster_id"),
            ),
        )
    )


def _div_trunc(s: int, c: int) -> int:
    """Python twin of Spark/DuckDB BIGINT `div`: truncate toward zero
    (Python `//` floors, which differs on negative sums)."""
    return -((-s) // c) if s < 0 else s // c


def _kmeans_fit_rows(
    embeddings: DataFrame,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
    salt: str,
):
    """Driver-side Lloyd loop (r6): per iteration ONE job — the
    assignment + per-cluster integer sums aggregation — whose k-row
    result is collected and the `sum div count` update applied in exact
    Python integer arithmetic (bit-identical to the previous
    `__s div __cnt` Spark expression; `_div_trunc` reproduces the
    truncate-toward-zero semantics). This replaces the per-iteration
    join + localCheckpoint of the centroid table (2 jobs -> 1, no
    checkpoint blocks), the same driver-resident-model shape Spark
    MLlib's KMeans uses: centroids are k x dim model state, bounded and
    collected by design — the corpus never leaves the executors.

    Returns (cent_rows, vm) where cent_rows is a list of
    (cluster_id, centroid list) and vm the localCheckpoint-ed micro
    vectors for reuse by the caller's final assignment."""
    vm = embeddings.select(
        F.col(id_col), vec_micro(F.col(vec_col)).alias("vm")
    ).localCheckpoint(eager=True)
    init = kmeans_init(embeddings, k, id_col, vec_col, salt).collect()
    cent_rows = [(int(r["cluster_id"]), list(r["centroid"])) for r in init]
    if not cent_rows:
        return [], vm
    dim = len(cent_rows[0][1])
    sums = [
        F.sum(F.element_at(F.col("vm"), i + 1)).alias(f"__s{i}") for i in range(dim)
    ]
    for _ in range(iters):
        best = _assign_best_expr(cent_rows, "vm")
        stats = (
            vm.select(best.getField("cluster_id").alias("cluster_id"), "vm")
            .groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("__cnt"), *sums)
            .collect()
        )
        by_cluster = {int(r["cluster_id"]): r for r in stats}
        nxt = []
        for cid, old in cent_rows:
            r = by_cluster.get(cid)
            if r is None:
                # a cluster that loses all members keeps its centroid
                nxt.append((cid, old))
            else:
                cnt = int(r["__cnt"])
                nxt.append(
                    (cid, [_div_trunc(int(r[f"__s{i}"]), cnt) for i in range(dim)])
                )
        cent_rows = nxt
    return cent_rows, vm


def _cent_rows_df(spark, cent_rows) -> DataFrame:
    """(cluster_id int, centroid array<bigint>) as an Arrow-backed local
    frame (LocalTableScan — no Python-RDD tasks on downstream actions)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "cluster_id": [c for c, _ in cent_rows],
            "centroid": [list(v) for _, v in cent_rows],
        }
    )
    return spark.createDataFrame(pdf, "cluster_id int, centroid array<bigint>")


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

    Per iteration: literal-centroid assignment (no shuffle of the corpus
    side) -> ONE hash aggregation on cluster_id computing per-dimension
    integer sums + count (map-side combinable) -> centroid = sum div
    count (truncate toward zero, == DuckDB ``//``), applied driver-side
    (see _kmeans_fit_rows). A cluster that loses all members keeps its
    previous centroid."""
    cent_rows, _ = _kmeans_fit_rows(embeddings, k, iters, id_col, vec_col, salt)
    return _cent_rows_df(embeddings.sparkSession, cent_rows)


def kmeans_cluster(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "kmeans",
) -> DataFrame:
    """Fit + final assignment: (id_col, cluster_id, dist_micro2), one row
    per input vector. The final assignment reuses the fit's
    checkpointed micro vectors (the source scan runs once, not twice)."""
    cent_rows, vm = _kmeans_fit_rows(embeddings, k, iters, id_col, vec_col, salt)
    if not cent_rows:
        return vm.select(
            F.col(id_col),
            F.lit(None).cast("int").alias("cluster_id"),
            F.lit(None).cast("long").alias("dist_micro2"),
        )
    # two-step select: the argmin fold is interpreted (HOF) and consumed
    # by two fields — aliasing it once keeps it evaluated once per row
    best = _assign_best_expr(cent_rows, "vm")
    return vm.select(F.col(id_col), best.alias("__best")).select(
        id_col,
        F.col("__best.cluster_id").alias("cluster_id"),
        F.col("__best.dist_micro2").alias("dist_micro2"),
    )
