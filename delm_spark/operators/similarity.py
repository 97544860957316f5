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


def cosine_pandas_udf():
    """Arrow-vectorized cosine (Series[array<double>] x2 -> double): the
    higher-order-function `cosine` expression evaluates INTERPRETED
    (~25 us/row) — fine for oracle-scale candidate sets, a bottleneck at
    millions of scored pairs. numpy einsum scores the same pairs ~100x
    faster, and for integer-valued embeddings (the trigram-hash vectors)
    the result is BIT-IDENTICAL: dot products and squared norms of small
    ints are exact in float64 under any summation order."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    def _cos(a, b):
        A = np.stack(a.to_numpy())
        B = np.stack(b.to_numpy())
        num = np.einsum("ij,ij->i", A, B)
        den = np.maximum(
            np.sqrt(np.einsum("ij,ij->i", A, A))
            * np.sqrt(np.einsum("ij,ij->i", B, B)),
            1e-12,
        )
        return pd.Series(num / den)

    return F.pandas_udf(_cos, DoubleType())


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

    The rank<=k filter over row_number() compiles to WindowGroupLimit
    pushdown (Spark 3.5+): a PARTIAL group-limit runs in each map task
    before the exchange, so at most k rows per query leave any input
    partition — the shuffle carries O(partitions * q * k) rows, never the
    N*q scored rows, and the final per-query merge is tiny. Plan-asserted
    (tests/test_plan_quality.py::test_topk_partial_group_limit).

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


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse quantizer for IVF: the `n_centroids` vectors
    with the smallest md5(vec_id || '|ivf') — a reproducible pseudo-random
    sample any SQL engine re-derives (no RNG state ships around; same
    trick as the LSH hyperplanes). A k-means refinement would drop in here
    without changing the search path."""
    return (
        embeddings.select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("__cv"),
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|ivf"))).alias("__r"),
        )
        .orderBy("__r")
        .limit(n_centroids)
        .drop("__r")
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine; ties break
    to the smallest centroid_id). The N x C distance pass is the standard
    IVF build cost; the centroid set is broadcast, so the build is one
    map-side pass + one groupBy(id) — no all-pairs shuffle. Returns
    (id_col, vec_col, __cell)."""
    scored = embeddings.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        cosine(F.col(vec_col), F.col("__cv")).alias("__sim"),
    )
    # argmax via min(struct(-sim, centroid_id)): smallest -sim = largest
    # sim, tie -> smallest centroid_id. Negating the SIM (always double)
    # keeps this correct for any orderable id type — string vec_ids would
    # null out under an id negation.
    best = F.min(
        F.struct((-F.col("__sim")).alias("__ns"), F.col("centroid_id"))
    ).alias("__best")
    return (
        scored.groupBy(id_col)
        .agg(best, F.first(vec_col).alias(vec_col))
        .select(id_col, vec_col, F.col("__best.centroid_id").alias("__cell"))
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: vectors are pre-binned into `n_centroids`
    cells (nearest centroid); each query probes its `nprobe` closest cells
    and exact-cosine re-ranks only the vectors inside them — the classic
    inverted-file ANN layout, complementary to the sign-LSH path
    (lsh_topk): IVF adapts to the data distribution, LSH is data-oblivious.

    Scale shape: the centroid set and the exploded (query, cell) probe set
    broadcast; the candidate lookup is ONE equi-join on the cell id against
    the assigned table (at 100 TB, `ivf_assign` is materialized once and
    the assigned table is partitioned/bucketed by cell, so the probe join
    prunes to the probed cells); the final per-query merge ships at most k
    rows per task via WindowGroupLimit (see brute_force_topk). Size
    n_centroids ~ sqrt(N) so cells stay executor-sized.

    Returns (query_id, vec_id, score, rank).
    """
    from pyspark.sql import Window

    cents = ivf_centroids(embeddings, n_centroids, id_col, vec_col)
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)
    qs = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    qc = qs.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "__qv",
        "centroid_id",
        cosine(F.col("__qv"), F.col("__cv")).alias("__sim"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.desc("__sim"), F.asc("centroid_id")
    )
    probes = (
        qc.withColumn("__pr", F.row_number().over(wp))
        .filter(F.col("__pr") <= nprobe)
        .select("query_id", "__qv", F.col("centroid_id").alias("__cell"))
    )
    scored = assigned.join(F.broadcast(probes), "__cell").select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine(F.col(vec_col), F.col("__qv")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    probe_radius: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold): the dedup-flavored sibling of lsh_topk — a sign-LSH
    bucket SELF-join blocks the candidate space (pairs within Hamming
    distance `probe_radius` of each other's bucket), exact cosine
    re-ranks candidates only. Never all-pairs; the join key is the
    bucket id, uniformly distributed, so the shuffle survives a 100x
    corpus. The cosine is rounded to 6 dp before thresholding so an
    external oracle thresholds identically.

    Returns (id_a, id_b, cos_sim).
    """
    sig = embeddings.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).withColumn("__bkt", lsh_bucket(F.col("__v"), dim, n_planes))
    masks = _probe_masks(n_planes, probe_radius)
    probed = sig.select(
        "__id",
        "__v",
        F.explode(
            F.array(*[F.col("__bkt").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("__pbkt"),
    )
    a, b = probed.alias("a"), sig.alias("b")
    # a's probe set meets b's home bucket exactly once per pair within
    # the Hamming radius (XOR masks are unique), so no post-join dedup
    pairs = a.join(
        b,
        (F.col("a.__pbkt") == F.col("b.__bkt"))
        & (F.col("a.__id") < F.col("b.__id")),
    ).select(
        F.col("a.__id").alias("id_a"),
        F.col("b.__id").alias("id_b"),
        F.round(cosine(F.col("a.__v"), F.col("b.__v")), 6).alias("cos_sim"),
    )
    return pairs.filter(F.col("cos_sim") >= threshold)


def hyperplane_signs(dim: int, plane_idx: int) -> list:
    """Deterministic pseudo-random hyperplane: component j's sign derives
    from md5('plane{p}|{j}') — reproducible in any engine (the correctness
    oracle re-derives the same planes), values in {-1.0, +1.0} suffice for
    sign-LSH. Computed once on the driver; the plan sees literals."""
    import hashlib

    signs = []
    for j in range(dim):
        h = hashlib.md5(f"plane{plane_idx}|{j}".encode()).hexdigest()
        signs.append(1.0 if int(h[:8], 16) % 2 == 0 else -1.0)
    return signs


def lsh_bucket(
    vec: Column, dim: int, n_planes: int = 8, plane_offset: int = 0
) -> Column:
    """Sign-LSH bucket id: n_planes-bit signature of hyperplane sign bits.
    `plane_offset` selects an independent plane family — band b of a
    banded scheme uses planes [b*n_planes, (b+1)*n_planes)."""
    acc = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(s) for s in hyperplane_signs(dim, plane_offset + p)])
        bit = (dot(vec, plane) >= 0).cast("long")
        acc = acc + bit * F.lit(1 << p)
    return acc


def _probe_masks(n_planes: int, radius: int) -> list:
    """All XOR masks with popcount <= radius — the multi-probe bucket set."""
    return [m for m in range(1 << n_planes) if bin(m).count("1") <= radius]


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    probe_radius: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: multi-probe sign-LSH. Candidates are embeddings
    whose bucket is within Hamming distance `probe_radius` of the query's
    bucket; exact cosine re-rank inside. The query side explodes to its
    probe buckets (C(n_planes, <=radius) rows per query — tiny, broadcast),
    so the candidate lookup stays ONE equi-join on the bucket id; the
    embedding side is scanned and bucketed exactly once, no shuffle beyond
    the final per-query top-k window — which itself ships at most k rows
    per query per map task via WindowGroupLimit pushdown (see
    brute_force_topk).

    probe_radius=0 is classic single-bucket LSH (~2^n_planes candidate
    reduction); raising it trades candidates for recall — for planted
    near-duplicates (cos >= 0.95) n_planes=8, radius=2 gives recall >= 0.9
    (pytest-asserted), while uniform-random 'neighbors' (cos ~ 0.3) are
    fundamentally not LSH-recoverable at useful candidate reductions."""
    from pyspark.sql import Window

    emb_b = embeddings.withColumn("__bkt", lsh_bucket(F.col(vec_col), dim, n_planes))
    q_sig = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("__qbkt", lsh_bucket(F.col("__qv"), dim, n_planes))
    masks = _probe_masks(n_planes, probe_radius)
    q_b = F.broadcast(
        q_sig.withColumn(
            "__bkt",
            F.explode(
                F.array(*[F.col("__qbkt").bitwiseXOR(F.lit(m)) for m in masks])
            ),
        )
    )
    # buckets partition the space, so each (query, embedding) pair matches
    # through at most one probe mask — no post-join dedup needed
    scored = emb_b.join(q_b, "__bkt").select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine(F.col(vec_col), F.col("__qv")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_dedup(
    embeddings: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then mark a vector a
    duplicate iff an EARLIER (smaller-id) vector in the SAME cluster has
    cosine >= threshold. Complementary to the LSH near-dup path
    (embedding_near_dup_pairs): clustering adapts to the data
    distribution, so paraphrase-dense regions dedup against their own
    neighborhood instead of a global oblivious hash.

    Scale shape: centroid pick + assignment reuse the IVF build (broadcast
    centroids, one map pass + one groupBy); the pair search is a self
    equi-join ON THE CELL ID ONLY — never all-pairs. Cell sizes are
    bounded by n_clusters ~ sqrt(N) sizing (same contract as ivf_topk);
    a pathologically hot cell is an input-data signal (embedding collapse)
    the cell-size histogram in the returned frame exposes. The cosine is
    rounded to 6 dp before the threshold compare so any engine
    re-derives identical keep/drop decisions.

    Returns (vec_id, cell, is_dup) for every input vector; downstream
    keeps `is_dup = false` rows (the earliest representative of every
    semantic neighborhood survives, deterministically).
    """
    cents = ivf_centroids(embeddings, n_clusters, id_col, vec_col)
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)
    left = assigned.select(
        F.col("__cell"), F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    )
    right = assigned.select(
        F.col("__cell"),
        F.col(id_col).alias("__id2"),
        F.col(vec_col).alias("__v2"),
    )
    hits = (
        left.join(right, "__cell")
        .filter(F.col("__id2") < F.col("__id"))
        .filter(F.round(cosine(F.col("__v"), F.col("__v2")), 6) >= threshold)
        .select("__id")
        .distinct()
    )
    return (
        assigned.join(
            hits.withColumn("__dup", F.lit(True)),
            assigned[id_col] == hits["__id"],
            "left",
        )
        .select(
            F.col(id_col).alias("vec_id"),
            F.col("__cell").alias("cell"),
            F.coalesce(F.col("__dup"), F.lit(False)).alias("is_dup"),
        )
    )
