"""Entity mention linking (north-rule stage 6).

Not present in the reference (DELM stops at extracted JSON); this is the
KG extension the north rule requires: normalize mention surfaces, then
broadcast-join the canonical entity dictionary. The dictionary is
broadcast explicitly — it is small by construction (a curated entity
list), so the join is shuffle-free regardless of triple volume.

Beyond the exact lookup, the north star names *dictionary + embedding
blocking* for candidate detection: `surface_embedding` (hashing-trick
character-trigram features, fully native and oracle-reproducible) +
`embedding_link_candidates` (sign-LSH bucket blocking + cosine scoring)
recover surface variants exact matching misses — typos, truncations,
re-orderings — and keep the candidate join an equi-join on the bucket id,
the shape that survives a million-entity dictionary no longer worth
broadcasting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_mention(col: Column) -> Column:
    """Canonical surface form: lowercase, trim, collapse whitespace."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def surface_embedding(col: Column, dim: int = 64) -> Column:
    """Hashing-trick character-trigram embedding of a mention surface
    (array<double> of bucket counts), fully native. Trigram bucket =
    first 4 hex chars of md5 mod dim — the md5 family the LSH/minhash
    operators already use, so an external SQL oracle re-derives identical
    vectors. `^`/`$` padding makes leading/trailing characters count.

    Built as ONE aggregate over the bucket array (fold: acc[b] += 1)
    rather than `dim` filter branches: CollapseProject inlines lambda
    bodies, so a per-bucket filter would duplicate the whole trigram+md5
    subtree `dim` times — a megabyte-scale codegen unit that cost ~9 s of
    Janino compile time per query before any row was processed."""
    padded = F.concat(F.lit("^"), normalize_mention(col), F.lit("$"))
    idx = F.sequence(F.lit(1), F.greatest(F.length(padded) - 2, F.lit(1)))
    tris = F.transform(idx, lambda i: padded.substr(i, F.lit(3)))
    buckets = F.transform(
        tris, lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long") % dim
    )
    zeros = F.array_repeat(F.lit(0.0), dim)
    return F.aggregate(
        buckets,
        zeros,
        lambda acc, b: F.transform(
            acc, lambda v, i: F.when(i == b, v + 1).otherwise(v)
        ),
    )


def _trigram_buckets(surface: str, dim: int, cache: dict) -> list:
    """Python twin of surface_embedding's trigram bucketing for ONE
    already-normalized surface: padded '^s$', windows substr(i, 3) for
    i in 1..max(len-2, 1) (the tail window of a length-2 padded string is
    the whole 2-char string, matching Spark substr semantics), bucket =
    int(md5(utf8)[:4], 16) % dim. `cache` memoizes trigram -> bucket —
    trigram diversity is alphabet-bounded, so the md5 cost amortizes to
    ~zero across a batch."""
    import hashlib

    padded = "^" + surface + "$"
    out = []
    for i in range(max(len(padded) - 2, 1)):
        t = padded[i : i + 3]
        b = cache.get(t)
        if b is None:
            b = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:4], 16) % dim
            cache[t] = b
        out.append(b)
    return out


def surface_embeddings_fast(
    df: DataFrame, surface_col: str, out_col: str, dim: int = 64
) -> DataFrame:
    """Arrow-batched numpy twin of `surface_embedding` — identical
    integer-count vectors (pytest-pinned, tests/test_round5_fixes.py),
    ~30x the throughput: the native column expression is a nested
    higher-order function that evaluates INTERPRETED (~130 us/surface),
    which dominated the linking bench's wall at 100k surfaces.
    Normalization replicates normalize_mention exactly: ASCII-\\s+
    collapse (Java regex \\s is ASCII-only), space-only trim (Spark trim
    strips ' ' only), then lowercase."""
    import re

    import numpy as np
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    ws = re.compile(r"\s+", re.ASCII)
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(DoubleType()))]
    )

    def gen(batches):
        cache: dict = {}
        for pdf in batches:
            vecs = []
            for s in pdf[surface_col]:
                if s is None:
                    # null-propagate like the native HOF expression this
                    # replaced: a null surface gets a null embedding and
                    # posexplode drops the row downstream.
                    vecs.append(None)
                    continue
                norm = ws.sub(" ", s).strip(" ").lower()
                v = np.zeros(dim)
                for b in _trigram_buckets(norm, dim, cache):
                    v[b] += 1.0
                vecs.append(v)
            out = pdf.copy()
            out[out_col] = vecs
            yield out

    return df.mapInPandas(gen, schema)


def embedding_link_candidates(
    mentions: DataFrame,
    dictionary: DataFrame,
    surface_col: str = "surface",
    dim: int = 64,
    n_planes: int = 8,
    probe_radius: int = 2,
    threshold: float = 0.5,
    bands: int = 1,
) -> DataFrame:
    """Embedding-blocked entity-link candidates: each distinct mention
    surface is matched to its best dictionary entity by trigram-embedding
    cosine, with sign-LSH bucket blocking so the candidate lookup is ONE
    equi-join on (band, bucket) (dictionary side exploded to probe masks
    and broadcast; at million-entity scale the same plan runs un-broadcast
    as a plain shuffle equi-join on bounded buckets).

    `bands` > 1 uses that many INDEPENDENT n_planes-bit hash tables (the
    MinHash-LSH banding discipline): a pair is a candidate when ANY band
    matches, so recall is 1-(1-p^r)^b instead of a single table's
    P(Hamming <= radius) — the right regime once the dictionary outgrows
    what one table's bucket count can block (one 8-plane table has only
    256 buckets; with bands, blocking power and recall scale
    independently). bands=1 is the single-table multi-probe scheme the
    oracle queries pin.

    Returns (surface, canonical_id, link_score): the best entity per
    mention with cosine >= threshold (ties break to the smallest
    canonical_id). This is the scoring stage of the north star's
    'dictionary+embedding blocking' — exact dictionary hits should be
    resolved by `link_mentions` first; this recovers the near-miss tail.
    """
    from pyspark.sql import Window

    from delm_spark.operators.similarity import _probe_masks, lsh_bucket

    def band_buckets(vec: Column) -> Column:
        return F.array(
            *[lsh_bucket(vec, dim, n_planes, b * n_planes) for b in range(bands)]
        )

    # Eager cut right after the embedding column on BOTH sides: the
    # nested-HOF trigram expression otherwise gets CollapseProject-inlined
    # into every downstream consumer — 8x into lsh_bucket's plane dots,
    # again into cosine — and analysis/codegen of the composed tree costs
    # SECONDS per action (measured 7.3 s for a 44-row frame) while the
    # same ops over a materialized array column compile in ~0.15 s. Both
    # frames are vocabulary-bounded (distinct mention surfaces /
    # dictionary entries), so the materialization is small by
    # construction.
    # Explicit width for the embedding projection: AQE sizes the dedup
    # shuffle for JVM bytes, and 100k short surfaces coalesce to ONE
    # partition — which would run the (interpreted-HOF) embedding
    # single-threaded. Explicit repartitions are AQE-exempt.
    width = mentions.sparkSession.sparkContext.defaultParallelism
    m = (
        surface_embeddings_fast(
            mentions.select(F.col(surface_col).alias("surface"))
            .dropDuplicates(["surface"])
            .repartition(width),
            "surface",
            "__me",
            dim,
        )
        .localCheckpoint(eager=True)
    )
    m_b = m.select(
        "surface",
        "__me",
        F.posexplode(band_buckets(F.col("__me"))).alias("__band", "__bkt"),
    )
    d = (
        surface_embeddings_fast(
            dictionary.select("surface", "canonical_id")
            # deterministic on duplicate surfaces: smallest canonical id wins
            .groupBy("surface")
            .agg(F.min("canonical_id").alias("canonical_id")),
            "surface",
            "__de",
            dim,
        )
        .localCheckpoint(eager=True)
        .select(F.col("surface").alias("__dsurf"), "canonical_id", "__de")
    )
    masks = _probe_masks(n_planes, probe_radius)
    d_b = (
        d.select(
            "canonical_id",
            "__de",
            F.posexplode(band_buckets(F.col("__de"))).alias("__band", "__b0"),
        )
        .withColumn(
            "__bkt",
            F.explode(
                F.array(*[F.col("__b0").bitwiseXOR(F.lit(mk)) for mk in masks])
            ),
        )
        .drop("__b0")
    )
    # Grouped bucket scoring (cogroup + one numpy matmul per bucket)
    # instead of join-then-per-pair-cosine: the join shape materialized
    # every candidate PAIR as a Spark row carrying BOTH dim-wide arrays
    # (~1 KB/pair crossing Arrow twice), and np.stack ran once per pair
    # row. Here each side's vectors cross into Python ONCE per bucket,
    # the m x d score block is one BLAS matmul, and only the per-surface
    # bucket-local argmax (3 narrow columns) comes back — the global
    # argmax of bucket argmaxes equals the argmax over all pairs because
    # (score desc, canonical_id asc) is a total order. Identical scores:
    # trigram embeddings are integer-valued, so dots and squared norms
    # are exact in float64 under ANY summation order (matmul == einsum
    # == interpreted fold), and the tie-break is reproduced exactly by
    # pre-sorting each bucket's candidates on canonical_id and taking
    # the FIRST maximum.
    scored = _cogroup_bucket_argmax(m_b, d_b)
    w = Window.partitionBy("surface").orderBy(
        F.desc("link_score"), F.asc("canonical_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("link_score") >= threshold))
        .drop("__rn")
    )


#: mention rows per matmul block inside the bucket kernel — bounds the
#: score block at MENTION_BLOCK x bucket_load floats no matter how hot a
#: bucket gets (a skewed 50k x 50k bucket would otherwise be a 20 GB
#: dense matrix in one task)
_MENTION_BLOCK = 2048


def _cogroup_bucket_argmax(m_b: DataFrame, d_b: DataFrame) -> DataFrame:
    """Per-(band, bucket) grouped scoring kernel: cogroup the mention and
    dictionary probe frames, stack each side's embeddings once, score
    with a blocked numpy matmul, and emit ONE row per mention surface —
    its bucket-local best candidate under (score desc, canonical_id asc).

    Scale shape: both sides shuffle once on the bounded (band, bucket)
    key — no broadcast requirement, so the same plan runs unchanged when
    the dictionary outgrows a broadcast; per-task memory is bounded by
    bucket load x dim + the _MENTION_BLOCK-row score block."""
    import numpy as np
    import pandas as pd

    def score(key, mpdf: pd.DataFrame, dpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"surface": [], "canonical_id": [], "link_score": []}
        ).astype({"surface": "object", "canonical_id": "object"})
        if len(mpdf) == 0 or len(dpdf) == 0:
            return empty
        # candidates sorted on canonical_id so np.argmax's first-True
        # semantics IS the smallest-canonical-id tie-break
        dpdf = dpdf.sort_values("canonical_id", kind="mergesort")
        D = np.stack(dpdf["__de"].to_numpy()).astype(np.float64)
        cids = dpdf["canonical_id"].to_numpy()
        dn = np.sqrt(np.einsum("ij,ij->i", D, D))
        surfaces, bests, scores = [], [], []
        for lo in range(0, len(mpdf), _MENTION_BLOCK):
            blk = mpdf.iloc[lo : lo + _MENTION_BLOCK]
            M = np.stack(blk["__me"].to_numpy()).astype(np.float64)
            mn = np.sqrt(np.einsum("ij,ij->i", M, M))
            S = (M @ D.T) / np.maximum(np.outer(mn, dn), 1e-12)
            mx = S.max(axis=1)
            j = np.argmax(S == mx[:, None], axis=1)
            surfaces.append(blk["surface"].to_numpy())
            bests.append(cids[j])
            scores.append(mx)
        return pd.DataFrame(
            {
                "surface": np.concatenate(surfaces),
                "canonical_id": np.concatenate(bests),
                "link_score": np.concatenate(scores),
            }
        )

    return (
        m_b.groupBy("__band", "__bkt")
        .cogroup(d_b.groupBy("__band", "__bkt"))
        .applyInPandas(
            score, "surface string, canonical_id string, link_score double"
        )
    )


def resolve_mention_residue(
    triples: DataFrame,
    dictionary: DataFrame,
    dim: int = 64,
    n_planes: int = 8,
    probe_radius: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Second linking pass (the north star's 'dictionary + EMBEDDING
    blocking'): rewrite `mention:<norm>` ids that exact dictionary lookup
    left behind through `embedding_link_candidates`, so typo'd / truncated
    surfaces resolve to canonical entities.

    Input is `link_mentions` output (subj_id / obj_id present). The
    candidate search runs over DISTINCT unlinked surfaces — bounded by the
    corpus's unique mention vocabulary, not its triple count — and the
    rewrite is two left equi-joins on the mention id (AQE broadcasts the
    resolved map when it is small; at web scale it stays a plain shuffle
    equi-join, never a crossJoin)."""
    mention_ids = (
        # ONE scan of the (checkpointed) triples frame instead of a
        # subj/obj union of two scans (r6) — same multiset, same distinct
        triples.select(
            F.explode(F.array(F.col("subj_id"), F.col("obj_id"))).alias("__mid")
        )
        .filter(F.col("__mid").startswith("mention:"))
        .dropDuplicates(["__mid"])
        # strip the 'mention:' prefix (8 chars) — the residue surface is
        # already normalize_mention()-normalized (idempotent downstream)
        .withColumn("surface", F.expr("substring(__mid, 9)"))
    )
    # residue-free short circuit (r6): with zero unlinked mentions the
    # rewrite is the identity, but the candidate search still costs ~2 s
    # of fixed stage overhead (two Arrow stages, two eager checkpoints, a
    # cogroup shuffle, a window) over empty frames. One cheap existence
    # probe over the already-materialized triples frame skips all of it;
    # corpora with residue pay the probe (one short scan) and proceed
    # unchanged.
    if mention_ids.isEmpty():
        return triples
    cands = embedding_link_candidates(
        mention_ids,
        dictionary,
        dim=dim,
        n_planes=n_planes,
        probe_radius=probe_radius,
        threshold=threshold,
    )
    remap = mention_ids.join(cands, "surface").select("__mid", "canonical_id")
    r_s = remap.select(
        F.col("__mid").alias("__ms"), F.col("canonical_id").alias("__cs")
    )
    r_o = remap.select(
        F.col("__mid").alias("__mo"), F.col("canonical_id").alias("__co")
    )
    return (
        triples.join(r_s, triples["subj_id"] == r_s["__ms"], "left")
        .join(r_o, triples["obj_id"] == r_o["__mo"], "left")
        .withColumn("subj_id", F.coalesce(F.col("__cs"), F.col("subj_id")))
        .withColumn("obj_id", F.coalesce(F.col("__co"), F.col("obj_id")))
        .drop("__ms", "__cs", "__mo", "__co")
    )


def link_mentions(
    triples: DataFrame,
    dictionary: DataFrame,
    subj_col: str = "subj",
    obj_col: str = "obj",
) -> DataFrame:
    """Attach `subj_id` / `obj_id` via broadcast dictionary lookup.

    Unlinked mentions fall back to a deterministic `mention:<norm>` id so
    downstream canonicalization still groups exact-duplicate surfaces.
    """
    dict_s = F.broadcast(
        dictionary.select(
            F.col("surface").alias("__surf_s"), F.col("canonical_id").alias("__cid_s")
        )
    )
    dict_o = F.broadcast(
        dictionary.select(
            F.col("surface").alias("__surf_o"), F.col("canonical_id").alias("__cid_o")
        )
    )
    out = (
        triples.withColumn("__subj_norm", normalize_mention(F.col(subj_col)))
        .withColumn("__obj_norm", normalize_mention(F.col(obj_col)))
        .join(dict_s, F.col("__subj_norm") == F.col("__surf_s"), "left")
        .join(dict_o, F.col("__obj_norm") == F.col("__surf_o"), "left")
        .withColumn(
            "subj_id",
            F.coalesce(F.col("__cid_s"), F.concat(F.lit("mention:"), F.col("__subj_norm"))),
        )
        .withColumn(
            "obj_id",
            F.coalesce(F.col("__cid_o"), F.concat(F.lit("mention:"), F.col("__obj_norm"))),
        )
        .drop("__surf_s", "__surf_o", "__cid_s", "__cid_o", "__subj_norm", "__obj_norm")
    )
    return out
