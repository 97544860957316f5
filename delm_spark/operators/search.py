"""Full-text keyword search: BM25 ranking over a document corpus.

The retrieval primitive a training-data / RAG pipeline needs next to
ANN: exact lexical top-k with the Okapi BM25 weighting. Expressed
Spark-first:

- document length and the corpus profile (N, avgdl) come from native
  per-row expressions plus ONE 1-row aggregate (broadcast);
- the token stream is filtered to the query's terms BEFORE any shuffle,
  so term-frequency and document-frequency aggregations only ever see
  rows matching the (tiny) query vocabulary — at 100 TB the exploded
  token stream never hits an exchange, only the per-(doc, term) matches
  do, and those are bounded by the posting lists of the query terms;
- scores are fixed-point micro-units: every float input to the formula
  is derived from integer counts identically in any engine, and the
  per-term score is quantized to int64 *before* the per-doc sum, so
  aggregation order cannot perturb ranking (and the DuckDB oracle
  reproduces scores exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delm_spark.operators.dedup import normalize_text

__all__ = ["bm25_topk"]


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for `query_terms` under Okapi BM25.

    idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)   (Robertson-Sparck
    Jones, the +1 form that keeps weights positive); per-term
    contribution idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
    quantized to micro-units per (doc, term) then summed. Returns
    (id_col, score_micro, n_terms_hit) ordered by score desc, id asc,
    limited to k.
    """
    # dedupe after lowercasing (order-preserving): duplicate or
    # case-colliding terms would double df, scores, and n_terms_hit
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    if not terms:
        raise ValueError("bm25_topk requires at least one query term")
    words = F.split(normalize_text(F.col(text_col)), " ")
    docs = df.select(F.col(id_col), F.size(words).alias("dl"), words.alias("__w"))
    profile = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    # token stream restricted to query terms before the explode leaves
    # the row: per-doc tf via native array filters, no full-token shuffle.
    # NB: capture the term via a factory — a defaulted second lambda arg
    # would be bound to the array index by PySpark's HOF dispatch.
    def _tf(term: str):
        return F.size(F.filter(F.col("__w"), lambda w: w == F.lit(term)))

    tf_cols = [_tf(t).alias(f"__tf_{i}") for i, t in enumerate(terms)]
    per_doc = docs.select(id_col, "dl", *tf_cols)
    stacked = per_doc.select(
        id_col,
        "dl",
        F.explode(
            F.filter(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("term"),
                            F.col(f"__tf_{i}").cast("long").alias("tf"),
                        )
                        for i, t in enumerate(terms)
                    ]
                ),
                lambda s: s.getField("tf") > 0,
            )
        ).alias("m"),
    ).select(id_col, "dl", F.col("m.term").alias("term"), F.col("m.tf").alias("tf"))
    dfreq = stacked.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = (
        stacked.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(profile))
        .select(
            id_col,
            F.floor(
                F.log(
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * (
                    F.col("tf")
                    * F.lit(k1 + 1.0)
                    / (
                        F.col("tf")
                        + F.lit(k1)
                        * (
                            F.lit(1.0 - b)
                            + F.lit(b)
                            * F.col("dl")
                            / (F.col("sum_dl") / F.col("n_docs"))
                        )
                    )
                )
                * 1e6
                + 0.5
            )
            .cast("long")
            .alias("score_micro"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("score_micro").cast("long").alias("score_micro"),
            F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
        )
        .orderBy(F.desc("score_micro"), F.asc(id_col))
        .limit(k)
    )
