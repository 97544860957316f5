"""Extraction-fidelity metrics (A6): precision / recall / F1.

Distributed rebuild of the reference's evaluation
(/root/reference/src/delm/utils/performance_estimation.py:264-388):
per field, tp = |T ∩ P|, fp = |P − T|, fn = |T − P| over per-record value
sets, then P/R/F1 column arithmetic. Sets are realized as exploded
(record, field, value) rows + full-outer join — set semantics without
collecting to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def set_confusion(
    expected: DataFrame,
    extracted: DataFrame,
    keys: list,
    value_cols: list,
) -> DataFrame:
    """Per-field confusion counts over distinct (keys, value) pairs.

    `expected` / `extracted` carry the same `keys` + `value_cols`; each
    value column is one evaluated field. Returns
    (field, tp, fp, fn, precision, recall, f1).
    """
    parts = []
    for c in value_cols:
        t = expected.select(*keys, F.col(c).alias("value")).where(
            F.col(c).isNotNull()
        ).distinct().withColumn("field", F.lit(c))
        p = extracted.select(*keys, F.col(c).alias("value")).where(
            F.col(c).isNotNull()
        ).distinct().withColumn("field", F.lit(c))
        j = t.withColumn("__t", F.lit(1)).join(
            p.withColumn("__p", F.lit(1)),
            on=keys + ["field", "value"],
            how="full_outer",
        )
        parts.append(
            j.groupBy("field").agg(
                F.sum(
                    F.when(F.col("__t").isNotNull() & F.col("__p").isNotNull(), 1).otherwise(0)
                ).alias("tp"),
                F.sum(
                    F.when(F.col("__t").isNull() & F.col("__p").isNotNull(), 1).otherwise(0)
                ).alias("fp"),
                F.sum(
                    F.when(F.col("__t").isNotNull() & F.col("__p").isNull(), 1).otherwise(0)
                ).alias("fn"),
            )
        )
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    # P/R/F1 finalization (reference performance_estimation.py:371-385)
    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    return out.select(
        "field",
        "tp",
        "fp",
        "fn",
        prec.alias("precision"),
        rec.alias("recall"),
        (2 * prec * rec / F.greatest(prec + rec, F.lit(1e-12))).alias("f1"),
    )


def triple_prf(expected: DataFrame, extracted: DataFrame) -> dict:
    """Whole-triple P/R/F1 on distinct (conv_id, subj, pred, obj)."""
    keys = ["conv_id", "subj", "pred", "obj"]
    t = expected.select(*keys).distinct()
    p = extracted.select(*keys).distinct()
    tp = t.join(p, keys, "inner").count()
    n_t, n_p = t.count(), p.count()
    precision = tp / n_p if n_p else 0.0
    recall = tp / n_t if n_t else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "expected": n_t, "predicted": n_p,
            "precision": precision, "recall": recall, "f1": f1}
