"""Entity mention linking (north-rule stage 6).

Not present in the reference (DELM stops at extracted JSON); this is the
KG extension the north rule requires: normalize mention surfaces, then
broadcast-join the canonical entity dictionary. The dictionary is
broadcast explicitly — it is small by construction (a curated entity
list), so the join is shuffle-free regardless of triple volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_mention(col: Column) -> Column:
    """Canonical surface form: lowercase, trim, collapse whitespace."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


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
