"""Distributed per-record merge of chunk-level extraction results (A1-A4).

Spark-native twin of delm_spark.schemas.merge (itself the parity port of
/root/reference/src/delm/utils/post_processing.py:14-146). The reference's
implicit input-order semantics become explicit ordering columns:

  * majority vote (scalars): groupBy count + first-seen position; winner =
    max count, ties broken by MIN first-seen chunk position — exactly the
    reference's "first value encountered in input order whose count is the
    top count" (post_processing.py:32-38), where input order is chunk order.
  * list / nested containers: sort_array(collect_list(struct(pos, vals)))
    then flatten — concatenation in chunk order, duplicates kept
    (post_processing.py:80-110).

All shuffles are keyed on the record id; one shuffle per merge (the vote
and concat aggregations share the groupBy key, so Catalyst plans a single
exchange per output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from delm_spark.schemas.spec import NestedSpec, SchemaSpec, SimpleSpec


def majority_vote_df(
    values: DataFrame,
    record_col: str = "record_id",
    value_col: str = "value",
    pos_col: str = "pos",
) -> DataFrame:
    """A1: per record, the most frequent value; ties -> value whose FIRST
    occurrence (min pos) is earliest. Input rows = one row per occurrence.

    Returns (record_col, value_col).
    """
    counted = values.groupBy(record_col, value_col).agg(
        F.count(F.lit(1)).alias("__cnt"), F.min(pos_col).alias("__first_pos")
    )
    w = Window.partitionBy(record_col).orderBy(
        F.desc("__cnt"), F.asc("__first_pos")
    )
    return (
        counted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(record_col, value_col)
    )


def merge_nested_records(
    triples: DataFrame,
    record_col: str = "conv_id",
    order_cols: tuple = ("turn_idx", "chunk_pos", "item_pos"),
    item_cols: tuple = ("subj", "pred", "obj"),
) -> DataFrame:
    """A3: concatenate nested-container items per record in chunk order.

    Returns (record_col, items: array<struct<item_cols>>), items ordered by
    `order_cols` — the distributed equivalent of merge_jsons_for_record for
    nested schemas (post_processing.py:99-110).
    """
    ordered_struct = F.struct(
        *[F.col(c) for c in order_cols], *[F.col(c) for c in item_cols]
    )
    agg = triples.groupBy(record_col).agg(
        F.array_sort(F.collect_list(ordered_struct)).alias("__sorted")
    )
    return agg.select(
        record_col,
        F.transform(
            F.col("__sorted"),
            lambda s: F.struct(*[s.getField(c).alias(c) for c in item_cols]),
        ).alias("items"),
    )


def merge_simple_records(
    extracted: DataFrame,
    spec: SchemaSpec,
    record_col: str,
    pos_col: str,
    json_col: str = "delm_extracted_data_json",
) -> DataFrame:
    """A1+A2 for a simple schema: per record, majority-vote scalars and
    order-preserving concat for list vars, from the per-chunk JSON column.

    One wide aggregation: scalars resolved via vote CTEs joined back.
    """
    from delm_spark.schemas.compile import spark_schema_for

    assert isinstance(spec, SimpleSpec)
    schema = spark_schema_for(spec)
    parsed = extracted.select(
        F.col(record_col), F.col(pos_col).alias("__pos"),
        F.from_json(F.col(json_col), schema).alias("__d"),
    )
    out = parsed.select(record_col).distinct()
    list_aggs = []
    for v in spec.variables:
        col = F.col(f"__d.{v.name}")
        if v.is_list():
            list_aggs.append(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("__pos"), col.alias("v")))
                        ),
                        lambda s: s.getField("v"),
                    )
                ).alias(v.name)
            )
        else:
            votes = majority_vote_df(
                parsed.filter(col.isNotNull()).select(
                    record_col, col.alias("value"), F.col("__pos").alias("pos")
                ),
                record_col, "value", "pos",
            ).withColumnRenamed("value", v.name)
            out = out.join(votes, record_col, "left")
    if list_aggs:
        lists = parsed.groupBy(record_col).agg(*list_aggs)
        out = out.join(lists, record_col, "left")
    return out
