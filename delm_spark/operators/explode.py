"""JSON-result explosion (X1) — one row per extracted item.

Native rebuild of the reference's row-loop explode
(/root/reference/src/delm/utils/post_processing.py:149-272):
  simple   -> one row per record (list fields kept as lists)
  nested   -> posexplode of the container array
  multiple -> per-sub-schema select + lit(schema_name) + unionByName

Column naming matches the reference: plain variable names for simple and
nested; `<schema_name>_<var>` plus a `schema_name` column for multiple
(post_processing.py:229-243, 269-270).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delm_spark.constants import EXTRACTED_JSON_COL
from delm_spark.schemas.compile import spark_schema_for
from delm_spark.schemas.spec import MultipleSpec, NestedSpec, SchemaSpec, SimpleSpec


def explode_json_results(
    df: DataFrame,
    spec: SchemaSpec,
    json_col: str = EXTRACTED_JSON_COL,
    keep_cols: list | None = None,
) -> DataFrame:
    keep = keep_cols if keep_cols is not None else [
        c for c in df.columns if c != json_col
    ]
    schema = spark_schema_for(spec)
    parsed = df.withColumn("__d", F.from_json(F.col(json_col), schema)).filter(
        F.col(json_col).isNotNull() & (F.col(json_col) != "{}")
    )
    sys_cols = [F.col(c) for c in keep]

    if isinstance(spec, SimpleSpec):
        return parsed.select(
            *sys_cols, *[F.col(f"__d.{v.name}").alias(v.name) for v in spec.variables]
        )

    if isinstance(spec, NestedSpec):
        return parsed.select(
            *sys_cols, F.explode(f"__d.{spec.container_name}").alias("__item")
        ).select(
            *sys_cols, *[F.col(f"__item.{v.name}").alias(v.name) for v in spec.variables]
        )

    if isinstance(spec, MultipleSpec):
        parts = []
        for name, sub in spec.schemas:
            if isinstance(sub, NestedSpec):
                part = parsed.select(
                    *sys_cols, F.explode(f"__d.{name}").alias("__item")
                ).select(
                    *sys_cols,
                    F.lit(name).alias("schema_name"),
                    *[
                        F.col(f"__item.{v.name}").alias(f"{name}_{v.name}")
                        for v in sub.variables
                    ],
                )
            else:
                part = parsed.filter(F.col(f"__d.{name}").isNotNull()).select(
                    *sys_cols,
                    F.lit(name).alias("schema_name"),
                    *[
                        F.col(f"__d.{name}.{v.name}").alias(f"{name}_{v.name}")
                        for v in sub.variables
                    ],
                )
            parts.append(part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    raise TypeError(f"Unknown spec type {type(spec).__name__}")
