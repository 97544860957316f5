"""Compile a schema spec to a Spark StructType.

The reference generates Pydantic classes at runtime
(/root/reference/src/delm/schemas/schemas.py:207-215, 326-332, 462-470);
here the same spec compiles once on the driver to a fixed StructType so
`from_json` / `explode` run natively and Catalyst sees a stable schema.

Type mapping (reference schemas.py:32-38 `_Mapping`):
  string/date -> StringType, number -> DoubleType, integer -> LongType,
  boolean -> BooleanType, [T] -> ArrayType(T).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from delm_spark.models import Variable
from delm_spark.schemas.spec import MultipleSpec, NestedSpec, SchemaSpec, SimpleSpec

_SPARK_SCALAR: dict[str, DataType] = {
    "string": StringType(),
    "date": StringType(),
    "number": DoubleType(),
    "integer": LongType(),
    "boolean": BooleanType(),
}


def _field_type(v: Variable) -> DataType:
    base = _SPARK_SCALAR.get(v.base_type(), StringType())
    return ArrayType(base, containsNull=True) if v.is_list() else base


def _item_struct(variables) -> StructType:
    return StructType(
        [StructField(v.name, _field_type(v), nullable=True) for v in variables]
    )


def spark_schema_for(spec: SchemaSpec) -> StructType:
    """StructType of the cleaned-extraction JSON for one chunk.

    Shapes match the dict output of the reference's
    `validate_and_parse_response_to_dict` (schemas.py:263-268, 390-399,
    482-499): simple -> flat struct; nested -> {container: array<item>};
    multiple -> one field per sub-schema, nested subs *unwrapped* to a
    bare item array (schemas.py:489-494).
    """
    if isinstance(spec, SimpleSpec):
        return _item_struct(spec.variables)
    if isinstance(spec, NestedSpec):
        return StructType(
            [
                StructField(
                    spec.container_name,
                    ArrayType(_item_struct(spec.variables)),
                    nullable=True,
                )
            ]
        )
    if isinstance(spec, MultipleSpec):
        fields = []
        for name, sub in spec.schemas:
            if isinstance(sub, NestedSpec):
                fields.append(
                    StructField(name, ArrayType(_item_struct(sub.variables)), True)
                )
            else:
                fields.append(StructField(name, _item_struct(sub.variables), True))
        return StructType(fields)
    raise TypeError(f"Unknown spec type {type(spec).__name__}")
