from delm_spark.schemas.spec import (
    MultipleSpec,
    NestedSpec,
    SchemaSpec,
    SimpleSpec,
    load_spec,
    spec_from_dict,
)
from delm_spark.schemas.compile import spark_schema_for
from delm_spark.schemas.clean import clean_response
from delm_spark.schemas.merge import majority_vote, merge_jsons_for_record

__all__ = [
    "SchemaSpec",
    "SimpleSpec",
    "NestedSpec",
    "MultipleSpec",
    "load_spec",
    "spec_from_dict",
    "spark_schema_for",
    "clean_response",
    "majority_vote",
    "merge_jsons_for_record",
]
