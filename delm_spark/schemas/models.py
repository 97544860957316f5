"""Dynamic Pydantic response models for Instructor-shaped backends.

Twin of the reference's `create_pydantic_schema` surface
(/root/reference/src/delm/schemas/schemas.py:40-64, 207-215, 326-332,
462-470): a live Instructor transport passes `response_model=` built from
the spec, so the LLM's structured output is validated at the API boundary
before the engine's own cleaning rules run. The deterministic rule backend
does not need these; `PromptedApiBackend` transports do
(extraction/backend.py:103).

Ports (each cited to its reference line range):
  * make_safe_enum — `_make_enum` (schemas.py:40-45): Enum member names
    sanitized (spaces/dashes -> underscores). NB: the reference defines
    but never calls it; it is part of the module's public surface, kept
    here for drop-in parity and used by `ann_and_field` when a variable
    has `allowed_values` (the natural reading of its intent).
  * ann_and_field — `_ann_and_field` (schemas.py:46-64): dtype string ->
    (Optional annotation, FieldInfo, is_list); every field Optional so a
    None from the LLM parses, with required-ness enforced later by the
    cleaning phase (schemas/clean.py), exactly like the reference.
  * pydantic_model_for — Simple (DynamicExtractSchema), Nested
    (DynamicContainer with List[Item]), Multiple (MultipleExtract with one
    sub-model field per sub-spec).
"""

from __future__ import annotations

from enum import Enum
from typing import Any, List, Optional, Sequence, Type

from pydantic import BaseModel, Field

from delm_spark.schemas.spec import MultipleSpec, NestedSpec, SchemaSpec, SimpleSpec

_TYPE_MAP: dict[str, type] = {
    "string": str,
    "number": float,
    "integer": int,
    "boolean": bool,
    "date": str,
}


def make_safe_enum(name: str, allowed: Sequence[str]) -> type[Enum]:
    """Enum from arbitrary strings with member names made identifier-safe
    (reference `_make_enum`, schemas.py:40-45)."""
    safe_members = {str(v).replace(" ", "_").replace("-", "_"): v for v in allowed}
    return Enum(name, safe_members)


def ann_and_field(
    dtype: str,
    required: bool,
    desc: str,
    allowed_values: Optional[Sequence[str]] = None,
    enum_name: str = "AllowedValues",
):
    """(annotation, FieldInfo, is_list) for one variable (reference
    `_ann_and_field`, schemas.py:46-64). With `allowed_values` the base
    type is a sanitized Enum (see make_safe_enum)."""
    is_list = dtype.startswith("[") and dtype.endswith("]")
    base_key = dtype[1:-1] if is_list else dtype
    py_base: type = _TYPE_MAP.get(base_key, str)
    if allowed_values and base_key == "string":
        py_base = make_safe_enum(enum_name, allowed_values)
    ann: Any = List[py_base] if is_list else py_base
    # always Optional: a null from the LLM must parse; required-ness is the
    # cleaning phase's job (reference comment, schemas.py:53-56)
    ann = Optional[ann]
    fld = (
        Field(default_factory=list, description=desc)
        if is_list
        else Field(default=None, description=desc)
    )
    return ann, fld, is_list


def _fields_model(name: str, variables) -> Type[BaseModel]:
    annotations, fields = {}, {}
    for v in variables:
        ann, fld, _ = ann_and_field(
            v.data_type,
            v.required,
            v.description,
            allowed_values=getattr(v, "allowed_values", None),
            enum_name=f"{v.name.title().replace('_', '')}Values",
        )
        annotations[v.name] = ann
        fields[v.name] = fld
    return type(name, (BaseModel,), {"__annotations__": annotations, **fields})


def pydantic_model_for(spec: SchemaSpec) -> Type[BaseModel]:
    """Response model for a spec (reference create_pydantic_schema:
    schemas.py:207-215 / 326-332 / 462-470; dynamic class names match)."""
    if isinstance(spec, SimpleSpec):
        return _fields_model("DynamicExtractSchema", spec.variables)
    if isinstance(spec, NestedSpec):
        Item = _fields_model("DynamicItem", spec.variables)
        # the container itself is NOT Optional (reference schemas.py:329:
        # List[Item] with default_factory=list — an omitted container
        # parses to [], an explicit null does not parse)
        ann = {spec.container_name: List[Item]}
        flds = {
            spec.container_name: Field(
                default_factory=list, description=f"list of {Item.__name__}"
            )
        }
        return type(
            "DynamicContainer", (BaseModel,), {"__annotations__": ann, **flds}
        )
    if isinstance(spec, MultipleSpec):
        ann, flds = {}, {}
        for name, sub in spec.schemas:
            ann[name] = pydantic_model_for(sub)
            flds[name] = Field(..., description=f"results for {name}")
        return type("MultipleExtract", (BaseModel,), {"__annotations__": ann, **flds})
    raise TypeError(f"unknown spec type {type(spec).__name__}")
