"""Extraction schema specs.

The reference builds dynamic Pydantic model classes from a YAML spec
(/root/reference/src/delm/schemas/schemas.py:191-521). We keep the same
three schema levels (simple / nested / multiple) but compile them to a
plain frozen spec tree; the Spark StructType and the cleaning rules are
both derived from this tree once per run, so Catalyst sees a fixed schema.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, Union

from delm_spark.models import Variable


@dataclass(frozen=True)
class SimpleSpec:
    """Flat variables (reference schemas.py:191 `SimpleSchema`)."""

    variables: tuple

    schema_type = "simple"


@dataclass(frozen=True)
class NestedSpec:
    """A container holding a list of items (reference schemas.py:298)."""

    container_name: str
    variables: tuple

    schema_type = "nested"


@dataclass(frozen=True)
class MultipleSpec:
    """Named sub-schemas (reference schemas.py:440 `MultipleSchema`)."""

    schemas: tuple  # tuple[(name, SimpleSpec | NestedSpec), ...]

    schema_type = "multiple"

    def sub(self, name: str):
        for n, s in self.schemas:
            if n == name:
                return s
        raise KeyError(name)


SchemaSpec = Union[SimpleSpec, NestedSpec, MultipleSpec]


def spec_from_dict(cfg: dict[str, Any]) -> SchemaSpec:
    """Build a spec from a config dict (same YAML shape the reference
    accepts, see /root/reference/SCHEMA_REFERENCE.md and
    schemas.py:526-549 `SchemaRegistry.create`)."""
    typ = cfg.get("schema_type", "simple")
    if typ == "simple":
        return SimpleSpec(
            variables=tuple(Variable.from_dict(v) for v in cfg.get("variables", []))
        )
    if typ == "nested":
        return NestedSpec(
            container_name=cfg.get("container_name", "instances"),
            variables=tuple(Variable.from_dict(v) for v in cfg.get("variables", [])),
        )
    if typ == "multiple":
        subs = []
        for name, sub_cfg in cfg.items():
            if name == "schema_type":
                continue
            sub = spec_from_dict(sub_cfg)
            if isinstance(sub, MultipleSpec):
                raise ValueError("multiple schemas cannot nest another multiple schema")
            subs.append((name, sub))
        return MultipleSpec(schemas=tuple(subs))
    raise ValueError(f"Unknown schema_type {typ!r} (expected simple|nested|multiple)")


def load_spec(path: Union[str, Path]) -> SchemaSpec:
    """Load a YAML/JSON schema spec file."""
    import json

    p = Path(path)
    text = p.read_text()
    if p.suffix.lower() in {".yaml", ".yml"}:
        import yaml

        return spec_from_dict(yaml.safe_load(text))
    return spec_from_dict(json.loads(text))
