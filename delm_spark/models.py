"""Shared data models.

Mirrors the surface of the reference's extraction-variable model
(/root/reference/src/delm/models.py:11-45) without importing it.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

#: extraction variable type name -> python type of a scalar value
SCALAR_TYPES = {
    "string": str,
    "number": float,
    "integer": int,
    "boolean": bool,
    "date": str,
}


@dataclass(frozen=True)
class Variable:
    """A variable to extract from text.

    Fields mirror reference models.py:11-37 (`ExtractionVariable`).
    """

    name: str
    description: str = ""
    data_type: str = "string"
    required: bool = False
    allowed_values: Optional[tuple] = None
    validate_in_text: bool = False

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Variable":
        dt = d["data_type"]
        if isinstance(dt, list):  # YAML `[string]` parses as a list
            dt = f"[{dt[0]}]"
        av = d.get("allowed_values")
        return cls(
            name=d["name"],
            description=d.get("description", ""),
            data_type=dt,
            required=bool(d.get("required", False)),
            allowed_values=tuple(av) if av is not None else None,
            validate_in_text=bool(d.get("validate_in_text", False)),
        )

    def is_list(self) -> bool:
        return self.data_type.startswith("[") and self.data_type.endswith("]")

    def base_type(self) -> str:
        return self.data_type[1:-1] if self.is_list() else self.data_type
