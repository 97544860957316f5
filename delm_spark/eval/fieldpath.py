"""Recursive field-path precision/recall kernel (A6).

Pure-Python port of the reference's schema-aware metric walk
(/root/reference/src/delm/utils/performance_estimation.py:206-348):
per record, walk the expected/predicted JSON trees in parallel and emit
(field_path -> {tp, fp, fn}) where values are compared as per-record sets
(lists/dicts canonicalized to sorted-key JSON; missing = None/""/empty).
Required fields score even when the expected value is missing.

These functions run per record inside the distributed evaluator
(eval/metrics.field_path_confusion) — the walk is per-row pure logic, the
cross-record aggregation is a native groupBy. Parity with the reference's
own functions is pytest-asserted.
"""

from __future__ import annotations

import json
from typing import Any, Optional

from delm_spark.schemas.spec import MultipleSpec, NestedSpec, SchemaSpec, SimpleSpec


def is_missing(val: Any) -> bool:
    """performance_estimation.py:206-219."""
    return (
        val is None
        or val == ""
        or (isinstance(val, (list, dict)) and len(val) == 0)
    )


def make_hashable(val: Any) -> Any:
    """performance_estimation.py:221-235."""
    if is_missing(val):
        return None
    if isinstance(val, (list, dict)):
        return json.dumps(val, sort_keys=True)
    return val


def build_required_map(
    spec: SchemaSpec, parent: Optional[list] = None
) -> dict[str, bool]:
    """performance_estimation.py:237-262, over our spec tree."""
    parent = parent or []
    req: dict[str, bool] = {}
    if isinstance(spec, SimpleSpec):
        for v in spec.variables:
            req[".".join(parent + [v.name])] = bool(v.required)
    elif isinstance(spec, NestedSpec):
        for v in spec.variables:
            req[".".join(parent + [spec.container_name, v.name])] = bool(v.required)
    elif isinstance(spec, MultipleSpec):
        for name, sub in spec.schemas:
            req.update(build_required_map(sub, parent + [name]))
    return req


def _counts(t_set: set, p_set: set) -> dict[str, int]:
    return {
        "tp": len(t_set & p_set),
        "fp": len(p_set - t_set),
        "fn": len(t_set - p_set),
    }


def all_levels_precision_recall(
    y_true: Any,
    y_pred: Any,
    required_map: dict[str, bool],
    path: Optional[list] = None,
) -> dict[str, dict[str, int]]:
    """performance_estimation.py:280-348, rule for rule (incl. the quirks:
    unknown nested keys default to required=True; the container-level set
    compares whole items as canonical JSON)."""
    path = path or []
    results: dict[str, dict[str, int]] = {}
    if isinstance(y_true, dict) and isinstance(y_pred, dict):
        for k in sorted(set(y_true) | set(y_pred)):
            sub_path = path + [k]
            t_val, p_val = y_true.get(k), y_pred.get(k)
            pstr = ".".join(sub_path)
            required = required_map.get(pstr, False)
            if not any(isinstance(v, (dict, list)) for v in (t_val, p_val)):
                if required or not is_missing(t_val):
                    t_set = {make_hashable(t_val)} - {None}
                    p_set = {make_hashable(p_val)} - {None}
                    results[pstr] = _counts(t_set, p_set)
            results.update(
                all_levels_precision_recall(t_val, p_val, required_map, sub_path)
            )
        return results
    if isinstance(y_true, list) and isinstance(y_pred, list):
        true_dicts = [d for d in y_true if isinstance(d, dict)]
        pred_dicts = [d for d in y_pred if isinstance(d, dict)]
        path_str = ".".join(path) if path else "root"
        required = required_map.get(path_str, False)
        if true_dicts or pred_dicts:
            if required or true_dicts:
                t_set = {json.dumps(d, sort_keys=True) for d in true_dicts}
                p_set = {json.dumps(d, sort_keys=True) for d in pred_dicts}
                results[path_str] = _counts(t_set, p_set)
            key_union = {k for d in true_dicts + pred_dicts for k in d}
            for k in key_union:
                sub_path = path + [k]
                pstr = ".".join(sub_path)
                required = required_map.get(pstr, True)
                t_vals = {make_hashable(d.get(k)) for d in true_dicts if k in d} - {None}
                p_vals = {make_hashable(d.get(k)) for d in pred_dicts if k in d} - {None}
                if required or t_vals:
                    results[pstr] = _counts(t_vals, p_vals)
                t_nested = [d.get(k) for d in true_dicts if k in d]
                p_nested = [d.get(k) for d in pred_dicts if k in d]
                if any(isinstance(v, (dict, list)) for v in t_nested + p_nested):
                    results.update(
                        all_levels_precision_recall(
                            t_nested, p_nested, required_map, sub_path
                        )
                    )
            return results
        if required or y_true:
            t_set = {make_hashable(v) for v in y_true} - {None}
            p_set = {make_hashable(v) for v in y_pred} - {None}
            results[path_str] = _counts(t_set, p_set)
        return results
    return results
