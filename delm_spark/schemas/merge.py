"""Per-record consolidation of chunk-level extraction results.

Pure-Python twin of the reference's merge
(/root/reference/src/delm/utils/post_processing.py:14-146):
  * scalars -> majority vote, ties broken by FIRST value encountered in
    input order whose count equals the top count (post_processing.py:32-38)
  * list-typed vars -> concatenate across chunks, keep duplicates
  * nested containers -> concatenate items across chunks
  * multiple -> recurse per sub-schema

This module is used (a) inside tests as the semantic oracle and (b) by the
driver-side small-data path. The distributed path with identical semantics
lives in delm_spark/operators/merge.py (explicit `first_seen_pos` ordering
replaces the reference's implicit input order).
"""

from __future__ import annotations

import json
from collections import Counter
from typing import Any, List, Optional

from delm_spark.schemas.spec import MultipleSpec, NestedSpec, SchemaSpec, SimpleSpec


def majority_vote(values: List[Any]) -> Any:
    """Most frequent value; tie -> first encountered in input order
    (reference post_processing.py:14-39, including its first-winner quirk)."""
    if not values:
        return None
    counts = Counter(values)
    top = max(counts.values())
    for v in values:
        if counts[v] == top:
            return v
    return values[0]


def merge_jsons_for_record(json_list: List[Any], spec: SchemaSpec) -> dict[str, Any]:
    """Merge ordered chunk-level JSON dicts for one record.

    `json_list` must be in chunk order (the reference relies on list order;
    we rely on the caller sorting by chunk position).
    """
    if json_list and isinstance(json_list[0], str):
        json_list = [json.loads(j) if j else {} for j in json_list]

    if isinstance(spec, SimpleSpec):
        merged: dict[str, Any] = {}
        for v in spec.variables:
            bucket: List[Any] = []
            for item in json_list:
                val = item.get(v.name) if isinstance(item, dict) else None
                if val is None:
                    continue
                if v.is_list():
                    bucket.extend(val)
                else:
                    bucket.append(val)
            merged[v.name] = bucket if v.is_list() else majority_vote(bucket)
        return merged

    if isinstance(spec, NestedSpec):
        out: List[dict] = []
        for item in json_list:
            if isinstance(item, dict):
                out.extend(item.get(spec.container_name) or [])
        return {spec.container_name: out}

    if isinstance(spec, MultipleSpec):
        merged_multi: dict[str, Any] = {}
        for name, sub in spec.schemas:
            sub_jsons: List[Any] = []
            for item in json_list:
                if not isinstance(item, dict):
                    continue
                if isinstance(sub, SimpleSpec):
                    sub_jsons.append(item.get(name) or {})
                else:
                    wrapped = {}
                    if name in item:
                        wrapped[sub.container_name] = item[name]
                    sub_jsons.append(wrapped)
            sub_merged = merge_jsons_for_record(sub_jsons, sub)
            if isinstance(sub, SimpleSpec):
                merged_multi[name] = sub_merged
            else:
                merged_multi[name] = sub_merged.get(sub.container_name, [])
        return merged_multi

    raise TypeError(f"Unknown spec type {type(spec).__name__}")
