"""Prompt assembly + semantic-cache keys (E3 + E9 key semantics).

Ports the reference's prompt construction and cache-key derivation so a
future API backend (and the persistent cache table) reproduce reference
behavior byte-for-byte:

  * variables text    — /root/reference/src/delm/schemas/schemas.py:171-186
  * simple prompt     — schemas.py:217-221 (context passed through raw)
  * nested prompt     — schemas.py:335-340 (context rendered as k: v lines)
  * multiple prompt   — schemas.py:472-479 (## NAME sections, joined \n\n)
  * default template/system prompt — constants.py:61-70 (the system prompt
    contains U+2011 NON-BREAKING HYPHEN in "data‑extraction" — preserved)
  * cache key         — utils/semantic_cache.py:67-103: sha256 of canonical
    JSON (sorted keys, compact separators, ensure_ascii=False) of
    {prompt, system, model, temperature}

`cache_key_expr` is the Spark-native twin of `make_cache_key`: the prompt
is a literal-prefix/suffix concat around the text column (the variables
text is static per spec) and the canonical JSON is `to_json` of a struct
with alphabetically ordered fields — Spark's to_json emits compact,
non-ASCII-preserving JSON, matching json.dumps(sort_keys=True,
separators=(",", ":"), ensure_ascii=False). Key computation therefore
stays in whole-stage codegen; parity with the reference's Python key is
pytest-asserted for texts with quotes/newlines/unicode.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from typing import Any, Mapping, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from delm_spark.schemas.spec import MultipleSpec, NestedSpec, SchemaSpec, SimpleSpec

DEFAULT_PROMPT_TEMPLATE = """Extract the following information from the text:

{variables}

Text to analyze:
{text}

Please extract the requested information accurately and return it in the specified format. If a field is not mentioned in the text, use null/None rather than guessing."""

DEFAULT_SYSTEM_PROMPT = "You are a precise data‑extraction assistant."


def variables_text(variables: tuple) -> str:
    """Reference get_variables_text (schemas.py:171-186)."""
    lines = []
    for v in variables:
        s = f"- {v.name}: {v.description} ({v.data_type})"
        if v.required:
            s += " [REQUIRED]"
        if v.allowed_values:
            allowed = ", ".join(f'"{x}"' for x in v.allowed_values)
            s += f" (allowed values: {allowed})"
        lines.append(s)
    return "\n".join(lines)


def create_prompt(
    spec: SchemaSpec,
    text: str,
    prompt_template: str = DEFAULT_PROMPT_TEMPLATE,
    context: Optional[Mapping[str, Any]] = None,
) -> str:
    """Reference create_prompt for each schema level. Note the reference
    quirks, preserved: simple passes the context mapping through raw
    (str() via format), nested renders it as 'k: v' lines."""
    if isinstance(spec, SimpleSpec):
        return prompt_template.format(
            text=text, variables=variables_text(spec.variables), context=context or ""
        )
    if isinstance(spec, NestedSpec):
        ctx = "\n".join(f"{k}: {v}" for k, v in (context or {}).items())
        return prompt_template.format(
            text=text, variables=variables_text(spec.variables), context=ctx
        )
    if isinstance(spec, MultipleSpec):
        parts = [
            f"## {name.upper()}\n" + create_prompt(sub, text, prompt_template, context)
            for name, sub in spec.schemas
        ]
        return "\n\n".join(parts)
    raise TypeError(f"Unknown spec type {type(spec).__name__}")


def canonical_json(obj: Any) -> str:
    """semantic_cache.py:67-72."""
    return json.dumps(obj, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


def make_cache_key(
    *, prompt_text: str, system_prompt: str, model_name: str, temperature: float
) -> str:
    """semantic_cache.py:81-103."""
    material = {
        "prompt": prompt_text,
        "system": system_prompt,
        "model": model_name,
        "temperature": temperature,
    }
    return hashlib.sha256(canonical_json(material).encode("utf-8")).hexdigest()


@dataclass(frozen=True)
class CallSpec:
    """Identity of an extraction call — everything the reference's cache
    key depends on (semantic_cache.py:88-103). The deterministic rule
    backend ignores the prompt at execution time but still derives its
    cache key from it, so swapping in a real API backend later cannot
    silently change (or miss) cache entries."""

    model_name: str = "deterministic-rules"
    temperature: float = 0.0
    system_prompt: str = DEFAULT_SYSTEM_PROMPT
    prompt_template: str = DEFAULT_PROMPT_TEMPLATE

    def prompt_for(self, spec: SchemaSpec, text: str) -> str:
        return create_prompt(spec, text, self.prompt_template)

    def cache_key(self, spec: SchemaSpec, text: str) -> str:
        return make_cache_key(
            prompt_text=self.prompt_for(spec, text),
            system_prompt=self.system_prompt,
            model_name=self.model_name,
            temperature=self.temperature,
        )


def prompt_expr(spec: SchemaSpec, text: Column, prompt_template: str) -> Column:
    """Native prompt assembly: the rendered prompt is template pieces
    (static per spec) concatenated around the text column. For multiple
    schemas the text appears once per sub-schema section."""
    sentinel = "\x00DELM_TEXT\x00"
    rendered = create_prompt(spec, sentinel, prompt_template)
    parts = rendered.split(sentinel)
    cols: list[Column] = []
    for i, piece in enumerate(parts):
        if i:
            cols.append(text)
        if piece:
            cols.append(F.lit(piece))
    return F.concat(*cols) if cols else F.lit("")


def cache_key_expr(spec: SchemaSpec, text: Column, call: CallSpec) -> Column:
    """Whole-stage-codegen twin of make_cache_key (see module docstring).
    Field order in the struct is alphabetical = json.dumps(sort_keys=True).
    """
    prompt = prompt_expr(spec, text, call.prompt_template)
    material = F.struct(
        F.lit(call.model_name).alias("model"),
        prompt.alias("prompt"),
        F.lit(call.system_prompt).alias("system"),
        F.lit(float(call.temperature)).cast("double").alias("temperature"),
    )
    return F.sha2(F.to_json(material), 256)
