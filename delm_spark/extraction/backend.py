"""Extractor backends.

The reference calls an LLM through Instructor with a dynamically generated
Pydantic response model (/root/reference/src/delm/core/extraction_manager.py:296-332).
No network or `instructor` exists in this sandbox, so the default backend is
a deterministic, schema-guided rule engine: regex patterns per predicate
emit raw (subj, pred, obj) items in document order. Raw output then flows
through the SAME cleaning rules the reference applies
(delm_spark.schemas.clean), so fidelity is defined by the cleaning kernel,
not the backend.

A real LLM backend plugs in by implementing `extract_raw(text) -> dict`;
the Spark plumbing (mapInPandas batching, cache dedup, retry) is identical.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Protocol

from delm_spark.schemas.spec import NestedSpec, SchemaSpec

#: entity mention: capitalized word sequence (no embedded '.')
ENTITY_RE = r"[A-Z][A-Za-z]*(?: [A-Z][A-Za-z]*)*"

#: phrase -> emitted predicate label. Includes deliberately *disallowed*
#: predicates (e.g. "dislikes") so the allowed-values cleaning rule is
#: exercised end-to-end.
DEFAULT_PREDICATE_PHRASES: list[tuple[str, str]] = [
    (r" works at ", "works_at"),
    (r" uses the ", "uses_tool"),
    (r" is located in ", "located_in"),
    (r" reports to ", "reports_to"),
    (r" created ", "created"),
    (r" dislikes ", "dislikes"),
]


class ExtractorBackend(Protocol):
    def extract_raw(self, text: str) -> Optional[dict[str, Any]]:
        """Raw (pre-cleaning) extraction for one chunk; None/raise on failure."""
        ...


class RuleTripleExtractor:
    """Deterministic triple extractor for a nested (subj, pred, obj) spec.

    Emits items in document order (match start offset), which downstream
    merge relies on the same way the reference relies on chunk/input order
    (post_processing.py:32-38, 99-110).
    """

    def __init__(
        self,
        spec: SchemaSpec,
        predicate_phrases: Optional[list[tuple[str, str]]] = None,
    ):
        if not isinstance(spec, NestedSpec):
            raise TypeError("RuleTripleExtractor requires a nested triple spec")
        self.spec = spec
        phrases = predicate_phrases or DEFAULT_PREDICATE_PHRASES
        # ONE combined pattern (alternation over predicate phrases) — a
        # single left-to-right scan yields matches already in document
        # order and is ~len(phrases)x cheaper than per-predicate scans.
        alt = "|".join(re.escape(p) for p, _ in phrases)
        self._pattern = re.compile(
            rf"(?P<subj>{ENTITY_RE})(?P<phrase>{alt})(?P<obj>{ENTITY_RE})(?=[.!?])"
        )
        self._pred_of = {p: pred for p, pred in phrases}

    def extract_raw(self, text: str) -> dict[str, Any]:
        if not text:
            return {self.spec.container_name: []}
        items = [
            {"subj": m.group("subj"), "pred": self._pred_of[m.group("phrase")],
             "obj": m.group("obj")}
            for m in self._pattern.finditer(text)
        ]
        return {self.spec.container_name: items}

    def extract_raw_batch(self, texts) -> list[dict[str, Any]]:
        """Vectorized batch extraction via pandas `str.extractall` (C regex
        loop). Match order within a row is document order — same contract
        as extract_raw."""
        import pandas as pd

        texts = pd.Series(texts).fillna("").reset_index(drop=True)
        cname = self.spec.container_name
        out: list[dict[str, Any]] = [{cname: []} for _ in range(len(texts))]
        if len(texts) == 0:
            return out
        m = texts.str.extractall(self._pattern)
        if len(m):
            for (row, _match), subj, phrase, obj in zip(
                m.index, m["subj"], m["phrase"], m["obj"]
            ):
                out[row][cname].append(
                    {"subj": subj, "pred": self._pred_of[phrase], "obj": obj}
                )
        return out


class PromptedApiBackend:
    """Instructor-shaped API backend (reference
    extraction_manager.py:296-332): assembles the reference's prompt and
    system message (extraction/prompts.py — byte-for-byte parity), then
    calls a pluggable `transport(prompt, system, model_name, temperature)
    -> raw dict`. The transport is the ONLY network-touching piece — in
    this sandbox tests inject a fake; production plugs an Instructor/SDK
    call. Retry/backoff and per-chunk error safety come from the extraction
    stage; cache keys derive from `call_spec`, so entries written with this
    backend are keyed exactly like the reference's semantic cache
    (semantic_cache.py:81-103)."""

    def __init__(self, spec, transport, call_spec=None, pass_response_model=None):
        from delm_spark.extraction.prompts import CallSpec

        self.spec = spec
        self.transport = transport
        self.call_spec = call_spec or CallSpec()
        # whether the transport takes the dynamic Pydantic response model
        # as a 5th argument (Instructor style). None = inferred ONCE from
        # the signature here (not per row); *args / functools.partial
        # transports defeat signature inspection, so they should pass this
        # explicitly.
        if pass_response_model is None:
            import inspect

            try:
                positional = [
                    p
                    for p in inspect.signature(transport).parameters.values()
                    if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
                ]
                # A 5th positional param only *means* "response model" when
                # it is required (no default) or literally named
                # response_model — a defaulted unrelated param (e.g.
                # timeout=30) must NOT silently receive the model.
                if len(positional) >= 5:
                    fifth = positional[4]
                    pass_response_model = (
                        fifth.default is fifth.empty
                        or fifth.name == "response_model"
                    )
                else:
                    pass_response_model = False
            except (TypeError, ValueError):
                pass_response_model = False
        self.pass_response_model = bool(pass_response_model)

    def response_model(self):
        """Dynamic Pydantic response model (reference
        create_pydantic_schema, schemas.py:207-215/326-332/462-470) — what
        a live Instructor transport passes as `response_model=` so the
        API validates structure before the engine's cleaning rules run.
        Built once per backend instance, not per call."""
        cached = getattr(self, "_response_model", None)
        if cached is None:
            from delm_spark.schemas.models import pydantic_model_for

            cached = self._response_model = pydantic_model_for(self.spec)
        return cached

    def extract_raw(self, text: str) -> Optional[dict[str, Any]]:
        prompt = self.call_spec.prompt_for(self.spec, text or "")
        args = [
            prompt,
            self.call_spec.system_prompt,
            self.call_spec.model_name,
            self.call_spec.temperature,
        ]
        if self.pass_response_model:
            args.append(self.response_model())
        return self.transport(*args)


class NoOpExtractor:
    """Plan-shape control backend (bench_scaling no-op mode): the SAME
    Arrow/mapInPandas stage and DAG as RuleTripleExtractor, but ~zero
    kernel work — isolates Spark plan/scheduler overhead from the Python
    kernel's memory-bandwidth ceiling in scaling measurements."""

    def __init__(self, spec):
        self.container_name = spec.container_name

    def extract_raw(self, text):
        return {self.container_name: []}

    def extract_raw_batch(self, texts):
        return [{self.container_name: []} for _ in texts]


class CacheOnlyBackend:
    """Backend that refuses to run: guarantees a run is served entirely
    from the persistent semantic cache (and proves warm reruns make zero
    backend calls — any invocation surfaces as a delm_errors row)."""

    def extract_raw(self, text):
        raise RuntimeError("backend invoked despite warm cache")


class FlakyLoggingTransport:
    """Instructor-shaped transport double (5 positional params, the last
    the dynamic response model) for end-to-end tests of PromptedApiBackend:
    every call appends `<md5(prompt)> <monotonic-time>` to `log_path`
    (executors share the driver's filesystem in local mode, so the driver
    can read back the exact call/retry sequence), the first `fail_first`
    calls per prompt raise (transient failure), and prompts matching
    `permanent_fail_pattern` always raise (permanent failure -> error row).
    Successes return an empty raw container for `container_name`."""

    def __init__(
        self,
        log_path: str,
        container_name: str = "triples",
        fail_first: int = 0,
        permanent_fail_pattern: Optional[str] = None,
    ):
        self.log_path = log_path
        self.container_name = container_name
        self.fail_first = fail_first
        self.permanent_fail_pattern = permanent_fail_pattern

    def __call__(self, prompt, system, model, temperature, response_model):
        import hashlib
        import time as _time

        key = hashlib.md5((prompt or "").encode("utf-8")).hexdigest()
        try:
            with open(self.log_path) as f:
                prior = sum(1 for line in f if line.startswith(key))
        except FileNotFoundError:
            prior = 0
        # O_APPEND single short write: atomic on local filesystems
        with open(self.log_path, "a") as f:
            f.write(f"{key} {_time.monotonic():.6f}\n")
        if self.permanent_fail_pattern and re.search(
            self.permanent_fail_pattern, prompt or ""
        ):
            raise RuntimeError("permanent transport failure")
        if prior < self.fail_first:
            raise RuntimeError(f"transient transport failure #{prior + 1}")
        assert response_model is not None  # Instructor contract
        return {self.container_name: []}


class FailingBackend:
    """Test backend that fails on texts matching a pattern — exercises the
    error-safe path (reference extraction_manager.py:244-269)."""

    def __init__(self, inner: ExtractorBackend, fail_pattern: str):
        self.inner = inner
        self.fail_re = re.compile(fail_pattern)

    def extract_raw(self, text: str):
        if text and self.fail_re.search(text):
            raise RuntimeError(f"simulated extraction failure")
        return self.inner.extract_raw(text)
