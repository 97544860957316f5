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

    def native_extract_columns(self, spec, text_col):
        """Whole-stage-codegen twin of extract_raw + clean_response +
        json.dumps for the nested all-scalar-string spec shape (r6,
        guide §4.1: prefer built-ins over any Python boundary): three
        `regexp_extract_all` passes over the shared pattern yield aligned
        (subj, phrase, obj) arrays; the cleaning rules and the JSON
        serialization are native array/string expressions.

        Byte parity with json.dumps holds because every serialized value
        is JSON-escape-free by construction: subj/obj match ENTITY_RE
        (`[A-Za-z ]` only) and pred labels / the container name are
        checked for json-safe characters below — so
        encode_basestring_ascii(v) == '"' + v + '"' exactly. Returns a
        dict {json: Column, in_tokens: Column, out_tokens: Column}, or
        None when the spec/phrase shape disqualifies the native path
        (caller falls back to the Arrow/pandas stage). Pinned
        byte-for-byte against the Python path in
        tests/test_round6_opt.py.
        """
        import re as _re

        from pyspark.sql import functions as F

        from delm_spark.constants import LLM_NULL_WORDS_LOWERCASE

        if not self._fast_path_ok(spec):
            return None
        safe = _re.compile(r"[A-Za-z0-9_ ]*\Z")
        if not safe.match(spec.container_name):
            return None
        for p, label in self._pred_of.items():
            if not safe.match(p) or not safe.match(label):
                return None
        # Java twin of the Python pattern: named groups -> plain groups
        # (group indices 1=subj, 2=phrase, 3=obj; ENTITY_RE's inner group
        # is non-capturing). Phrase/entity characters are [A-Za-z ], so
        # the escaped alternation parses identically under java.util.regex.
        text = F.coalesce(text_col, F.lit(""))
        zipped = self._native_match_structs(text)
        pred_of = self._pred_of

        def item_of(x):
            subj = x.getField("s")
            phrase = x.getField("p")
            obj = x.getField("o")
            # phrase -> pred label (when-chain over the closed phrase set)
            expr = None
            for ph, label in pred_of.items():
                cond = phrase == F.lit(ph)
                expr = (
                    F.when(cond, F.lit(label))
                    if expr is None
                    else expr.when(cond, F.lit(label))
                )
            vals = {"subj": subj, "pred": expr, "obj": obj}
            alive = F.lit(True)
            pieces = []
            for v in spec.variables:
                val = vals[v.name]
                ok = F.lit(True)
                if v.allowed_values is None:
                    nones = LLM_NULL_WORDS_LOWERCASE
                else:
                    nones = [
                        w
                        for w in LLM_NULL_WORDS_LOWERCASE
                        if w not in v.allowed_values
                    ]
                if nones:
                    ok = ok & ~F.lower(val).isin(*nones)
                if v.allowed_values:
                    ok = ok & val.isin(*v.allowed_values)
                # validate_in_text: vacuously true for verbatim ASCII
                # captures (see _fast_path_ok)
                if v.required:
                    alive = alive & ok
                    pieces.append(F.concat(F.lit('"%s": "' % v.name), val, F.lit('"')))
                else:
                    pieces.append(
                        F.when(
                            ok,
                            F.concat(F.lit('"%s": "' % v.name), val, F.lit('"')),
                        ).otherwise(F.lit('"%s": null' % v.name))
                    )
            body = pieces[0]
            for p in pieces[1:]:
                body = F.concat(body, F.lit(", "), p)
            return F.when(alive, F.concat(F.lit("{"), body, F.lit("}")))

        items = F.filter(
            F.transform(zipped, lambda x: item_of(x)), lambda x: x.isNotNull()
        )
        json_col = F.when(
            F.size(items) > 0,
            F.concat(
                F.lit('{"%s": [' % spec.container_name),
                F.array_join(items, ", "),
                F.lit("]}"),
            ),
        ).otherwise(F.lit("{}"))
        return {
            "json": json_col,
            "in_tokens": F.floor((F.length(text) + 3) / 4).cast("long"),
            "out_tokens": F.floor((F.length(json_col) + 3) / 4).cast("long"),
        }

    def _native_match_structs(self, text):
        """array<struct<s: subj, p: phrase, o: obj>> of the raw regex
        matches of `text`, as a native Column.

        One-pass form when the phrase set allows it: a single
        `regexp_extract_all(text, pat, 0)` (full matches), with subj/obj
        recovered by substring_index around the detected phrase. Sound
        because (a) every phrase is space-delimited lowercase words with
        leading/trailing spaces while ENTITY_RE captures only ever have
        an UPPERCASE letter after a space — so no phrase can occur inside
        a capture, and any in-match occurrence of another phrase must lie
        wholly inside the real phrase; with (b) no phrase a substring of
        another, only the real phrase can match. Phrase sets violating
        (a)/(b) fall back to three aligned group passes (arrays_zip).

        Either way each regexp pass is referenced EXACTLY ONCE outside
        any lambda: CollapseProject inlines aliased expressions into
        lambda bodies, so an element_at(arr, i) formulation would re-run
        the whole regex scan once PER ITEM (measured 3x slower than the
        Python stage this replaces)."""
        import re as _re

        from pyspark.sql import functions as F

        jpat = _re.sub(r"\(\?P<[A-Za-z_]+>", "(", self._pattern.pattern)
        word_shape = _re.compile(r"\A(?: [a-z]+)+ \Z")
        phrases = list(self._pred_of)
        one_pass = all(word_shape.match(p) for p in phrases) and not any(
            a != b and a in b for a in phrases for b in phrases
        )
        if not one_pass:
            return F.arrays_zip(
                F.regexp_extract_all(text, F.lit(jpat), 1).alias("s"),
                F.regexp_extract_all(text, F.lit(jpat), 2).alias("p"),
                F.regexp_extract_all(text, F.lit(jpat), 3).alias("o"),
            )

        def split_match(m):
            expr = None
            for ph in phrases:
                branch = F.struct(
                    F.substring_index(m, ph, 1).alias("s"),
                    F.lit(ph).alias("p"),
                    F.substring_index(m, ph, -1).alias("o"),
                )
                cond = m.contains(F.lit(ph))
                expr = (
                    F.when(cond, branch) if expr is None else expr.when(cond, branch)
                )
            return expr

        return F.transform(
            F.regexp_extract_all(text, F.lit(jpat), 0), lambda m: split_match(m)
        )

    def native_extract_items(self, spec, text_col):
        """Typed twin of `native_extract_columns` for consumers that want
        the cleaned items directly (r6): returns a Column of
        array<struct<...vars...>> equal element-for-element to
        from_json(json, schema)[container] over the JSON path — so the
        triples chain can skip BOTH the JSON serialization and the
        from_json parse. None when the native path is disqualified."""
        import re as _re

        from pyspark.sql import functions as F

        from delm_spark.constants import LLM_NULL_WORDS_LOWERCASE

        if not self._fast_path_ok(spec):
            return None
        text = F.coalesce(text_col, F.lit(""))
        zipped = self._native_match_structs(text)
        pred_of = self._pred_of

        def item_of(x):
            expr = None
            for ph, label in pred_of.items():
                cond = x.getField("p") == F.lit(ph)
                expr = (
                    F.when(cond, F.lit(label))
                    if expr is None
                    else expr.when(cond, F.lit(label))
                )
            vals = {"subj": x.getField("s"), "pred": expr, "obj": x.getField("o")}
            alive = F.lit(True)
            fields = []
            for v in spec.variables:
                val = vals[v.name]
                ok = F.lit(True)
                if v.allowed_values is None:
                    nones = LLM_NULL_WORDS_LOWERCASE
                else:
                    nones = [
                        w
                        for w in LLM_NULL_WORDS_LOWERCASE
                        if w not in v.allowed_values
                    ]
                if nones:
                    ok = ok & ~F.lower(val).isin(*nones)
                if v.allowed_values:
                    ok = ok & val.isin(*v.allowed_values)
                if v.required:
                    alive = alive & ok
                    fields.append(val.alias(v.name))
                else:
                    fields.append(
                        F.when(ok, val).otherwise(F.lit(None)).alias(v.name)
                    )
            return F.when(alive, F.struct(*fields))

        return F.filter(
            F.transform(zipped, lambda x: item_of(x)), lambda x: x.isNotNull()
        )

    def _fast_path_ok(self, spec) -> bool:
        """True when `extract_clean_json_batch` reproduces
        clean_response(extract_raw(text), spec, text) exactly for this
        spec shape (memoized per spec object)."""
        cached = self.__dict__.get("_fast_ok")
        if cached is not None and cached[0] is spec:
            return cached[1]
        ok = isinstance(spec, NestedSpec)
        if ok:
            for v in spec.variables:
                if (
                    v.name not in ("subj", "pred", "obj")
                    or v.is_list()
                    or v.base_type() != "string"
                    # validate_in_text is free ONLY for verbatim capture
                    # groups (subj/obj are substrings of the text, and
                    # ENTITY_RE is ASCII-only, so value.lower() is always
                    # contained in text.lower()); pred is a MAPPED label,
                    # so a validate_in_text pred needs the real check.
                    or (v.validate_in_text and v.name == "pred")
                ):
                    ok = False
                    break
        self._fast_ok = (spec, ok)
        return ok

    def extract_clean_json_batch(self, texts, spec):
        """Vectorized extract + clean + serialize (r6, guide §4.2): the
        whole batch goes through ONE C-regex `extractall`, the cleaning
        rules run as pandas/numpy masks over the flat match table, and
        the JSON strings are assembled by vectorized string concat with a
        per-unique-value `encode_basestring_ascii` cache — no per-row
        clean_response()/json.dumps() calls.

        Byte-identical to the slow path by construction, pinned by
        tests/test_round6_opt.py over adversarial inputs. Returns
        (jsons, errors, in_tokens, out_tokens) lists, or None when the
        spec shape disqualifies the fast path (caller falls back).
        """
        if not self._fast_path_ok(spec):
            return None
        import json as _json

        import numpy as np
        import pandas as pd

        from delm_spark.constants import LLM_NULL_WORDS_LOWERCASE

        texts = pd.Series(texts).fillna("").reset_index(drop=True)
        n = len(texts)
        in_toks = ((texts.str.len() + 3) // 4).astype("int64").tolist()
        cname = spec.container_name
        empty_json = "{}"
        if n == 0:
            return [], [], [], []
        m = texts.str.extractall(self._pattern)
        if len(m) == 0:
            jsons = [empty_json] * n
            return jsons, [None] * n, in_toks, [1] * n  # len("{}")==2 -> 1 token

        series = {
            "subj": m["subj"],
            "pred": m["phrase"].map(self._pred_of),
            "obj": m["obj"],
        }
        enc = _json.encoder.encode_basestring_ascii
        alive = np.ones(len(m), dtype=bool)
        pieces = []
        for v in spec.variables:
            s = series[v.name]
            ok = np.ones(len(m), dtype=bool)
            # rule 2: null-word filter (string vars; nones excludes any
            # null word the spec explicitly allows)
            if v.allowed_values is None:
                nones = LLM_NULL_WORDS_LOWERCASE
            else:
                nones = [
                    w for w in LLM_NULL_WORDS_LOWERCASE if w not in v.allowed_values
                ]
            if nones:
                ok &= ~s.str.lower().isin(nones).to_numpy()
            # rule 3: allowed-values filter
            if v.allowed_values:
                ok &= s.isin(v.allowed_values).to_numpy()
            # rule 4 (validate_in_text) is vacuously true for verbatim
            # ASCII capture groups — see _fast_path_ok
            if v.required:
                # rule 5: a required var with no surviving value kills
                # the whole item
                alive &= ok
                enc_map = {u: enc(u) for u in pd.unique(s)}
                val = s.map(enc_map)
            else:
                enc_map = {u: enc(u) for u in pd.unique(s)}
                val = s.map(enc_map).where(pd.Series(ok, index=s.index), "null")
            pieces.append(('"%s": ' % v.name) + val)
        item = pieces[0]
        for p in pieces[1:]:
            item = item + ", " + p
        item = "{" + item + "}"
        # group-join without pandas groupby (its per-group slicing was 80%
        # of the kernel): extractall output is row-ordered, so boundaries
        # are one vectorized compare + a C-join per surviving row
        rows = item.index.get_level_values(0).to_numpy()[alive]
        strs = item.to_numpy()[alive]
        head = '{"%s": [' % cname
        jsons = [empty_json] * n
        if len(strs):
            bounds = np.flatnonzero(np.r_[True, rows[1:] != rows[:-1]])
            ends = np.r_[bounds[1:], len(strs)]
            for b, e in zip(bounds, ends):
                jsons[rows[b]] = head + ", ".join(strs[b:e]) + "]}"
        out_toks = [(len(j) + 3) // 4 for j in jsons]
        return jsons, [None] * n, in_toks, out_toks


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
