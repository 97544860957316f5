"""Parity of prompt assembly + cache keys vs the reference
(schemas.py create_prompt / get_variables_text, semantic_cache.py
make_cache_key), plus the Spark-native cache_key_expr twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delm_spark.extraction.prompts import (
    CallSpec,
    DEFAULT_PROMPT_TEMPLATE,
    DEFAULT_SYSTEM_PROMPT,
    cache_key_expr,
    create_prompt,
    make_cache_key,
    prompt_expr,
    variables_text,
)
from delm_spark.schemas.spec import spec_from_dict
from tests.conftest import REFERENCE_SRC, _load_ref_module
from tests.test_clean_parity import MULTIPLE_CFG, NESTED_CFG, SIMPLE_CFG

TEXTS = [
    "Alice works at Acme.",
    'text with "quotes" and\nnewlines\tand tabs',
    "unicode: café — emoji \U0001f600 dash‑here",
    "back\\slash and {braces-ish}",
    "",
]


@pytest.fixture(scope="module")
def ref_cache(ref_delm):
    return _load_ref_module(
        "delm.utils.semantic_cache", REFERENCE_SRC / "delm/utils/semantic_cache.py"
    )


def test_default_template_matches_reference(ref_delm):
    import delm.constants as ref_const  # loaded by ref_delm fixture

    assert DEFAULT_PROMPT_TEMPLATE == ref_const.DEFAULT_PROMPT_TEMPLATE
    assert DEFAULT_SYSTEM_PROMPT == ref_const.DEFAULT_SYSTEM_PROMPT


@pytest.mark.parametrize("cfg", [SIMPLE_CFG, NESTED_CFG, MULTIPLE_CFG])
@pytest.mark.parametrize("context", [None, {"ticker": "ACME", "year": 2021}])
def test_create_prompt_matches_reference(ref_delm, cfg, context):
    ref_schema = ref_delm["schemas"].SchemaRegistry().create(cfg)
    spec = spec_from_dict(cfg)
    for text in TEXTS:
        ours = create_prompt(spec, text, DEFAULT_PROMPT_TEMPLATE, context)
        ref = ref_schema.create_prompt(text, DEFAULT_PROMPT_TEMPLATE, context)
        assert ours == ref


def test_variables_text_matches_reference(ref_delm):
    for cfg in (SIMPLE_CFG, NESTED_CFG):
        ref_schema = ref_delm["schemas"].SchemaRegistry().create(cfg)
        assert variables_text(spec_from_dict(cfg).variables) == ref_schema.get_variables_text()


def test_make_cache_key_matches_reference(ref_cache):
    for text in TEXTS:
        for temp in (0.0, 0.7):
            ours = make_cache_key(
                prompt_text=f"P:{text}", system_prompt="S", model_name="m", temperature=temp
            )
            ref = ref_cache.make_cache_key(
                prompt_text=f"P:{text}", system_prompt="S", model_name="m", temperature=temp
            )
            assert ours == ref


@pytest.mark.parametrize("cfg", [SIMPLE_CFG, NESTED_CFG, MULTIPLE_CFG])
def test_cache_key_expr_matches_python_key(spark, cfg):
    """The whole-stage-codegen key (to_json of alphabetical struct) must
    equal the reference-parity Python key for awkward texts."""
    spec = spec_from_dict(cfg)
    call = CallSpec(model_name="gpt-4o-mini", temperature=0.3)
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = {
        r["text"]: r["k"]
        for r in df.select("text", cache_key_expr(spec, F.col("text"), call).alias("k")).collect()
    }
    for t in TEXTS:
        assert got[t] == call.cache_key(spec, t), f"key mismatch for {t!r}"


def test_prompt_expr_matches_python_prompt(spark):
    spec = spec_from_dict(MULTIPLE_CFG)  # text appears once per sub-section
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = {
        r["text"]: r["p"]
        for r in df.select(
            "text", prompt_expr(spec, F.col("text"), DEFAULT_PROMPT_TEMPLATE).alias("p")
        ).collect()
    }
    for t in TEXTS:
        assert got[t] == create_prompt(spec, t, DEFAULT_PROMPT_TEMPLATE)


def test_prompted_api_backend_sends_reference_prompt():
    """PromptedApiBackend assembles the exact reference prompt/system and
    its raw output flows through the cleaning rules."""
    from delm_spark.data.synthetic import TRIPLE_SCHEMA_CFG
    from delm_spark.extraction.backend import PromptedApiBackend
    from delm_spark.extraction.extract import _extract_series

    spec = spec_from_dict(TRIPLE_SCHEMA_CFG)
    seen = {}

    def fake_transport(prompt, system, model, temperature):
        seen.update(prompt=prompt, system=system, model=model, temp=temperature)
        return {"triples": [
            {"subj": "Alice Smith", "pred": "works_at", "obj": "Acme Corp"},
            {"subj": "Alice Smith", "pred": "dislikes", "obj": "Acme Corp"},
        ]}

    call = CallSpec(model_name="gpt-4o-mini", temperature=0.2)
    backend = PromptedApiBackend(spec, fake_transport, call)
    text = "Alice Smith works at Acme Corp."
    jsons, errors, _, _ = _extract_series([text], spec, backend, max_retries=0)
    assert errors == [None]
    assert seen["prompt"] == create_prompt(spec, text)
    assert seen["system"] == DEFAULT_SYSTEM_PROMPT
    assert seen["model"] == "gpt-4o-mini" and seen["temp"] == 0.2
    import json

    cleaned = json.loads(jsons[0])
    # disallowed predicate dropped by the cleaning rules, valid triple kept
    assert cleaned == {"triples": [
        {"subj": "Alice Smith", "pred": "works_at", "obj": "Acme Corp"}
    ]}
