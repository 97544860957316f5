"""Parity of the recursive field-path P/R kernel vs the reference
(performance_estimation.py:206-388), pure and distributed."""

from __future__ import annotations

import sys
import types

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from delm_spark.eval.fieldpath import (
    all_levels_precision_recall,
    build_required_map,
)
from delm_spark.schemas.spec import spec_from_dict
from tests.conftest import REFERENCE_SRC, _load_ref_module
from tests.test_clean_parity import MULTIPLE_CFG, NESTED_CFG, SIMPLE_CFG


@pytest.fixture(scope="module")
def ref_perf(ref_delm):
    # performance_estimation imports DELMConfig only for its e2e API; the
    # pure metric functions never touch it — stub the config module.
    cfg_stub = types.ModuleType("delm.config")
    cfg_stub.DELMConfig = type("DELMConfig", (), {})
    sys.modules["delm.config"] = cfg_stub
    return _load_ref_module(
        "delm.utils.performance_estimation",
        REFERENCE_SRC / "delm/utils/performance_estimation.py",
    )


word = st.sampled_from(["a", "b", "", None])
scalar = st.one_of(st.none(), word, st.integers(0, 3), st.booleans())
item = st.fixed_dictionaries(
    {"title": word, "tags": st.lists(st.sampled_from(["x", "y"]), max_size=2)}
)
doc = st.fixed_dictionaries(
    {
        "genre": scalar,
        "authors": st.lists(st.sampled_from(["p", "q"]), max_size=3),
        "books": st.lists(item, max_size=3),
        "meta": st.fixed_dictionaries({"language": word}),
    }
)


@settings(max_examples=200, deadline=None)
@given(y_true=doc, y_pred=doc)
def test_walk_parity_random_trees(ref_perf, y_true, y_pred):
    req = {"genre": False, "books.title": True, "meta.language": False}
    ours = all_levels_precision_recall(y_true, y_pred, req)
    ref = ref_perf._all_levels_precision_recall(y_true, y_pred, req)
    assert ours == ref


def test_required_map_matches_reference(ref_delm, ref_perf):
    for cfg in (SIMPLE_CFG, NESTED_CFG, MULTIPLE_CFG):
        ref_schema = ref_delm["schemas"].SchemaRegistry().create(cfg)
        assert build_required_map(spec_from_dict(cfg)) == ref_perf._build_required_map(
            ref_schema
        )


def test_distributed_field_path_confusion_matches_reference_agg(spark, ref_perf, ref_delm):
    import json

    from delm_spark.eval.metrics import field_path_confusion

    spec = spec_from_dict(NESTED_CFG)
    ref_schema = ref_delm["schemas"].SchemaRegistry().create(NESTED_CFG)
    pairs = [
        (
            {"books": [{"title": "t1", "author": "a1", "tags": ["x"]}]},
            {"books": [{"title": "t1", "author": "a2", "tags": ["x", "y"]}]},
        ),
        ({"books": []}, {"books": [{"title": "ghost"}]}),
        (
            {"books": [{"title": "t2"}, {"title": "t3"}]},
            {"books": [{"title": "t3"}]},
        ),
    ]
    df = spark.createDataFrame(
        [(json.dumps(t), json.dumps(p)) for t, p in pairs],
        "expected_json string, extracted_json string",
    )
    got = {
        r["field"]: (r["tp"], r["fp"], r["fn"])
        for r in field_path_confusion(df, spec).collect()
    }
    ref = ref_perf._aggregate_performance_metrics_across_records(
        [t for t, _ in pairs], [p for _, p in pairs], ref_schema
    )
    assert set(got) == set(ref)
    for fld in ref:
        assert got[fld] == (ref[fld]["tp"], ref[fld]["fp"], ref[fld]["fn"]), fld
