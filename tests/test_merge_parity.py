"""Parity of per-record merge vs reference post_processing.merge_jsons_for_record,
including the first-encounter majority-vote tie-break (post_processing.py:32-38)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from delm_spark.schemas import merge_jsons_for_record, majority_vote, spec_from_dict
from tests.test_clean_parity import MULTIPLE_CFG, NESTED_CFG, SIMPLE_CFG


def _ref_merge(ref_delm, cfg, json_list):
    schema = ref_delm["schemas"].SchemaRegistry().create(cfg)
    return ref_delm["post"].merge_jsons_for_record(list(json_list), schema)


word = st.sampled_from(["a", "b", "c", "dd"])
simple_json = st.fixed_dictionaries(
    {
        "authors": st.lists(word, max_size=3),
        "book_prices": st.lists(st.floats(allow_nan=False, allow_infinity=False,
                                          width=16), max_size=2),
        "genre": st.one_of(st.none(), word),
        "available": st.one_of(st.none(), st.booleans()),
        "title": st.one_of(st.none(), word),
    }
)


@settings(max_examples=200, deadline=None)
@given(jsons=st.lists(simple_json, max_size=5))
def test_simple_merge_parity(ref_delm, jsons):
    spec = spec_from_dict(SIMPLE_CFG)
    assert merge_jsons_for_record(jsons, spec) == _ref_merge(ref_delm, SIMPLE_CFG, jsons)


nested_item = st.fixed_dictionaries({"title": word, "author": word})
nested_json = st.fixed_dictionaries({"books": st.lists(nested_item, max_size=3)})


@settings(max_examples=100, deadline=None)
@given(jsons=st.lists(nested_json, max_size=4))
def test_nested_merge_parity(ref_delm, jsons):
    spec = spec_from_dict(NESTED_CFG)
    assert merge_jsons_for_record(jsons, spec) == _ref_merge(ref_delm, NESTED_CFG, jsons)


@settings(max_examples=100, deadline=None)
@given(
    jsons=st.lists(
        st.fixed_dictionaries(
            {
                "book": st.lists(nested_item, max_size=2),
                "meta": st.fixed_dictionaries(
                    {"language": st.one_of(st.none(), word),
                     "scores": st.lists(st.integers(0, 3), max_size=2)}
                ),
            }
        ),
        max_size=3,
    )
)
def test_multiple_merge_parity(ref_delm, jsons):
    spec = spec_from_dict(MULTIPLE_CFG)
    assert merge_jsons_for_record(jsons, spec) == _ref_merge(ref_delm, MULTIPLE_CFG, jsons)


def test_majority_vote_tie_breaks_first_encountered():
    # b and a tie at 2; b encountered first -> b wins (reference quirk)
    assert majority_vote(["b", "a", "a", "b"]) == "b"
    assert majority_vote(["a", "b", "b", "a"]) == "a"
    assert majority_vote([]) is None
    assert majority_vote([1.5, 2.5, 1.5]) == 1.5
