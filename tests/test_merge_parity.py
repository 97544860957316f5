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


# ---------------------------------------------------------------------------
# distributed merge_records vs the pure twin (one JSON per chunk, ordered)
# ---------------------------------------------------------------------------

import json

from delm_spark.operators.merge import merge_records


def _run_distributed(spark, cfg, records):
    """records: {record_id: [json_dict_per_chunk_in_order]} -> result rows."""
    spec = spec_from_dict(cfg)
    rows = [
        (rid, pos, json.dumps(j))
        for rid, jsons in records.items()
        for pos, j in enumerate(jsons)
    ]
    df = spark.createDataFrame(
        rows, "record_id string, pos int, delm_extracted_data_json string"
    )
    out = merge_records(df, spec, "record_id", "pos")
    return {r["record_id"]: r.asDict(recursive=True) for r in out.collect()}


def _pure(cfg, jsons):
    return merge_jsons_for_record(list(jsons), spec_from_dict(cfg))


def _assert_match(spark, cfg, records):
    got = _run_distributed(spark, cfg, records)
    for rid, jsons in records.items():
        expected = _pure(cfg, jsons)
        actual = {k: v for k, v in got[rid].items() if k != "record_id"}
        assert actual == expected, f"{rid}: {actual} != {expected}"


def test_merge_records_simple_parity_including_null_list_chunk(spark):
    """A NULL list value in any chunk must not wipe the concat (F.flatten
    returns NULL if any inner array is NULL) — reachable whenever an
    invalid/empty extraction ('{}') parses to NULL fields via from_json."""
    full = {"authors": ["a", "b"], "book_prices": [1.5], "genre": "fiction",
            "available": True, "title": "t"}
    null_list = {"authors": None, "book_prices": None, "genre": None,
                 "available": None, "title": None}
    more = {"authors": ["c"], "book_prices": [], "genre": "fiction",
            "available": False, "title": "u"}
    records = {
        "r_nullbug": [full, null_list, more],
        "r_allnull": [null_list, null_list],
        "r_single": [more],
        "r_tie": [
            {**full, "title": "x", "available": True},
            {**full, "title": "y", "available": False},
            {**full, "title": "y", "available": True},
            {**full, "title": "x", "available": False},
        ],
    }
    _assert_match(spark, SIMPLE_CFG, records)
    # regression pin for the flatten-null bug specifically
    got = _run_distributed(spark, SIMPLE_CFG, records)
    assert got["r_nullbug"]["authors"] == ["a", "b", "c"]


def test_merge_records_nested_parity(spark):
    item = lambda t, a: {"title": t, "author": a, "copies_sold": 3,  # noqa: E731
                         "price": 9.5, "tags": ["x"]}
    records = {
        "r1": [{"books": [item("t1", "a1"), item("t2", "a2")]},
               {"books": None},
               {"books": [item("t3", "a3")]}],
        "r2": [{"books": []}],
    }
    _assert_match(spark, NESTED_CFG, records)


def test_merge_records_multiple_parity(spark):
    bk = lambda t: {"title": t, "author": "a", "copies_sold": 1,  # noqa: E731
                    "price": 2.0, "tags": []}
    records = {
        "m1": [
            {"book": [bk("t1")], "meta": {"language": "en", "scores": [1, 2]}},
            {"book": None, "meta": {"language": None, "scores": None}},
            {"book": [bk("t2")], "meta": {"language": "de", "scores": [3]}},
            {"book": [], "meta": {"language": "de", "scores": []}},
        ],
        "m2": [{"book": [], "meta": {"language": None, "scores": []}}],
    }
    _assert_match(spark, MULTIPLE_CFG, records)
