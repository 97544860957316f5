"""Parity of the cleaning kernel vs the reference's own pure functions.

The reference (`/root/reference/src/delm/schemas/schemas.py`) is imported
as the oracle: for schema-conformant raw responses (what Instructor would
return), `delm_spark.schemas.clean.clean_response` must equal
`<ref schema>.validate_and_parse_response_to_dict`.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from delm_spark.schemas import clean_response, spec_from_dict

SIMPLE_CFG = {
    "schema_type": "simple",
    "variables": [
        {"name": "authors", "description": "d", "data_type": "[string]"},
        {"name": "book_prices", "description": "d", "data_type": "[number]"},
        {
            "name": "genre",
            "description": "d",
            "data_type": "string",
            "allowed_values": ["fiction", "non-fiction", "unknown"],
        },
        {"name": "available", "description": "d", "data_type": "boolean"},
        {"name": "title", "description": "d", "data_type": "string", "required": True,
         "validate_in_text": True},
    ],
}

NESTED_CFG = {
    "schema_type": "nested",
    "container_name": "books",
    "variables": [
        {"name": "title", "description": "d", "data_type": "string", "required": True},
        {"name": "author", "description": "d", "data_type": "string",
         "validate_in_text": True},
        {"name": "copies_sold", "description": "d", "data_type": "integer"},
        {"name": "price", "description": "d", "data_type": "number"},
        {"name": "tags", "description": "d", "data_type": "[string]"},
    ],
}

MULTIPLE_CFG = {
    "schema_type": "multiple",
    "book": NESTED_CFG,
    "meta": {
        "schema_type": "simple",
        "variables": [
            {"name": "language", "description": "d", "data_type": "string"},
            {"name": "scores", "description": "d", "data_type": "[integer]"},
        ],
    },
}


def _ref_schema(ref_delm, cfg):
    return ref_delm["schemas"].SchemaRegistry().create(cfg)


def _ref_clean(ref_delm, cfg, raw, text):
    schema = _ref_schema(ref_delm, cfg)
    Model = schema.create_pydantic_schema()
    resp = Model.model_validate(raw)
    return schema.validate_and_parse_response_to_dict(resp, text)


word = st.sampled_from(
    ["alice", "unknown", "none", "fiction", "drama", "N/A", "Moby Dick",
     "war and peace", "null", "bob", ""]
)
maybe_words = st.lists(word, max_size=4)
text_strategy = st.sampled_from(
    [
        "Moby Dick by alice is fiction.",
        "war and peace, a drama by bob",
        "nothing relevant here",
        "ALICE wrote Moby Dick and it is available",
    ]
)


@settings(max_examples=200, deadline=None)
@given(
    authors=maybe_words,
    prices=st.lists(st.floats(allow_nan=False, allow_infinity=False, width=32),
                    max_size=3),
    genre=st.one_of(st.none(), word),
    available=st.one_of(st.none(), st.booleans()),
    title=st.one_of(st.none(), word),
    text=text_strategy,
)
def test_simple_parity(ref_delm, authors, prices, genre, available, title, text):
    raw = {
        "authors": authors,
        "book_prices": prices,
        "genre": genre,
        "available": available,
        "title": title,
    }
    ours = clean_response(raw, spec_from_dict(SIMPLE_CFG), text)
    ref = _ref_clean(ref_delm, SIMPLE_CFG, raw, text)
    assert ours == ref


item_strategy = st.fixed_dictionaries(
    {
        "title": st.one_of(st.none(), word),
        "author": st.one_of(st.none(), word),
        "copies_sold": st.one_of(st.none(), st.integers(-10, 10_000)),
        "price": st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                                width=32)),
        "tags": st.lists(word, max_size=3),
    }
)


@settings(max_examples=200, deadline=None)
@given(items=st.lists(item_strategy, max_size=4), text=text_strategy)
def test_nested_parity(ref_delm, items, text):
    raw = {"books": items}
    ours = clean_response(raw, spec_from_dict(NESTED_CFG), text)
    ref = _ref_clean(ref_delm, NESTED_CFG, raw, text)
    assert ours == ref


@settings(max_examples=100, deadline=None)
@given(
    items=st.lists(item_strategy, max_size=3),
    language=st.one_of(st.none(), word),
    scores=st.lists(st.integers(0, 5), max_size=3),
    text=text_strategy,
)
def test_multiple_parity(ref_delm, items, language, scores, text):
    raw = {"book": {"books": items}, "meta": {"language": language, "scores": scores}}
    ours = clean_response(raw, spec_from_dict(MULTIPLE_CFG), text)
    ref = _ref_clean(ref_delm, MULTIPLE_CFG, raw, text)
    assert ours == ref


def test_null_word_filtering_unless_allowed(ref_delm):
    # "unknown" is in LLM null words but explicitly allowed for genre
    raw = {"authors": ["none", "alice"], "book_prices": [], "genre": "unknown",
           "available": None, "title": "Moby Dick"}
    text = "Moby Dick is a book"
    ours = clean_response(raw, spec_from_dict(SIMPLE_CFG), text)
    ref = _ref_clean(ref_delm, SIMPLE_CFG, raw, text)
    assert ours == ref
    assert ours["genre"] == "unknown"
    assert ours["authors"] == ["alice"]


def test_required_gating_drops_whole_item(ref_delm):
    raw = {"books": [
        {"title": "null", "author": "bob", "copies_sold": 1, "price": 1.0, "tags": []},
        {"title": "Real Title", "author": None, "copies_sold": 2, "price": 2.0,
         "tags": ["x"]},
    ]}
    text = "Real Title text"
    ours = clean_response(raw, spec_from_dict(NESTED_CFG), text)
    ref = _ref_clean(ref_delm, NESTED_CFG, raw, text)
    assert ours == ref
    assert len(ours["books"]) == 1 and ours["books"][0]["title"] == "Real Title"


def test_empty_and_none_response():
    spec = spec_from_dict(SIMPLE_CFG)
    assert clean_response(None, spec, "x") == {}
    assert clean_response({}, spec, "x") == {}
