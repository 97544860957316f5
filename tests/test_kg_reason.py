"""RDFS entailment materialization (kg/reason.py rdfs_closure):
stratified rule evaluation against hand-computed closures, asserted-
wins provenance, cycle safety, empty-schema identity."""

from __future__ import annotations

import pytest

from delm_spark.kg.reason import rdfs_closure

SCHEMA = "subj_id string, pred string, obj_id string"

DATA = [
    ("alice", "works_at", "acme"),
    ("acme", "located_in", "springfield"),
    ("bob", "type", "Person"),
]

ONTOLOGY = [
    ("works_at", "subproperty_of", "affiliated_with"),
    ("affiliated_with", "subproperty_of", "related_to"),
    ("works_at", "domain", "Person"),
    ("works_at", "range", "Org"),
    ("located_in", "domain", "Org"),
    ("located_in", "range", "Place"),
    ("Org", "subclass_of", "Agent"),
    ("Person", "subclass_of", "Agent"),
    ("Agent", "subclass_of", "Entity"),
]


@pytest.fixture()
def frames(spark):
    return (
        spark.createDataFrame(DATA, SCHEMA),
        spark.createDataFrame(ONTOLOGY, SCHEMA),
    )


def test_rdfs_closure_hand_computed(frames):
    data, onto = frames
    rows = {
        (r.subj_id, r.pred, r.obj_id): r.inferred
        for r in rdfs_closure(data, onto).collect()
    }
    expect_inferred = {
        # rdfs7 up the two-level property chain
        ("alice", "affiliated_with", "acme"),
        ("alice", "related_to", "acme"),
        # rdfs2/3 domain+range typing
        ("alice", "type", "Person"),
        ("acme", "type", "Org"),
        ("springfield", "type", "Place"),
        # rdfs9 up the class chain, incl. the asserted bob type
        ("alice", "type", "Agent"),
        ("alice", "type", "Entity"),
        ("acme", "type", "Agent"),
        ("acme", "type", "Entity"),
        ("bob", "type", "Agent"),
        ("bob", "type", "Entity"),
        # rdfs5/11 transitive schema pairs
        ("works_at", "subproperty_of", "related_to"),
        ("Org", "subclass_of", "Entity"),
        ("Person", "subclass_of", "Entity"),
    }
    assert {k for k, v in rows.items() if v == 1} == expect_inferred
    # every asserted data + schema row survives with inferred=0
    for t in DATA + ONTOLOGY:
        assert rows[t] == 0
    assert len(rows) == len(DATA) + len(ONTOLOGY) + len(expect_inferred)


def test_rdfs_closure_asserted_wins(frames):
    data, onto = frames
    plus = data.unionByName(
        data.sparkSession.createDataFrame(
            [("alice", "type", "Person")], SCHEMA
        )
    )
    rows = {
        (r.subj_id, r.pred, r.obj_id): r.inferred
        for r in rdfs_closure(plus, onto).collect()
    }
    assert rows[("alice", "type", "Person")] == 0  # min wins
    assert rows[("alice", "type", "Agent")] == 1


def test_rdfs_closure_cycle_safe(spark):
    data = spark.createDataFrame([("x", "type", "A")], SCHEMA)
    onto = spark.createDataFrame(
        [("A", "subclass_of", "B"), ("B", "subclass_of", "A")], SCHEMA
    )
    rows = {
        (r.subj_id, r.pred, r.obj_id): r.inferred
        for r in rdfs_closure(data, onto).collect()
    }
    assert rows[("x", "type", "B")] == 1
    # cycle members genuinely entail their own self-subclass pair
    assert rows[("A", "subclass_of", "A")] == 1
    assert rows[("x", "type", "A")] == 0


def test_rdfs_closure_empty_schema_is_identity(spark):
    data = spark.createDataFrame(DATA, SCHEMA)
    onto = spark.createDataFrame([], SCHEMA)
    rows = {
        (r.subj_id, r.pred, r.obj_id): r.inferred
        for r in rdfs_closure(data, onto).collect()
    }
    assert rows == {t: 0 for t in DATA}
