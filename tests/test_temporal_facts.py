"""Temporal fact intervals + AS-OF snapshots (kg/temporal_facts.py):
hand values for supersession chains, non-functional accumulation,
simultaneous-assertion tie-breaks, snapshot boundary semantics."""

from __future__ import annotations

import pytest

from delm_spark.kg.temporal_facts import fact_intervals, facts_asof

SCHEMA = "subj_id string, pred string, obj_id string, ts long"

OCC = [
    ("alice", "works_at", "acme", 100),
    ("alice", "works_at", "acme", 150),  # repeat support
    ("alice", "works_at", "initech", 200),  # supersedes acme
    ("alice", "works_at", "globex", 300),  # supersedes initech
    ("alice", "created", "toolx", 120),  # non-functional: accumulates
    ("alice", "created", "tooly", 220),
    ("bob", "works_at", "acme", 50),  # current forever
]


@pytest.fixture()
def intervals(spark):
    occ = spark.createDataFrame(OCC, SCHEMA)
    return fact_intervals(occ, functional_preds=["works_at"])


def test_supersession_chain(intervals):
    rows = {
        (r.subj_id, r.pred, r.obj_id): r
        for r in intervals.collect()
    }
    acme = rows[("alice", "works_at", "acme")]
    assert (acme.first_seen, acme.last_seen, acme.n_support) == (100, 150, 2)
    assert (acme.valid_from, acme.valid_to, acme.is_current) == (
        100,
        200,
        False,
    )
    initech = rows[("alice", "works_at", "initech")]
    assert (initech.valid_from, initech.valid_to) == (200, 300)
    globex = rows[("alice", "works_at", "globex")]
    assert globex.valid_to is None and globex.is_current
    # non-functional facts never supersede each other
    assert rows[("alice", "created", "toolx")].is_current
    assert rows[("alice", "created", "tooly")].is_current
    # other subjects don't interfere
    assert rows[("bob", "works_at", "acme")].is_current


def test_asof_snapshots(intervals):
    def state(ts):
        return sorted(
            (r.subj_id, r.pred, r.obj_id)
            for r in facts_asof(intervals, ts).collect()
        )

    assert state(49) == []
    assert state(99) == [("bob", "works_at", "acme")]
    assert state(100) == [
        ("alice", "works_at", "acme"),
        ("bob", "works_at", "acme"),
    ]
    # boundary: at ts=200 initech has taken over (valid_to is exclusive)
    assert ("alice", "works_at", "initech") in state(200)
    assert ("alice", "works_at", "acme") not in state(200)
    assert state(1000) == [
        ("alice", "created", "toolx"),
        ("alice", "created", "tooly"),
        ("alice", "works_at", "globex"),
        ("bob", "works_at", "acme"),
    ]


def test_simultaneous_assertions_tie_break(spark):
    occ = spark.createDataFrame(
        [("s", "works_at", "b_org", 100), ("s", "works_at", "a_org", 100)],
        SCHEMA,
    )
    rows = {
        r.obj_id: r
        for r in fact_intervals(
            occ, functional_preds=["works_at"]
        ).collect()
    }
    # obj asc tie-break: a_org gets the zero-length interval, b_org wins
    assert (rows["a_org"].valid_from, rows["a_org"].valid_to) == (100, 100)
    assert rows["b_org"].is_current
    # the zero-length fact is visible at NO timestamp
    iv = fact_intervals(occ, functional_preds=["works_at"])
    assert facts_asof(iv, 100).filter("obj_id = 'a_org'").count() == 0


def test_no_functional_preds_means_everything_current(spark):
    occ = spark.createDataFrame(OCC, SCHEMA)
    iv = fact_intervals(occ)
    assert iv.filter("NOT is_current").count() == 0


def test_null_ts_occurrences_dropped(spark):
    occ = spark.createDataFrame(
        [("s", "p", "o", None), ("s", "p", "o", 5)], SCHEMA
    )
    r = fact_intervals(occ).collect()
    assert len(r) == 1 and r[0].n_support == 1 and r[0].first_seen == 5
