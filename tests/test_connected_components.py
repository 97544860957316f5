"""Connected components: driver union-find (small graphs) must agree with
the distributed min-label propagation (forced via driver_cutoff=0)."""

from __future__ import annotations

import pytest

from delm_spark.kg.canonicalize import connected_components

EDGES = [
    ("a", "b"), ("b", "c"),          # chain -> component "a"
    ("x", "y"),                       # pair -> "x"
    ("m", "n"), ("n", "o"), ("o", "m"),  # cycle -> "m"
    ("solo1", "solo2"),
]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def _as_map(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_driver_and_distributed_agree(spark, edges_df):
    small = _as_map(connected_components(edges_df))  # driver path
    big = _as_map(connected_components(edges_df, driver_cutoff=0))  # distributed
    assert small == big
    assert small["c"] == "a" and small["y"] == "x" and small["o"] == "m"


def test_distributed_converges_on_long_chain(spark):
    # 30-node chain: needs multiple propagation rounds
    edges = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(30)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = _as_map(connected_components(df, driver_cutoff=0))
    assert set(got.values()) == {"n00"}
    assert len(got) == 31
