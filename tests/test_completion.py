"""Closed-form tests for KG-completion primitives (kg/completion.py):
filtered negative sampling and common-neighbor / Adamic-Adar link
prediction. Everything here is hand-computable — the oracle-parity suite
covers the at-scale SQL equivalence separately."""

import math

from pyspark.sql import functions as F

from delm_spark.kg.completion import (
    entity_ranks,
    link_prediction_scores,
    negative_samples,
)


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


class TestEntityRanks:
    def test_dense_sorted_ranks(self, spark):
        t = _triples(spark, [("b", "p", "c"), ("a", "p", "b")])
        got = {r["entity"]: r["rank"] for r in entity_ranks(t).collect()}
        assert got == {"a": 0, "b": 1, "c": 2}


class TestNegativeSamples:
    def test_deterministic_and_filtered(self, spark):
        rows = [
            ("alice", "works_at", "acme"),
            ("bob", "works_at", "acme"),
            ("alice", "knows", "bob"),
        ]
        t = _triples(spark, rows)
        a = negative_samples(t, k=3, seed=7).collect()
        b = negative_samples(t, k=3, seed=7).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        assert len(a) > 0
        positives = set(rows)
        for r in a:
            # the corrupted triple is never a positive (filtered setting)
            assert (r["neg_subj"], r["pred"], r["neg_obj"]) not in positives
            # exactly one side is corrupted and the other is untouched
            if r["corrupt_side"] == "subj":
                assert r["neg_obj"] == r["obj"] and r["neg_subj"] != r["subj"]
            else:
                assert r["neg_subj"] == r["subj"] and r["neg_obj"] != r["obj"]

    def test_at_most_k_per_positive_and_seed_changes_draws(self, spark):
        rows = [(f"e{i}", "p", f"e{i+1}") for i in range(8)]
        t = _triples(spark, rows)
        out = negative_samples(t, k=2, seed=0)
        per_pos = (
            out.groupBy("subj", "pred", "obj").count().agg(F.max("count")).first()[0]
        )
        assert per_pos <= 2
        s0 = {tuple(r) for r in out.collect()}
        s1 = {tuple(r) for r in negative_samples(t, k=2, seed=1).collect()}
        assert s0 != s1  # different seed, different hash draws

    def test_duplicate_positives_sampled_once(self, spark):
        t = _triples(spark, [("a", "p", "b")] * 3 + [("b", "p", "c")])
        out = negative_samples(t, k=2, seed=0)
        n_keys = out.select("subj", "pred", "obj", "neg_idx").distinct().count()
        assert out.count() == n_keys  # distinct positives drive the draws


class TestLinkPrediction:
    def test_path_graph_closed_form(self, spark):
        # path 0-1-2-3: candidates (0,2) via 1, (1,3) via 2; both middle
        # nodes have degree 2
        e = _edges(spark, [(0, 1), (1, 2), (2, 3)])
        got = {
            (r["u"], r["v"]): r for r in link_prediction_scores(e).collect()
        }
        aa2 = math.floor(1e6 / math.log(2) + 0.5)
        assert set(got) == {(0, 2), (1, 3)}
        for key in got:
            assert got[key]["common_neighbors"] == 1
            assert got[key]["aa_micro"] == aa2
            assert got[key]["ra_micro"] == 500000

    def test_triangle_with_pendant(self, spark):
        # triangle 0-1-2 plus pendant 2-3: existing edges are excluded
        # even when they have common neighbors; (0,3) and (1,3) score
        # through node 2 (degree 3)
        e = _edges(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
        got = {
            (r["u"], r["v"]): r for r in link_prediction_scores(e).collect()
        }
        aa3 = math.floor(1e6 / math.log(3) + 0.5)
        assert set(got) == {(0, 3), (1, 3)}
        for key in got:
            assert got[key]["common_neighbors"] == 1
            assert got[key]["aa_micro"] == aa3
            assert got[key]["ra_micro"] == 1000000 // 3

    def test_direction_and_duplicates_canonicalized(self, spark):
        # reversed + duplicate raw edges collapse to the same simple graph
        e = _edges(spark, [(1, 0), (0, 1), (2, 1), (3, 2), (2, 3)])
        got = {(r["u"], r["v"]) for r in link_prediction_scores(e).collect()}
        assert got == {(0, 2), (1, 3)}

    def test_hub_cut_drops_wedges(self, spark):
        # star: hub 0 connected to 1..4 — every leaf pair scores through
        # the hub (degree 4); max_hub_degree=3 removes them all
        e = _edges(spark, [(0, i) for i in range(1, 5)])
        full = link_prediction_scores(e)
        assert full.count() == 6  # C(4,2) leaf pairs
        cut = link_prediction_scores(e, max_hub_degree=3)
        assert cut.count() == 0
