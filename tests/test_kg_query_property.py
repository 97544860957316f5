"""Property-based cross-checks for the BGP engine: match_pattern and
property_path vs exhaustive pure-Python evaluators on random small
graphs. The DuckDB oracles pin two fixed query shapes; these pin the
ENGINE over the pattern space (join order, repeated variables,
constants in any slot, cycles, diamonds)."""

from __future__ import annotations

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delm_spark.kg.query import match_pattern, property_path

ENTS = ["a", "b", "c", "d"]
PREDS = ["p", "q"]
VARS = ["?x", "?y", "?z"]

triples_st = st.lists(
    st.tuples(
        st.sampled_from(ENTS), st.sampled_from(PREDS), st.sampled_from(ENTS)
    ),
    min_size=1,
    max_size=12,
)

term_st = st.sampled_from(VARS + ENTS)
pattern_st = st.tuples(term_st, st.sampled_from(VARS + PREDS), term_st)
patterns_st = st.lists(pattern_st, min_size=1, max_size=3)


def _vars_of(pat):
    return {t[1:] for t in pat if isinstance(t, str) and t.startswith("?")}


def _connected(patterns):
    groups = [_vars_of(p) for p in patterns]
    if any(not g for g in groups):
        return False
    bound = set(groups[0])
    remaining = list(range(1, len(groups)))
    while remaining:
        nxt = [i for i in remaining if groups[i] & bound]
        if not nxt:
            return False
        for i in nxt:
            bound |= groups[i]
            remaining.remove(i)
    return True


def _ref_match(triples, patterns):
    """Exhaustive reference: try every combination of triples against
    the pattern list under a shared variable binding."""
    out = set()
    allvars = sorted(set().union(*(_vars_of(p) for p in patterns)))
    for combo in itertools.product(set(triples), repeat=len(patterns)):
        env: dict[str, str] = {}
        ok = True
        for pat, row in zip(patterns, combo):
            for term, val in zip(pat, row):
                if term.startswith("?"):
                    v = term[1:]
                    if env.get(v, val) != val:
                        ok = False
                        break
                    env[v] = val
                elif term != val:
                    ok = False
                    break
            if not ok:
                break
        if ok:
            out.add(tuple(env[v] for v in allvars))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(triples=triples_st, patterns=patterns_st)
def test_match_pattern_equals_exhaustive_reference(spark, triples, patterns):
    tdf = spark.createDataFrame(
        triples, "subj_id string, pred string, obj_id string"
    )
    if not _connected(patterns):
        with pytest.raises(ValueError):
            match_pattern(tdf, patterns)
        return
    got = match_pattern(tdf, patterns)
    cols = sorted(got.columns)
    have = {tuple(r[c] for c in cols) for r in got.collect()}
    want = _ref_match(triples, patterns)
    assert have == want


def _ref_paths(edges, max_hops):
    """Reference BFS in pair space with minimal hop counts."""
    adj: dict[str, set[str]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    out: dict[tuple[str, str], int] = {}
    frontier = {(s, d) for s, ds in adj.items() for d in ds}
    for (s, d) in frontier:
        out[(s, d)] = 1
    for h in range(2, max_hops + 1):
        nxt = set()
        for (s, mid) in frontier:
            for d in adj.get(mid, ()):
                if (s, d) not in out:
                    out[(s, d)] = h
                    nxt.add((s, d))
        frontier = nxt
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.sampled_from(ENTS), st.sampled_from(ENTS)),
        min_size=1,
        max_size=10,
    ),
    max_hops=st.integers(min_value=1, max_value=4),
)
def test_property_path_equals_reference_bfs(spark, edges, max_hops):
    rows = [(s, "p", d) for s, d in edges] + [("a", "q", "b")]
    tdf = spark.createDataFrame(
        rows, "subj_id string, pred string, obj_id string"
    )
    got = {
        (r["src"], r["dst"]): r["hops"]
        for r in property_path(tdf, "p", max_hops=max_hops).collect()
    }
    assert got == _ref_paths(set(edges), max_hops)
