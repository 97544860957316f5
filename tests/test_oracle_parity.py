"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side (DuckDB) on the testdata parquet
and compare row counts + values (columns sorted by name, rows sorted)."""

from __future__ import annotations

import math
from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import TESTDATA

import os

SF_DIR = str(TESTDATA / os.environ.get("SPARK_GRAFT_PARITY_SF", "sf0.001"))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


ORACLES = sorted(entry_mod.oracle_sql().keys())


def _canon_pandas(pdf):
    """Replica of the driver's canonicalization: columns sorted by name,
    rows sorted by all columns (fails loudly on unhashable cells, as the
    driver does), then a per-cell string rendering that is dtype-sensitive
    (int64 123 != float64 123.0 — catches DuckDB HUGEINT drift)."""
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    cells = []
    for col in pdf.columns:
        s = pdf[col]
        if s.dtype == "float64":
            cells.append([f"f:{round(v, 9)}" if v == v else "f:nan" for v in s])
        elif str(s.dtype).startswith(("int", "uint")):
            cells.append([f"i:{v}" for v in s])
        else:
            cells.append([f"o:{v}" for v in s])
    return list(zip(*cells))


@pytest.mark.parametrize("name", ORACLES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spdf = sdf.toPandas()

    rel = duck.sql(entry_mod.oracle_sql()[name])
    dpdf = rel.df()

    assert sorted(spdf.columns) == sorted(dpdf.columns), (
        f"{name}: column mismatch {list(spdf.columns)} vs {list(dpdf.columns)}"
    )
    assert len(spdf) == len(dpdf), f"{name}: rowcount {len(spdf)} vs {len(dpdf)}"
    a, b = _canon_pandas(spdf), _canon_pandas(dpdf)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


ROWS_ONLY = sorted(set(entry_mod.queries()) - set(ORACLES))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_every_query_has_an_oracle():
    """Full oracle coverage is a maintained invariant: every queries()
    entry must ship DuckDB oracle SQL (no rows-only checks)."""
    assert set(entry_mod.queries()) == set(entry_mod.oracle_sql())
