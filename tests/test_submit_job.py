"""The north rule's execution constraint, exercised literally: the whole
pipeline as ONE `spark-submit --py-files delm_spark.zip submit_job.py`
invocation (real spark-submit subprocess, fixture corpus in, nodes/edges
parquet out)."""

from __future__ import annotations

import json
import os
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = Path("/opt/spark/bin/spark-submit")

pytestmark = pytest.mark.skipif(
    not SPARK_SUBMIT.exists(), reason="spark-submit not on host"
)


def _submit(zpath, out, extra):
    env = dict(os.environ, PYTHONPATH="")  # the zip must be self-sufficient
    proc = subprocess.run(
        [
            str(SPARK_SUBMIT),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath),
            str(REPO / "submit_job.py"),
            "--transcripts", str(REPO / "tests/fixtures/transcripts.parquet"),
            "--dictionary", str(REPO / "tests/fixtures/dictionary.parquet"),
            "--output", str(out),
        ] + extra,
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


@pytest.fixture(scope="module")
def base_kg(tmp_path_factory):
    """ONE real spark-submit run (zip built once), shared by the e2e
    assertions and as the merge base — a second identical full run would
    only re-pay the JVM cold start.

    Normally the run was ALREADY LAUNCHED at pytest collection time
    (tests/submit_background.py — overlaps the subprocess wall with the
    in-session tests); this fixture just joins it. The in-place merge
    chained behind it must ALSO be joined here: it overwrites nodes/ and
    edges/ in the same directory, so assertions may only start once the
    directory is quiescent. Falls back to a synchronous run when the
    launcher never started (single-test invocations)."""
    from tests import submit_background

    bg = submit_background.wait("base")
    if bg is not None:
        stats, out = bg
        merged = submit_background.wait("merge")
        assert merged is not None, "base succeeded but merge never launched"
        return {
            "zip": submit_background._STATE["zip"],
            "out": out,
            "stats": stats,
            "root": out.parent,
            "merged_stats": merged[0],
        }
    root = tmp_path_factory.mktemp("submit_job")
    zpath = root / "delm_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in (REPO / "delm_spark").rglob("*.py"):
            z.write(p, p.relative_to(REPO))
    out = root / "kg_out"
    stats = _submit(
        zpath,
        out,
        [
            "--analytics", "--pagerank-iters", "3",
            "--walks-length", "4", "--quality",
        ],
    )
    return {"zip": zpath, "out": out, "stats": stats, "root": root}


def test_spark_submit_py_files_end_to_end(base_kg):
    out, stats = base_kg["out"], base_kg["stats"]
    assert stats["nodes"] > 0 and stats["edges"] > 0
    assert (out / "edges" / "_SUCCESS").exists()
    # the edge table is value-partitioned by predicate (north-star
    # "partitioned edges table"): Hive pred= directories present
    assert [p for p in (out / "edges").iterdir() if p.name.startswith("pred=")]
    # --analytics materializes the day-after queries over the written graph
    assert stats["analytics"] == [
        "degree_distribution", "pagerank", "communities"
    ]
    assert (out / "degree_distribution" / "_SUCCESS").exists()
    assert (out / "pagerank" / "_SUCCESS").exists()
    assert (out / "communities" / "_SUCCESS").exists()
    assert (out / "walks" / "_SUCCESS").exists()
    import duckdb

    con = duckdb.connect()
    deg = con.execute(
        f"SELECT sum(degree * n_nodes) FROM '{out}/degree_distribution/*.parquet'"
    ).fetchone()[0]
    assert deg == 2 * stats["edges"]  # every edge contributes two endpoints
    pr = con.execute(
        f"SELECT count(*), sum(rank) FROM '{out}/pagerank/*.parquet'"
    ).fetchone()
    assert pr[0] > 0 and abs(pr[1] - 1.0) < 1e-6  # ranks sum to 1
    # communities: one row per node, total community sizes re-add to nodes
    com = con.execute(
        f"SELECT count(*), count(DISTINCT community) FROM '{out}/communities/*.parquet'"
    ).fetchone()
    # (walks/communities drop self-loop-only nodes; pagerank keeps them)
    assert 0 < com[1] <= com[0] <= pr[0]
    # walks: one walk per node, every path has length+1 nodes
    wk = con.execute(
        f"SELECT count(*), min(len(string_split(path, '>'))), "
        f"max(len(string_split(path, '>'))) FROM '{out}/walks/*.parquet'"
    ).fetchone()
    assert 0 < wk[0] <= pr[0] and wk[1] == 5 and wk[2] == 5
    # --quality materializes the publish-gate family over the same edges
    assert stats["quality"] == [
        "quality_report", "functional_resolution", "entity_types",
        "type_violations",
    ]
    qr = dict(
        con.execute(
            f"SELECT check_name, n_violations FROM '{out}/quality_report/*.parquet'"
        ).fetchall()
    )
    # deterministic fixture values, not just the key set: a healthy
    # occurrence-keyed build has zero duplicates/nulls/unresolved, and
    # the fixture's planted contradictions and echo artifacts are real
    assert qr == {
        "self_loop": 62,
        "duplicate_triple": 0,
        "unresolved_subj": 0,
        "unresolved_obj": 0,
        "functional_violation": 120,
        "null_endpoint": 0,
    }
    fr = con.execute(
        f"SELECT count(*), sum(CASE WHEN status = 'current' THEN 1 ELSE 0 END), "
        f"count(DISTINCT subj || '|' || pred) FROM '{out}/functional_resolution/*.parquet'"
    ).fetchone()
    assert fr[0] > 0 and fr[1] == fr[2]  # exactly one current per group
    et = con.execute(
        f"SELECT count(*), min(n_votes), min(n_total - n_votes) "
        f"FROM '{out}/entity_types/*.parquet'"
    ).fetchone()
    assert et[0] > 0 and et[1] >= 1 and et[2] >= 0
    assert (out / "type_violations" / "_SUCCESS").exists()


def test_spark_submit_merge_into_same_dir_is_idempotent(base_kg):
    """--merge-into with the SAME batch AND --output == --merge-into (the
    natural in-place incremental workflow, ADVICE r4): the merged plan
    reads {output}/edges while the job overwrites it — without the
    pre-overwrite materialization the edges write fails AFTER nodes/ was
    replaced, leaving the KG directory inconsistent. A passing run proves
    both the exactly-once no-op merge and the in-place write path."""
    first = base_kg["stats"]
    merged = base_kg.get("merged_stats")
    if merged is None:  # synchronous fallback (no background launcher)
        merged = _submit(
            base_kg["zip"],
            base_kg["out"],  # in-place: output == merge-into
            ["--merge-into", str(base_kg["out"])],
        )
    assert merged["edges"] == first["edges"]  # re-delivery is a no-op
    assert merged["nodes"] == first["nodes"]
    assert merged["merge"]["fresh_conv_ids"] == 0  # everything was dropped
    assert merged["merge"]["dropped_conv_ids"] > 0
    # the directory stayed consistent: both tables re-readable and paired
    assert (base_kg["out"] / "edges" / "_SUCCESS").exists()
    assert (base_kg["out"] / "nodes" / "_SUCCESS").exists()
