"""The curation pipeline as ONE `spark-submit --py-files` invocation
(real spark-submit subprocess): raw documents parquet in, dispositions
and packed corpus parquet out."""

from __future__ import annotations

import json
import os
import subprocess
import zipfile
from pathlib import Path

import pytest

from tests.conftest import TESTDATA

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = Path("/opt/spark/bin/spark-submit")


@pytest.mark.slow  # ~24 s of spark-submit JVM cold start; the docs-mode
# curation semantics are fully pinned by the curation_pipeline_docs oracle
# test and curate.py unit tests, and the submit_curation.py CLI path stays
# covered by the (default-run) transcript-mode e2e below. Run with -m slow.
@pytest.mark.skipif(not SPARK_SUBMIT.exists(), reason="spark-submit not on host")
def test_spark_submit_curation_end_to_end(tmp_path):
    zpath = tmp_path / "delm_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in (REPO / "delm_spark").rglob("*.py"):
            z.write(p, p.relative_to(REPO))
    out = tmp_path / "curated"
    docs = str(TESTDATA / "sf0.001" / "documents.parquet")
    env = dict(os.environ, PYTHONPATH="")  # the zip must be self-sufficient
    proc = subprocess.run(
        [
            str(SPARK_SUBMIT),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath),
            str(REPO / "submit_curation.py"),
            "--documents", docs,
            "--test-set", docs,  # every doc 8-gram-overlaps itself...
            "--output", str(out),
            "--budget", "500",
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    stats = json.loads(line)
    # ...so every doc that survives dedup+quality is 'contaminated' and
    # the kept set is empty — the census still covers every input row
    assert "contaminated" in stats["census"]
    assert (out / "dispositions" / "_SUCCESS").exists()
    assert [p for p in (out / "dispositions").iterdir()
            if p.name.startswith("status=")]
    assert (out / "corpus" / "_SUCCESS").exists()

    import duckdb

    con = duckdb.connect()
    n_in = con.execute(f"SELECT count(*) FROM '{docs}'").fetchone()[0]
    n_disp = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/dispositions/*/*.parquet', "
        f"hive_partitioning=1)"
    ).fetchone()[0]
    assert n_disp == n_in


@pytest.mark.skipif(not SPARK_SUBMIT.exists(), reason="spark-submit not on host")
def test_spark_submit_transcript_curation_end_to_end(tmp_path):
    # normally launched at collection time (tests/submit_background.py)
    # so the subprocess wall overlaps the in-session tests; synchronous
    # fallback for single-test invocations
    from tests import submit_background

    bg = submit_background.wait("curation")
    if bg is not None:
        stats, out = bg
    else:
        zpath = tmp_path / "delm_spark.zip"
        with zipfile.ZipFile(zpath, "w") as z:
            for p in (REPO / "delm_spark").rglob("*.py"):
                z.write(p, p.relative_to(REPO))
        out = tmp_path / "curated"
        turns = str(REPO / "tests" / "fixtures" / "transcripts.parquet")
        env = dict(os.environ, PYTHONPATH="")
        proc = subprocess.run(
            [
                str(SPARK_SUBMIT),
                "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--conf", "spark.ui.enabled=false",
                "--py-files", str(zpath),
                str(REPO / "submit_curation.py"),
                "--transcripts", turns,
                "--output", str(out),
                "--budget", "400",
            ],
            capture_output=True, text=True, timeout=420, env=env,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        stats = json.loads(line)
    assert stats["census"].get("kept", 0) > 0
    # dispositions cover every conversation exactly once
    import pyarrow.parquet as pq

    disp = pq.read_table(str(out / "dispositions")).to_pydict()
    assert len(disp["conv_id"]) == len(set(disp["conv_id"]))
    corpus = pq.read_table(str(out / "corpus"))
    assert corpus.num_rows == stats["census"]["kept"]
    assert {"conv_id", "pack_id", "text"} <= set(corpus.schema.names)
