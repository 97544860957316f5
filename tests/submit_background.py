"""Background launcher for the spark-submit e2e subprocesses.

The three end-to-end spark-submit invocations (KG job, in-place merge,
transcript curation) are REAL separate JVMs by design — that is what
they test — but ~72 s of their wall is JVM cold start + a 4-core
pipeline while the 32-core host otherwise runs only the 4-core test
session. Launching them when pytest finishes COLLECTION (not when their
test finally runs, near the end of the alphabet) overlaps almost all of
that wall with the in-session tests: the tests themselves just join the
Popen and assert on its output.

Ordering: the merge job reads the base job's output directory, so a
watcher thread launches it the moment the base process exits. Each test
still owns its assertions — this module only moves WHEN the subprocess
runs, never what it checks. If the launcher was never started (e.g. a
single-module `pytest tests/test_submit_job.py -k merge` run after a
collection that skipped it), tests fall back to launching synchronously.
"""

from __future__ import annotations

import os
import subprocess
import tempfile
import threading
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = Path("/opt/spark/bin/spark-submit")

_STATE: dict = {}


def _build_zip(root: Path) -> Path:
    zpath = root / "delm_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in (REPO / "delm_spark").rglob("*.py"):
            z.write(p, p.relative_to(REPO))
    return zpath


def submit_argv(zpath: Path, script: str, args: list[str]) -> list[str]:
    return [
        str(SPARK_SUBMIT),
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--py-files", str(zpath),
        str(REPO / script),
    ] + args


def _popen(argv: list[str], logfile: Path) -> subprocess.Popen:
    env = dict(os.environ, PYTHONPATH="")  # the zip must be self-sufficient
    f = open(logfile, "w")
    return subprocess.Popen(
        argv, stdout=f, stderr=subprocess.STDOUT, text=True, env=env
    )


def start(needed: set[str] | None = None):
    """Idempotently launch the needed submits now ('job' chains the
    in-place merge behind the base's completion; 'curation' is
    independent)."""
    needed = needed or {"job", "curation"}
    if _STATE or not SPARK_SUBMIT.exists():
        return
    root = Path(tempfile.mkdtemp(prefix="delm_submit_bg_"))
    zpath = _build_zip(root)
    _STATE.update(root=root, zip=zpath)
    if "curation" in needed:
        cur_out = root / "curated"
        _STATE.update(
            cur_out=cur_out,
            curation=_popen(
                submit_argv(
                    zpath, "submit_curation.py",
                    [
                        "--transcripts",
                        str(REPO / "tests/fixtures/transcripts.parquet"),
                        "--output", str(cur_out),
                        "--budget", "400",
                    ],
                ),
                root / "curation.log",
            ),
        )
    if "job" not in needed:
        return
    out = root / "kg_out"
    base = _popen(
        submit_argv(
            zpath, "submit_job.py",
            [
                "--transcripts", str(REPO / "tests/fixtures/transcripts.parquet"),
                "--dictionary", str(REPO / "tests/fixtures/dictionary.parquet"),
                "--output", str(out),
                "--analytics", "--pagerank-iters", "3",
                "--walks-length", "4", "--quality",
            ],
        ),
        root / "base.log",
    )
    _STATE.update(
        out=out, base=base, merge=None, merge_ready=threading.Event()
    )

    def _chain_merge():
        base.wait()
        if base.returncode == 0:
            # in-place: output == merge-into (the ADVICE-r4 workflow)
            _STATE["merge"] = _popen(
                submit_argv(
                    zpath, "submit_job.py",
                    [
                        "--transcripts",
                        str(REPO / "tests/fixtures/transcripts.parquet"),
                        "--dictionary",
                        str(REPO / "tests/fixtures/dictionary.parquet"),
                        "--output", str(out),
                        "--merge-into", str(out),
                    ],
                ),
                _STATE["root"] / "merge.log",
            )
        _STATE["merge_ready"].set()

    threading.Thread(target=_chain_merge, daemon=True).start()


def wait(name: str, timeout: int = 420):
    """Join a background submit and return (stats_dict, output_dir).
    Returns None if the launcher never started — callers fall back to a
    synchronous subprocess."""
    if not _STATE:
        return None
    if name == "merge":
        if "merge_ready" not in _STATE:
            return None
        _STATE["merge_ready"].wait(timeout)
        proc = _STATE.get("merge")
        if proc is None:  # base failed; let the base test report it
            return None
        log = _STATE["root"] / "merge.log"
        outdir = _STATE["out"]
    elif name == "base":
        proc = _STATE.get("base")
        if proc is None:
            return None
        log, outdir = _STATE["root"] / "base.log", _STATE["out"]
    elif name == "curation":
        proc = _STATE.get("curation")
        if proc is None:
            return None
        log, outdir = _STATE["root"] / "curation.log", _STATE["cur_out"]
    else:
        raise KeyError(name)
    proc.wait(timeout)
    text = log.read_text()
    assert proc.returncode == 0, text[-3000:]
    import json

    line = [l for l in text.splitlines() if l.startswith("{")][-1]
    return json.loads(line), outdir


def shutdown():
    for key in ("base", "curation", "merge"):
        proc = _STATE.get(key)
        if proc is not None and proc.poll() is None:
            proc.kill()
