"""Sqlite semantic-cache backend (reference SQLiteWALCache,
utils/semantic_cache.py:214-366).

Driver-side WAL sqlite store for single-node / moderate-cardinality runs
— the run-partitioned parquet table (extract.py) stays the cluster-scale
path. A semantic cache stores one row per DISTINCT prompt key by
definition, so the driver round-trip is bounded by prompt cardinality,
not corpus size; rows cross the driver once per run (the pre-run
snapshot out, this run's misses back in).

Schema mirrors what the parquet table stores per key: the cleaned JSON,
the error payload (null = success), and the token counts the cost
tracker needs. WAL journal mode and the `synchronous` pragma follow the
reference; `prune` deletes oldest-first until the payload size fits
`max_size_mb` (reference prune(), semantic_cache.py:331-352).
"""

from __future__ import annotations

import sqlite3
from pathlib import Path
from typing import Optional

_CREATE_SQL = """
CREATE TABLE IF NOT EXISTS cache (
    k          TEXT PRIMARY KEY,
    json       TEXT,
    errors     TEXT,
    in_tokens  INTEGER,
    out_tokens INTEGER,
    part_id    INTEGER,
    ts         INTEGER DEFAULT (strftime('%s','now'))
);
"""


class SqliteSemanticCache:
    def __init__(
        self,
        path: str,
        synchronous: str = "NORMAL",
        max_size_mb: Optional[int] = None,
    ):
        self.path = Path(path).expanduser()
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.synchronous = (synchronous or "NORMAL").upper()
        self.max_size_mb = max_size_mb
        with self._connect() as db:
            db.execute(_CREATE_SQL)

    def _connect(self) -> sqlite3.Connection:
        db = sqlite3.connect(str(self.path), timeout=120)
        db.execute("PRAGMA journal_mode=WAL;")
        db.execute(f"PRAGMA synchronous={self.synchronous};")
        return db

    def snapshot(self):
        """All rows as a pandas frame (key, json, errors, in_tokens,
        out_tokens) — Arrow-friendly input for createDataFrame."""
        import pandas as pd

        with self._connect() as db:
            rows = db.execute(
                "SELECT k, json, errors, in_tokens, out_tokens, part_id "
                "FROM cache ORDER BY k"
            ).fetchall()
        return pd.DataFrame(
            rows,
            columns=["k", "json", "errors", "in_tokens", "out_tokens", "part_id"],
        )

    def upsert(self, rows) -> int:
        """Store this run's outcomes: (k, json, errors, in_tokens,
        out_tokens, part_id) tuples. A key's row is replaced — correct
        because only MISSES are extracted (successes never re-run), so a
        replace either fills a new key or overwrites a stale error row
        with this run's retry outcome (the parquet path's error-retry
        semantics)."""
        rows = list(rows)
        if rows:
            with self._connect() as db:
                db.executemany(
                    "INSERT OR REPLACE INTO cache "
                    "(k, json, errors, in_tokens, out_tokens, part_id) "
                    "VALUES (?, ?, ?, ?, ?, ?)",
                    rows,
                )
        # NOTE: no auto-prune here — the caller must snapshot() the table
        # (capturing this run's values in memory) BEFORE maybe_prune(),
        # or size-cap eviction could delete rows the in-flight run still
        # needs (its cache hits exist only in the table).
        return len(rows)

    def maybe_prune(self) -> None:
        """Apply the configured max_size_mb cap, if any. Call AFTER the
        run's snapshot has been taken."""
        if self.max_size_mb is not None:
            self.prune(self.max_size_mb * 1024 * 1024)

    #: per-row payload size expression (shared by stats and prune)
    _ROW_BYTES = "LENGTH(IFNULL(json,'')) + LENGTH(IFNULL(errors,''))"

    def payload_bytes(self) -> int:
        with self._connect() as db:
            return db.execute(
                f"SELECT IFNULL(SUM({self._ROW_BYTES}), 0) FROM cache"
            ).fetchone()[0]

    def prune(self, max_size_bytes: int) -> None:
        """Oldest-first eviction until payload size fits (reference
        semantic_cache.py:331-352 semantics) — ONE pass: a running total
        over newest-first rows keeps every row while the cumulative
        payload fits and deletes the rest (the 10-rows-then-rescan loop
        was O(deleted * table_size))."""
        with self._connect() as db:
            db.execute(
                f"""DELETE FROM cache WHERE k IN (
                    SELECT k FROM (
                        SELECT k, SUM({self._ROW_BYTES}) OVER (
                            ORDER BY ts DESC, k DESC
                            ROWS UNBOUNDED PRECEDING) AS cum
                        FROM cache)
                    WHERE cum > ?)""",
                (max_size_bytes,),
            )

    def stats(self) -> dict:
        with self._connect() as db:
            n = db.execute("SELECT COUNT(*) FROM cache").fetchone()[0]
        return {
            "backend": "sqlite",
            "entries": n,
            "bytes": self.payload_bytes(),
            "file": str(self.path),
        }
