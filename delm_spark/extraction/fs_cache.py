"""Filesystem semantic-cache backend (reference FilesystemJSONCache,
utils/semantic_cache.py:130-213).

One file per key under ``<root>/<k[:2]>/<k[2:4]>/<key>.zst`` — the
reference's two-level fan-out layout, kept inspectable (each entry is a
canonical-JSON record) and dependency-free. Values compress with zstd
when the package is importable and fall back to raw bytes otherwise,
exactly as the reference degrades when ``zstd is None``; the ``.zst``
suffix is kept either way for layout parity. Pruning is oldest-first by
file mtime until the on-disk payload fits (reference prune(),
semantic_cache.py:193-213).

Same driver-side protocol as SqliteSemanticCache (snapshot / upsert /
maybe_prune / payload_bytes / prune / stats), so `extract_chunks`
accepts either through its ``driver_cache`` parameter: the pre-run
snapshot is bounded by distinct-prompt cardinality, this run's misses
come back once, and pruning runs only AFTER the snapshot that feeds the
returned plan.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional

try:  # mirror the reference's optional-zstd degrade
    import zstandard as _zstd
except ImportError:  # pragma: no cover - environment-dependent
    _zstd = None

_FIELDS = ("json", "errors", "in_tokens", "out_tokens", "part_id")


#: zstd frame magic — entries are sniffed on read so a cache written
#: with zstd available stays readable where it isn't (and vice versa)
_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


class FilesystemSemanticCache:
    def __init__(self, root: str, max_size_mb: Optional[int] = None):
        from delm_spark.constants import RUN_ID_COL

        self.root = Path(root).expanduser()
        self.root.mkdir(parents=True, exist_ok=True)
        # a parquet-table cache (the previous meaning of
        # backend='filesystem', and backend='parquet' today) in the same
        # directory would be silently ignored by the *.zst glob — fail
        # loudly instead of re-extracting everything beside it
        if any(self.root.glob(f"{RUN_ID_COL}=*")) or any(
            self.root.glob("*.parquet")
        ):
            raise ValueError(
                f"{self.root} holds a parquet semantic-cache table; "
                "backend='filesystem' now stores one file per key "
                "(reference FilesystemJSONCache layout). Keep "
                "backend='parquet' for this directory or point "
                "'filesystem' at a fresh one."
            )
        # a crash between write_bytes and os.replace leaves *.tmp orphans
        # that no glob counts — sweep them on open (single-writer contract,
        # same as the reference's cache)
        for t in self.root.rglob("*.tmp"):
            t.unlink(missing_ok=True)
        self.max_size_mb = max_size_mb
        self._zdecompress = None
        if _zstd is not None:  # pragma: no cover - environment-dependent
            self._compress = _zstd.ZstdCompressor(level=3).compress
            self._zdecompress = _zstd.ZstdDecompressor().decompress
        else:
            self._compress = lambda b: b

    def _decompress(self, b: bytes) -> bytes:
        if b[:4] == _ZSTD_MAGIC:
            if self._zdecompress is None:  # pragma: no cover - env-dependent
                raise RuntimeError(
                    "cache entry is zstd-compressed but the zstandard "
                    "package is not available in this environment"
                )
            return self._zdecompress(b)
        return b

    def _path(self, key: str) -> Path:
        # reference layout: <root>/<first2>/<next2>/<key>.zst
        return self.root / key[:2] / key[2:4] / f"{key}.zst"

    def _entries(self):
        return self.root.rglob("*.zst")

    # -- driver-cache protocol (see sqlite_cache.SqliteSemanticCache) ------

    def snapshot(self):
        """All rows as a pandas frame (k, json, errors, in_tokens,
        out_tokens, part_id) — Arrow-friendly input for createDataFrame,
        bounded by distinct-prompt cardinality."""
        import pandas as pd

        rows = []
        for p in sorted(self._entries()):
            rec = json.loads(self._decompress(p.read_bytes()))
            rows.append([p.stem] + [rec.get(f) for f in _FIELDS])
        return pd.DataFrame(rows, columns=["k"] + list(_FIELDS))

    def upsert(self, rows) -> int:
        """Store this run's outcomes; a key's file is replaced (error
        rows retry next run, successes never re-run — the sqlite/parquet
        semantics). No auto-prune here: the caller snapshots FIRST."""
        n = 0
        for k, js, errors, in_tok, out_tok, part_id in rows:
            rec = {
                "json": js,
                "errors": errors,
                "in_tokens": in_tok,
                "out_tokens": out_tok,
                "part_id": part_id,
            }
            p = self._path(k)
            p.parent.mkdir(parents=True, exist_ok=True)
            payload = self._compress(
                json.dumps(rec, sort_keys=True, separators=(",", ":")).encode()
            )
            # durable like the reference's set() contract: write to a
            # sibling temp file, then atomically swap — a crash mid-write
            # can never leave a truncated entry that poisons snapshot()
            tmp = p.with_name(p.name + ".tmp")
            tmp.write_bytes(payload)
            os.replace(tmp, p)
            n += 1
        return n

    def maybe_prune(self) -> None:
        """Apply the configured max_size_mb cap, if any. Call AFTER the
        run's snapshot has been taken."""
        if self.max_size_mb is not None:
            self.prune(self.max_size_mb * 1024 * 1024)

    def payload_bytes(self) -> int:
        return sum(p.stat().st_size for p in self._entries())

    def prune(self, max_size_bytes: int) -> None:
        """Oldest-first (file mtime, path tie-break) eviction until the
        on-disk payload fits (reference semantic_cache.py:193-213)."""
        files = sorted(self._entries(), key=lambda p: (p.stat().st_mtime, str(p)))
        size = sum(p.stat().st_size for p in files)
        for p in files:
            if size <= max_size_bytes:
                break
            size -= p.stat().st_size
            p.unlink(missing_ok=True)

    def stats(self) -> dict:
        files = list(self._entries())
        return {
            "backend": "filesystem",
            "entries": len(files),
            "bytes": sum(p.stat().st_size for p in files),
            "root": str(self.root),
        }
