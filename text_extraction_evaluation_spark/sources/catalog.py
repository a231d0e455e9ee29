"""Local table catalog with atomic manifest commits — the Iceberg seam.

BASELINE.json:14 requires resumable runs over an Iceberg table with
per-partition lineage. No Iceberg runtime jar exists in this sandbox
(SURVEY.md Appendix C), so the catalog abstracts the two properties the
pipeline actually relies on and implements them on plain parquet dirs:

1. **atomic append commits**: a chunk directory becomes visible only
   when the JSON manifest is atomically replaced (tmp + os.replace) —
   readers never see partial writes, re-running a failed chunk is
   idempotent (same chunk_id -> skip);
2. **snapshot reads**: ``read()`` loads exactly the committed chunk
   paths from the manifest, never a directory listing.

Swapping in Iceberg later = replacing this class with
``df.writeTo(table).append()`` + snapshot reads; call sites are
unchanged (plans/jobs.py).
"""

from __future__ import annotations

import json
import os
import threading
import time
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class LocalCatalog:
    def __init__(self, root: str | os.PathLike) -> None:
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        # serializes the manifest read-modify-write for concurrent chunk
        # commits from one driver (plans/jobs.py thread pool). Scope is
        # per-process by design: Iceberg's optimistic-concurrency commit
        # replaces this when multiple drivers share a table.
        self._commit_lock = threading.Lock()

    # -- manifest ------------------------------------------------------------
    def _manifest_path(self, table: str) -> Path:
        return self.root / table / "_manifest.json"

    def _load_manifest(self, table: str) -> dict[str, Any]:
        p = self._manifest_path(table)
        if not p.exists():
            return {"table": table, "chunks": {}}
        with open(p) as f:
            return json.load(f)

    def _store_manifest(self, table: str, manifest: dict[str, Any]) -> None:
        p = self._manifest_path(table)
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.with_suffix(".json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, p)  # atomic on POSIX

    # -- public API ----------------------------------------------------------
    def committed_chunks(self, table: str) -> dict[str, dict[str, Any]]:
        return self._load_manifest(table)["chunks"]

    def is_committed(self, table: str, chunk_id: str) -> bool:
        return chunk_id in self.committed_chunks(table)

    def chunk_path(self, table: str, chunk_id: str) -> str:
        return str(self.root / table / f"chunk={chunk_id}")

    def commit_append(
        self,
        df: DataFrame,
        table: str,
        chunk_id: str,
        meta: dict[str, Any] | None = None,
    ) -> bool:
        """Write ``df`` as one chunk and commit it. Returns False if the
        chunk was already committed (idempotent re-run).

        The parquet write goes to a caller-unique staging directory and
        is RENAMED to the committed path inside the manifest lock: two
        concurrent callers with the same chunk_id would otherwise race
        on the final directory, and the manifest winner could end up
        holding the loser's half-written files (ADVICE r2). The rename
        is a same-filesystem directory move, so the committed path
        appears atomically; the losing staging dir is discarded."""
        import shutil
        import uuid

        if self.is_committed(table, chunk_id):
            return False
        path = self.chunk_path(table, chunk_id)
        staging = f"{path}.staging-{uuid.uuid4().hex}"
        try:
            df.write.mode("overwrite").parquet(staging)
            committed = self._publish(table, chunk_id, path, staging, meta)
        finally:
            # a failed attempt (write error, publish error) must not
            # leak its uniquely-named staging dir; hard process kills
            # can still orphan one — vacuum() reclaims those
            shutil.rmtree(staging, ignore_errors=True)
        return committed

    def _publish(
        self,
        table: str,
        chunk_id: str,
        path: str,
        staging: str,
        meta: dict[str, Any] | None,
    ) -> bool:
        import shutil

        with self._commit_lock:
            manifest = self._load_manifest(table)
            if chunk_id in manifest["chunks"]:
                return False
            # a previous FAILED attempt may have left partial files at
            # the final path; they were never committed, so clobbering
            # is safe
            shutil.rmtree(path, ignore_errors=True)
            os.replace(staging, path)
            # monotonic commit sequence: wall-clock alone cannot order
            # two commits inside one clock tick (concurrent chunks) or
            # across a clock step — time travel sorts on seq
            seq = 1 + max(
                (c.get("seq", 0) for c in manifest["chunks"].values()), default=0
            )
            manifest["chunks"][chunk_id] = {
                "path": path,
                "seq": seq,
                "committed_at_unix": time.time(),
                **(meta or {}),
            }
            self._store_manifest(table, manifest)
        return True

    def vacuum(self, table: str) -> list[str]:
        """Remove orphaned ``chunk=*.staging-*`` directories left by
        hard-killed commit attempts (the LocalCatalog analogue of
        Iceberg's remove_orphan_files). Committed data is never touched
        — staging dirs are by construction unreferenced by the
        manifest. Run only while no writer is active on ``table``: a
        concurrent in-flight commit's staging dir is indistinguishable
        from an orphan. Returns the removed paths."""
        import shutil

        tdir = self.root / table
        removed: list[str] = []
        if not tdir.is_dir():
            return removed
        with self._commit_lock:
            for p in sorted(tdir.glob("chunk=*.staging-*")):
                shutil.rmtree(p, ignore_errors=True)
                removed.append(str(p))
        return removed

    def read(
        self, spark: SparkSession, table: str, as_of: int | None = None
    ) -> DataFrame | None:
        """Snapshot read of committed chunks (None if no commits).

        ``as_of=k`` reads the table AS OF its k-th commit (time travel
        on commit order — the LocalCatalog analogue of Iceberg's
        ``VERSION AS OF``): only the first k chunks by commit timestamp
        are visible, exactly what a reader at that point saw, because
        the manifest is replaced atomically per commit."""
        chunks = self.committed_chunks(table)
        if not chunks:
            return None
        ordered = sorted(
            chunks.values(),
            key=lambda c: (c.get("seq", 0), c["committed_at_unix"]),
        )
        if as_of is not None:
            ordered = ordered[: max(0, as_of)]
            if not ordered:
                return None
        return spark.read.parquet(*[c["path"] for c in ordered])

    def read_diff(
        self, spark: SparkSession, table: str, from_version: int, to_version: int
    ) -> DataFrame | None:
        """Incremental snapshot diff: the rows ADDED between commit
        ``from_version`` (exclusive) and ``to_version`` (inclusive) —
        the LocalCatalog analogue of Iceberg's incremental append scan
        (``start-snapshot-id``/``end-snapshot-id``). Because chunks are
        append-only and immutable once committed, the diff is exactly
        the chunk files in that commit-order window — no row-level
        comparison, no read of the earlier snapshot. This is the
        change-data feed a downstream consumer (index refresh,
        incremental dedup, mix rebuild) tails instead of re-reading
        the table. Returns None if the window holds no chunks."""
        if to_version <= from_version:
            return None
        chunks = self.committed_chunks(table)
        ordered = sorted(
            chunks.values(),
            key=lambda c: (c.get("seq", 0), c["committed_at_unix"]),
        )
        window = ordered[max(0, from_version): max(0, to_version)]
        if not window:
            return None
        return spark.read.parquet(*[c["path"] for c in window])

    def drop(self, table: str) -> None:
        import shutil

        shutil.rmtree(self.root / table, ignore_errors=True)
