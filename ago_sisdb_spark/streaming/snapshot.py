"""Committed-snapshot store: reads racing a streaming writer see only
whole micro-batch boundaries (the T5/T8 isolation contract).

Reference semantics: the reference is a multi-client server — subscribers
and getters race the write path, and a reader never observes a partially
applied write (`workers/sisdb/sisdb.h:36-42` positions records per write
call; readers see the table before or after a call, never mid-call).

Spark re-expression: the production target is a table format with a
commit log (Delta/Iceberg — no jar in this container, documented in
streaming/write.py).  The same isolation contract is implemented here the
way those formats implement it: every ``commit`` writes a NEW immutable
versioned directory, then atomically publishes a manifest pointer
(``os.replace`` — atomic on POSIX) naming it.  Readers resolve the
manifest and read only the directory it names, so a read always sees
exactly one committed version — never a mix of two, never a half-written
directory.  The foreachBatch upsert loop (streaming/write.upsert) commits
once per micro-batch, which makes micro-batch boundaries the only states
a reader can observe.

At 100 TB: the snapshot directories are parquet tables (partitioned by
the caller's layout); the manifest is O(bytes).  ``prune`` keeps a
bounded trail of superseded versions — retention must exceed the longest
running read (the standard lakehouse vacuum contract; readers hold file
handles, and POSIX keeps data alive for already-open handles even after
unlink, so in-flight local reads never break).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_current.json"


class SnapshotStore:
    """Versioned parquet snapshots under ``root`` with an atomic
    manifest pointer; see module docstring for the isolation contract."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _manifest_path(self) -> str:
        return os.path.join(self.root, _MANIFEST)

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.root, f"v{version:012d}")

    def current_version(self) -> int | None:
        """The last committed version, or None before the first commit."""
        try:
            with open(self._manifest_path()) as f:
                return int(json.load(f)["version"])
        except FileNotFoundError:
            return None

    def commit(self, df: DataFrame, version: int) -> None:
        """Write ``df`` as the new snapshot and atomically publish it.

        The data write targets a directory no manifest names yet, so a
        concurrent reader cannot see it; the publish is one
        ``os.replace`` of the manifest file — a reader sees either the
        previous pointer or the new one, never a torn manifest and never
        a partially-written table.  Versions must be strictly
        increasing (the foreachBatch ``batch_id`` is the natural
        choice); committing a version at or below the current one raises
        instead of silently rewinding readers."""
        cur = self.current_version()
        if cur is not None and version <= cur:
            raise ValueError(
                f"snapshot version must increase: current={cur}, "
                f"got {version}"
            )
        path = self._version_dir(version)
        df.write.mode("overwrite").parquet(path)
        tmp = self._manifest_path() + f".tmp.{version}"
        with open(tmp, "w") as f:
            json.dump({"version": version, "path": path}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path())

    def read(self, spark: SparkSession) -> DataFrame | None:
        """The last committed snapshot as a DataFrame (None before the
        first commit).  The named directory is immutable once published,
        so the returned frame is a consistent micro-batch boundary no
        matter how many commits land while it is being consumed."""
        try:
            with open(self._manifest_path()) as f:
                manifest = json.load(f)
        except FileNotFoundError:
            return None
        return spark.read.parquet(manifest["path"])

    def prune(self, keep_last: int = 2) -> list[int]:
        """Drop superseded snapshot directories, keeping the current one
        plus ``keep_last`` predecessors.  Returns the pruned versions.
        Retention must exceed the longest running read (module
        docstring); the current version is never pruned."""
        cur = self.current_version()
        if cur is None:
            return []
        versions = sorted(
            int(d[1:])
            for d in os.listdir(self.root)
            if d.startswith("v") and d[1:].isdigit()
        )
        keep = set(v for v in versions if v >= cur)
        for v in sorted((v for v in versions if v < cur), reverse=True)[
            :keep_last
        ]:
            keep.add(v)
        pruned = []
        for v in versions:
            if v not in keep:
                shutil.rmtree(self._version_dir(v), ignore_errors=True)
                pruned.append(v)
        return pruned
