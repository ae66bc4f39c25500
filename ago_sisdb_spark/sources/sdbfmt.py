"""Spark 4 Python DataSource for an .sdb-inspired binary bar format (S13).

The reference stores symbol-keyed OHLCV bars in its own block format,
addressed as ``key.sdb`` and pruned by key + time at the block index
(`src/core/disk/sis_disk.io.h:44-54,173-180`, `workers/sisdb/sisdb_fmap.h`).
This module re-expresses that capability Spark-first on the PUBLIC
Spark 4 Python DataSource API (`pyspark.sql.datasource`): a user-defined
``spark.read.format("sdb_bars")`` / ``df.write.format("sdb_bars")``
source whose

- **file layout is key-partitioned** — one ``<symbol>.sdb`` file per
  symbol per writer task, so the reader plans one InputPartition per
  file and 1000 executors read 1000 files independently;
- **filter pushdown prunes whole files** — ``pushFilters`` accepts
  ``symbol = 'X'`` / ``symbol IN (...)`` equality filters and drops
  non-matching files BEFORE partition planning (the reference's
  key-dict lookup, re-expressed as source-level partition pruning);
  every other predicate is returned to Spark unchanged;
- **record layout is a fixed little-endian struct** per bar:
  ``<H symbol_len><symbol utf8><q ts_us><d open><d high><d low>
  <d close><q volume>`` behind a 4-byte ``SDB1`` magic — a
  deterministic stand-in for the reference's delta-compressed blocks
  (swap the per-file codec; the Spark-side contract is unchanged).

This is interchange-format plumbing like the DBF codec (sources/dbf.py):
big analytic tables belong in parquet; the DataSource exists so a user
of the reference can lift native key-addressed files straight into a
DataFrame with pushdown, not to replace columnar storage.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MAGIC = b"SDB1"
SCHEMA_DDL = (
    "symbol string, ts_us bigint, open double, high double, "
    "low double, close double, volume bigint"
)
_REC_TAIL = struct.Struct("<qddddq")  # ts_us, o, h, l, c, volume


def write_sdb_file(path: str, rows) -> int:
    """Write one .sdb file from (symbol, ts_us, o, h, l, c, v) tuples.
    Pure-Python encoder shared by the DataSourceWriter (executor-side)
    and tests."""
    n = 0
    with open(path, "wb") as f:
        f.write(MAGIC)
        for symbol, ts_us, o, h, lo, c, v in rows:
            sb = symbol.encode("utf-8")
            f.write(struct.pack("<H", len(sb)))
            f.write(sb)
            f.write(_REC_TAIL.pack(ts_us, o, h, lo, c, v))
            n += 1
    return n


def read_sdb_file(path: str):
    """Yield (symbol, ts_us, open, high, low, close, volume) tuples."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != MAGIC:
        raise ValueError(f"{path}: bad magic {buf[:4]!r}")
    pos = 4
    while pos < len(buf):
        (slen,) = struct.unpack_from("<H", buf, pos)
        pos += 2
        symbol = buf[pos : pos + slen].decode("utf-8")
        pos += slen
        vals = _REC_TAIL.unpack_from(buf, pos)
        pos += _REC_TAIL.size
        yield (symbol, *vals)


def _file_symbol(path: str) -> str | None:
    """Symbol encoded in the file name (``<symbol>[.partN].sdb``), the
    pruning key; None when the name doesn't follow the convention (the
    file is then always read — pruning is an optimization, never a
    correctness dependence)."""
    base = os.path.basename(path)
    if not base.endswith(".sdb"):
        return None
    stem = base[: -len(".sdb")]
    if "." in stem:  # strip .partN
        stem = stem.split(".", 1)[0]
    return stem or None


@dataclass
class _SdbPartition(InputPartition):
    path: str


class SdbBarReader(DataSourceReader):
    def __init__(self, options):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("sdb_bars: path option required")
        self._symbols: set[str] | None = None  # None → no pruning filter

    def pushFilters(self, filters):
        """Accept symbol-equality filters (file-name pruning); everything
        else goes back to Spark for post-scan evaluation."""
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("symbol",)
                and isinstance(f.value, str)
            ):
                self._symbols = {f.value}
            elif (
                isinstance(f, In)
                and f.attribute == ("symbol",)
                and all(isinstance(v, str) for v in f.value)
            ):
                self._symbols = set(f.value)
            else:
                yield f  # unsupported → Spark keeps it

    def partitions(self):
        parts = []
        for name in sorted(os.listdir(self._dir)):
            if not name.endswith(".sdb"):
                continue
            path = os.path.join(self._dir, name)
            sym = _file_symbol(path)
            if self._symbols is not None and sym is not None and (
                sym not in self._symbols
            ):
                continue  # pruned whole file
            parts.append(_SdbPartition(path))
        return parts

    def read(self, partition):
        yield from read_sdb_file(partition.path)


@dataclass
class _SdbCommit(WriterCommitMessage):
    files: int


class SdbBarWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("sdb_bars: path option required")
        self._overwrite = overwrite

    def write(self, iterator):
        """One task → one ``<symbol>.partN.sdb`` file per symbol seen in
        the task's rows (rows pre-partitioned by symbol upstream give the
        clean one-file-per-symbol layout; mixed tasks still produce
        prunable per-symbol files)."""
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self._dir, exist_ok=True)
        by_symbol: dict[str, list] = {}
        for row in iterator:
            by_symbol.setdefault(row[0], []).append(tuple(row))
        for sym, rows in by_symbol.items():
            write_sdb_file(
                os.path.join(self._dir, f"{sym}.part{pid}.sdb"), rows
            )
        return _SdbCommit(files=len(by_symbol))


class SdbBarDataSource(DataSource):
    """``spark.dataSource.register(SdbBarDataSource)`` then
    ``spark.read.format("sdb_bars").load(dir)`` /
    ``df.write.format("sdb_bars").mode("append").save(dir)``."""

    @classmethod
    def name(cls) -> str:
        return "sdb_bars"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return SdbBarReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return SdbBarWriter(self.options, overwrite)

    def simpleStreamReader(self, schema: StructType):
        return SdbBarStreamReader(self.options)


def register(spark) -> None:
    # a pushFilters reader is refused outright when the flag is off, so
    # registration owns the config (dynamic SQLConf, safe at runtime)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SdbBarDataSource)


class SdbBarStreamReader(SimpleDataSourceStreamReader):
    """Streaming ingest of the key-addressed directory — the reference's
    live-feed shape (`sisdb_wsdb` convert service tails incoming key
    files) on the Spark 4 ``SimpleDataSourceStreamReader`` API.

    Offsets are the consumed FILE SET ({"files": sorted names}): .sdb
    files are immutable once written (the writer never appends to a
    committed file), so `read(start)` returns exactly the files that
    appeared since `start`, and `readBetweenOffsets` replays a committed
    range deterministically after restart — exactly-once per file.
    Directory-listing offsets suit feed-drop directories (thousands of
    files); for millions of files per batch use a manifest log instead."""

    def __init__(self, options):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("sdb_bars: path option required")

    def _list(self) -> list[str]:
        return sorted(
            n for n in os.listdir(self._dir) if n.endswith(".sdb")
        )

    def initialOffset(self) -> dict:
        return {"files": []}

    def read(self, start: dict):
        seen = set(start["files"])
        now = self._list()
        new = [n for n in now if n not in seen]
        # materialized list, not a generator: the prefetcher PICKLES the
        # returned rows alongside the offset
        rows = [
            rec
            for n in new
            for rec in read_sdb_file(os.path.join(self._dir, n))
        ]
        return rows, {"files": sorted(set(now) | seen)}

    def readBetweenOffsets(self, start: dict, end: dict):
        replay = sorted(set(end["files"]) - set(start["files"]))
        for n in replay:
            yield from read_sdb_file(os.path.join(self._dir, n))
