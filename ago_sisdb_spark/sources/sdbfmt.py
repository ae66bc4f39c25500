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
import re
import struct
import uuid
from dataclasses import dataclass, field

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
    and tests.

    The format is KEY-ADDRESSED: when the file name encodes a symbol
    (``<symbol>[.part*].sdb``), every row must carry that symbol — the
    same contract as a Hive partition directory, and what makes reader-
    side file pruning sound. Mismatched rows raise instead of silently
    producing a file whose name lies about its contents."""
    key = _file_symbol(path)
    n = 0
    with open(path, "wb") as f:
        f.write(MAGIC)
        for symbol, ts_us, o, h, lo, c, v in rows:
            if key is not None and symbol != key:
                raise ValueError(
                    f"{path}: row symbol {symbol!r} does not match the "
                    f"file-name key {key!r} (key-addressed format)"
                )
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


_PART_SUFFIX = re.compile(r"\.part[^.]*$")


def _file_symbol(path: str) -> str | None:
    """Symbol encoded in the file name (``<symbol>[.part*].sdb``), the
    pruning key; None when the name doesn't follow the convention. Only
    the TRAILING ``.part*`` segment is stripped, so dotted symbols
    (``BRK.A.part0.sdb`` → ``BRK.A``) survive. Pruning is an
    optimization on top of the key-addressed write contract; the reader
    additionally re-applies consumed symbol filters row-level, so a
    name that lies about its contents can never return WRONG rows."""
    base = os.path.basename(path)
    if not base.endswith(".sdb"):
        return None
    stem = _PART_SUFFIX.sub("", base[: -len(".sdb")])
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
        """Accept symbol-equality filters; everything else goes back to
        Spark for post-scan evaluation. Consumed filters are enforced
        TWICE: whole-file pruning in partitions() (the fast path) and a
        row-level check in read() (the correctness path) — Spark will
        not re-evaluate a consumed filter, so the reader must. Multiple
        accepted filters AND together, i.e. the symbol sets intersect."""
        for f in filters:
            s: set[str] | None = None
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("symbol",)
                and isinstance(f.value, str)
            ):
                s = {f.value}
            elif (
                isinstance(f, In)
                and f.attribute == ("symbol",)
                and all(isinstance(v, str) for v in f.value)
            ):
                s = set(f.value)
            if s is None:
                yield f  # unsupported → Spark keeps it
            else:
                self._symbols = s if self._symbols is None else self._symbols & s

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
        # pyspark 4.1 substitutes [None] when partitions() returns [] —
        # a fully-pruned scan must yield zero rows, not crash
        if partition is None:
            return
        for rec in read_sdb_file(partition.path):
            # row-level enforcement of the consumed symbol filters (file
            # pruning alone is not sufficient: unnamed/mixed files)
            if self._symbols is not None and rec[0] not in self._symbols:
                continue
            yield rec


@dataclass
class _SdbCommit(WriterCommitMessage):
    # tmp-name → final-name pairs this task staged (renamed at commit)
    staged: list = field(default_factory=list)


class SdbBarWriter(DataSourceWriter):
    """Job-transactional writer: tasks stage ``*.sdb.tmp-<token>`` files
    (invisible to readers and the stream source, which list ``*.sdb``
    only); the driver-side commit() renames them into place — and, in
    overwrite mode, first clears every pre-existing ``*.sdb`` so
    ``mode("overwrite")`` cannot leave stale files behind. abort()
    removes the staged tmps. The per-job token also keeps final names
    unique across append jobs (two appends with the same task pid no
    longer clobber each other)."""

    def __init__(self, options, overwrite: bool):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("sdb_bars: path option required")
        self._overwrite = overwrite
        self._token = uuid.uuid4().hex[:8]

    def write(self, iterator):
        """One task → one ``<symbol>.part{pid}-{token}.sdb`` file per
        symbol seen in the task's rows (rows pre-partitioned by symbol
        upstream give the clean one-file-per-symbol layout; mixed tasks
        still produce prunable per-symbol files)."""
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self._dir, exist_ok=True)
        by_symbol: dict[str, list] = {}
        for row in iterator:
            by_symbol.setdefault(row[0], []).append(tuple(row))
        staged = []
        for sym, rows in by_symbol.items():
            final = f"{sym}.part{pid}-{self._token}.sdb"
            tmp = f"{final}.tmp-{self._token}"
            write_sdb_file(os.path.join(self._dir, tmp), rows)
            staged.append((tmp, final))
        return _SdbCommit(staged=staged)

    def commit(self, messages):
        if self._overwrite:
            for name in os.listdir(self._dir):
                if name.endswith(".sdb"):
                    os.remove(os.path.join(self._dir, name))
        for m in messages:
            for tmp, final in m.staged:
                os.replace(
                    os.path.join(self._dir, tmp),
                    os.path.join(self._dir, final),
                )

    def abort(self, messages):
        for m in messages:
            for tmp, _final in getattr(m, "staged", []) or []:
                try:
                    os.remove(os.path.join(self._dir, tmp))
                except FileNotFoundError:
                    pass


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
        # iter() over a MATERIALIZED list: the prefetcher pickles the
        # rows alongside the offset (a generator can't pickle; a
        # list_iterator can), and on a no-advance poll (end == start,
        # e.g. a watermark-flush run with no new files) pyspark calls
        # next() on the result expecting StopIteration — a bare list
        # raises TypeError there and kills the query
        rows = [
            rec
            for n in new
            for rec in read_sdb_file(os.path.join(self._dir, n))
        ]
        return iter(rows), {"files": sorted(set(now) | seen)}

    def readBetweenOffsets(self, start: dict, end: dict):
        replay = sorted(set(end["files"]) - set(start["files"]))
        for n in replay:
            yield from read_sdb_file(os.path.join(self._dir, n))
