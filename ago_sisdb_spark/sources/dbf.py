"""DBF (dBase) source/sink — market-data interchange format (S7).

Reference: `src/core/sis_dbf.h:55-72` reads/writes DBF files for exchange
feeds.  No Spark/pandas built-in exists, so this is a minimal pure-Python
codec for dBase III/IV-style files (header + fixed-width ASCII records —
the subset the reference emits: C/N/F/D field types, no memo files).

Distribution model: DBF files are small interchange artifacts (feed drops),
so parse happens per-file inside ``spark.read.format("binaryFile")`` +
``mapInPandas`` — each file decoded on an executor, never on the driver —
then lands in parquet.  ``read_dbf`` is the single-file convenience form.
"""

from __future__ import annotations

import io
import struct
from datetime import date, datetime

from pyspark.sql import DataFrame, SparkSession

_FIELD_DESC = struct.Struct("<11sc4xBB14x")


def _parse_header(buf: bytes):
    n_records = struct.unpack("<I", buf[4:8])[0]
    header_len, record_len = struct.unpack("<HH", buf[8:12])
    fields = []
    pos = 32
    while pos < header_len - 1 and buf[pos] != 0x0D:
        name_b, ftype, flen, fdec = _FIELD_DESC.unpack(buf[pos : pos + 32])
        name = name_b.split(b"\x00")[0].decode("ascii", "replace")
        fields.append((name, ftype.decode("ascii"), flen, fdec))
        pos += 32
    return n_records, header_len, record_len, fields


def _coerce(raw: bytes, ftype: str, fdec: int):
    s = raw.decode("ascii", "replace").strip()
    if not s:
        return None
    if ftype == "N":
        return float(s) if fdec else int(s)
    if ftype == "F":
        return float(s)
    if ftype == "D":
        return date(int(s[0:4]), int(s[4:6]), int(s[6:8])) if len(s) == 8 else None
    if ftype == "L":
        return s.upper() in ("T", "Y")
    return s


def parse_dbf_bytes(buf: bytes) -> tuple[list[str], list[list]]:
    """Decode a DBF byte buffer → (column names, rows)."""
    n_records, header_len, record_len, fields = _parse_header(buf)
    names = [f[0] for f in fields]
    rows = []
    pos = header_len
    for _ in range(n_records):
        rec = buf[pos : pos + record_len]
        pos += record_len
        if not rec or rec[0:1] == b"*":  # deletion flag
            continue
        off = 1
        row = []
        for _, ftype, flen, fdec in fields:
            row.append(_coerce(rec[off : off + flen], ftype, fdec))
            off += flen
        rows.append(row)
    return names, rows


def read_dbf(spark: SparkSession, path: str) -> DataFrame:
    """Single DBF file → DataFrame (schema from the DBF field table)."""
    with open(path, "rb") as f:
        names, rows = parse_dbf_bytes(f.read())
    return spark.createDataFrame(rows, names)


def read_dbf_dir(spark: SparkSession, glob_path: str) -> DataFrame:
    """Directory of same-schema DBF files, decoded on executors.

    binaryFile source ships each file's bytes to an executor; mapInPandas
    decodes there — the driver never touches file contents.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(glob_path)

    # derive schema from the first file (driver reads one header only)
    first = files.select("path").first()
    if first is None:
        raise FileNotFoundError(glob_path)
    local = first[0].replace("file:", "")
    with open(local, "rb") as f:
        names, _ = parse_dbf_bytes(f.read(4096) + f.read())

    def decode(batches):
        for pdf in batches:
            out = []
            for buf in pdf["content"]:
                cols, rows = parse_dbf_bytes(bytes(buf))
                out.append(pd.DataFrame(rows, columns=cols))
            yield pd.concat(out) if out else pd.DataFrame(columns=names)

    sample = read_dbf(spark, local)
    return files.select("content").mapInPandas(decode, sample.schema)


def _field_specs(df: DataFrame) -> list[tuple[str, str, int, int]]:
    """Derive the DBF field table from the schema.  C-column widths come
    from ONE aggregate job (max string length per column) — never a
    driver-side scan of the data."""
    from pyspark.sql import functions as F

    text_cols = [
        f.name
        for f in df.schema.fields
        if f.dataType.simpleString()
        not in ("int", "bigint", "smallint", "tinyint", "double", "float", "date", "boolean")
        and not f.dataType.simpleString().startswith("decimal")
    ]
    widths: dict[str, int] = {}
    if text_cols:
        row = df.agg(
            *[F.max(F.length(F.col(c).cast("string"))).alias(c) for c in text_cols]
        ).collect()[0]
        widths = {c: row[c] or 1 for c in text_cols}
    fields = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t in ("int", "bigint", "smallint", "tinyint"):
            fields.append((f.name[:10], "N", 18, 0))
        elif t in ("double", "float") or t.startswith("decimal"):
            fields.append((f.name[:10], "N", 18, 6))
        elif t == "date":
            fields.append((f.name[:10], "D", 8, 0))
        elif t == "boolean":
            fields.append((f.name[:10], "L", 1, 0))
        else:
            fields.append((f.name[:10], "C", min(max(widths.get(f.name, 1), 1), 254), 0))
    return fields


def _record_encoder(fields, colnames):
    """Per-Arrow-batch record encoder (runs on executors via mapInPandas):
    each batch → one (chunk bytes, n rows) row."""
    import pandas as pd

    def encode(batches):
        for pdf in batches:
            out = io.BytesIO()
            n = 0
            for row in pdf[colnames].itertuples(index=False):
                out.write(b" ")
                for (name, ftype, flen, fdec), v in zip(fields, row):
                    # scalar-safe null test: pd.isna on an array/list cell
                    # returns elementwise and would make `if` ambiguous
                    # (pd.api.types.is_scalar covers NaT/NA where
                    # np.isscalar does not)
                    if v is None or (pd.api.types.is_scalar(v) and pd.isna(v)):
                        s = ""
                    elif ftype == "D":
                        s = v.strftime("%Y%m%d")
                    elif ftype == "N" and fdec:
                        s = f"{float(v):.{fdec}f}"
                    elif ftype == "N":
                        s = str(int(v))
                    elif ftype == "L":
                        s = "T" if v else "F"
                    else:
                        s = str(v)
                    enc = s.encode("ascii", "replace")[:flen]
                    pad = b" " * (flen - len(enc))
                    out.write(pad + enc if ftype in ("N", "F") else enc + pad)
                n += 1
            yield pd.DataFrame({"chunk": [out.getvalue()], "n": [n]})

    return encode


def write_dbf(df: DataFrame, path: str) -> None:
    """DataFrame → single DBF file with executor-side encoding.

    Records are encoded to fixed-width bytes per Arrow batch ON EXECUTORS
    (mapInPandas); the driver only streams the encoded chunks to the output
    file via ``toLocalIterator`` — one partition in memory at a time, never
    the full row set — then patches the record count into the header.
    (DBF is a single-file interchange format, so the final byte stream must
    pass through one writer; the bound is driver *memory*, not file size.)
    """
    fields = _field_specs(df)
    colnames = [f.name for f in df.schema.fields]
    record_len = 1 + sum(fl for _, _, fl, _ in fields)
    header_len = 32 + 32 * len(fields) + 1
    now = datetime.now()

    chunks = df.mapInPandas(_record_encoder(fields, colnames), "chunk binary, n long")
    total = 0
    with open(path, "wb") as f:
        f.write(
            struct.pack(
                "<BBBBIHH20x",
                0x03, now.year % 100, now.month, now.day,
                0,  # record count patched below
                header_len, record_len,
            )
        )
        for name, ftype, flen, fdec in fields:
            f.write(
                _FIELD_DESC.pack(name.encode("ascii")[:11], ftype.encode(), flen, fdec)
            )
        f.write(b"\x0d")
        for row in chunks.toLocalIterator():
            f.write(bytes(row["chunk"]))
            total += row["n"]
        f.write(b"\x1a")
        f.seek(4)
        f.write(struct.pack("<I", total))
