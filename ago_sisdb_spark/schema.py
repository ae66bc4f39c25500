"""Dynamic schema registry + evolution (reference `sis_dynamic`, SURVEY §1.2-1.3).

The reference declares tables at runtime from JSON/conf field specs
``[style, len, count, dot, index-flags]`` (`bin/init-sisdb.conf:44-135`,
`src/core/sis_dynamic.h:96-127`) and generates field-by-field conversion
plans so old readers work against new schemas — by-name matching,
add/remove fields, widen/narrow types, never rename
(`sis_dynamic.h:12-51,132-144,568-575`).  Mismatched types convert to
0/empty (`sis_dynamic.h:110-116`).

Spark mapping (SURVEY §1.2 table):

| style | meaning           | Spark type                               |
|-------|-------------------|------------------------------------------|
| I     | signed int        | Byte/Short/Integer/Long by len 1/2/4/8   |
| U     | unsigned int      | next-wider signed (u64 → Long, documented overflow) |
| C     | fixed-width char  | String                                   |
| F     | float             | Float/Double by len 4/8                  |
| P     | scaled price      | Decimal(18,6), nullable (invalid → NULL) |
| W/T/S | µs/ms/s epoch     | Timestamp                                |
| M     | time_t/60 minutes | Timestamp                                |
| D     | yyyymmdd int      | Date                                     |
| Y     | year              | Integer                                  |

``count > 1`` ⇒ ArrayType(element, containsNull=False) — the repeated-field
form used for order-book levels (`init-sisdb.conf:183-186`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_STYLE_TYPES = {
    ("I", 1): T.ByteType(),
    ("I", 2): T.ShortType(),
    ("I", 4): T.IntegerType(),
    ("I", 8): T.LongType(),
    ("U", 1): T.ShortType(),
    ("U", 2): T.IntegerType(),
    ("U", 4): T.LongType(),
    ("U", 8): T.LongType(),  # documented overflow rule (SURVEY §1.2)
    ("F", 4): T.FloatType(),
    ("F", 8): T.DoubleType(),
}


@dataclass
class FieldSpec:
    """One reference field: [style, len, count, dot] + index flags
    (`sis_dynamic.h:96-116`)."""

    name: str
    style: str
    length: int = 4
    count: int = 1
    dot: int = 0
    mindex: bool = False  # main (time) index
    solely: bool = False  # unique-within-time

    def element_type(self) -> T.DataType:
        s = self.style.upper()
        if s == "C":
            return T.StringType()
        if s == "P":
            return T.DecimalType(18, 6)
        if s in ("W", "T", "S", "M"):
            return T.TimestampType()
        if s == "D":
            return T.DateType()
        if s == "Y":
            return T.IntegerType()
        key = (s, self.length)
        if key in _STYLE_TYPES:
            return _STYLE_TYPES[key]
        raise ValueError(f"unknown field style {self.style!r} len {self.length}")

    def spark_type(self) -> T.DataType:
        el = self.element_type()
        return T.ArrayType(el, containsNull=False) if self.count > 1 else el

    def nullable(self) -> bool:
        return self.style.upper() == "P"  # only P has an invalid marker


@dataclass
class TableSchema:
    """A named, versioned table schema (the reference's s_sis_dynamic_db)."""

    name: str
    fields: list[FieldSpec] = field(default_factory=list)
    version: int = 1

    def to_struct_type(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(f.name, f.spark_type(), f.nullable())
                for f in self.fields
            ]
        )

    def time_field(self) -> str | None:
        for f in self.fields:
            if f.mindex:
                return f.name
        return None

    def unique_fields(self) -> list[str]:
        return [f.name for f in self.fields if f.solely]


def parse_table_spec(name: str, spec: dict) -> TableSchema:
    """Reference conf form → TableSchema.

    ``{"fields": {"time": ["S", 8], "open": ["P", 4, 1, 2], ...},
       "index": {"time": "mindex", "code": "solely"}}``
    mirroring `bin/init-sisdb.conf:44-135` (create cmd `sisdb_io.c:8-21`).
    """
    idx = spec.get("index", {})
    fields = []
    for fname, arr in spec["fields"].items():
        style = arr[0]
        length = arr[1] if len(arr) > 1 else 4
        count = arr[2] if len(arr) > 2 else 1
        dot = arr[3] if len(arr) > 3 else 0
        fields.append(
            FieldSpec(
                fname,
                style,
                length,
                count,
                dot,
                mindex=idx.get(fname) == "mindex",
                solely=idx.get(fname) == "solely",
            )
        )
    return TableSchema(name, fields, version=spec.get("version", 1))


_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _default_literal(dt: T.DataType):
    """The reference's 0/empty defaults for unconvertible/missing fields
    (`sis_dynamic.h:110-116`)."""
    if isinstance(dt, T.StringType):
        return F.lit("")
    if isinstance(dt, (T.TimestampType, T.DateType)):
        return F.lit(None).cast(dt)
    if isinstance(dt, T.ArrayType):
        return F.array().cast(dt)
    return F.lit(0).cast(dt)


def _convertible(src: T.DataType, dst: T.DataType) -> bool:
    if src == dst:
        return True
    if isinstance(src, _NUMERIC) and isinstance(dst, _NUMERIC):
        return True  # widen or narrow, the reference allows both
    if isinstance(src, type(dst)):
        return True
    if isinstance(src, T.ArrayType) and isinstance(dst, T.ArrayType):
        return _convertible(src.elementType, dst.elementType)
    return False


def conversion_plan(src: TableSchema, dst: TableSchema) -> list[tuple[str, str]]:
    """Field-by-field plan, by NAME (never positional — `sis_dynamic.h:12-51`).

    Returns [(field, action)] with action ∈ copy | cast | default; fields
    only in src are dropped (not listed)."""
    src_types = {f.name: f.spark_type() for f in src.fields}
    plan = []
    for f in dst.fields:
        want = f.spark_type()
        if f.name not in src_types:
            plan.append((f.name, "default"))
        elif src_types[f.name] == want:
            plan.append((f.name, "copy"))
        elif _convertible(src_types[f.name], want):
            plan.append((f.name, "cast"))
        else:
            plan.append((f.name, "default"))  # mismatched type ⇒ 0/empty
    return plan


def apply_conversion(df: DataFrame, src: TableSchema, dst: TableSchema) -> DataFrame:
    """Execute a conversion plan as one projection (all-expression, one pass).

    The reference generates per-field copy/cast callbacks
    (`sis_dynamic.h:568-575`); here the whole plan is a single codegen'd
    select."""
    plan = dict(conversion_plan(src, dst))
    cols = []
    for f in dst.fields:
        action = plan[f.name]
        want = f.spark_type()
        if action == "copy":
            cols.append(F.col(f.name))
        elif action == "cast":
            cols.append(F.col(f.name).cast(want).alias(f.name))
        else:
            cols.append(_default_literal(want).alias(f.name))
    return df.select(*cols)


class SchemaRegistry:
    """Named, versioned schemas — `create` command state
    (`workers/sisdb/sisdb_io.c:8-21`).  Latest version wins; readers pin a
    version and convert via ``apply_conversion``."""

    def __init__(self) -> None:
        self._schemas: dict[str, list[TableSchema]] = {}

    def create(self, name: str, spec: dict) -> TableSchema:
        sch = parse_table_spec(name, spec)
        versions = self._schemas.setdefault(name, [])
        sch.version = len(versions) + 1
        versions.append(sch)
        return sch

    def get(self, name: str, version: int | None = None) -> TableSchema:
        versions = self._schemas[name]
        return versions[-1] if version is None else versions[version - 1]

    def versions(self, name: str) -> int:
        return len(self._schemas.get(name, []))
