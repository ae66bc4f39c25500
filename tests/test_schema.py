"""sis_dynamic analogue: spec parsing, type mapping, schema evolution
conversion plans (SURVEY §1.2-1.3 contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from ago_sisdb_spark.schema import (
    SchemaRegistry,
    apply_conversion,
    conversion_plan,
    parse_table_spec,
)

STK_DAY = {
    # stk_day shape (bin/init-sisdb.conf:78-93)
    "fields": {
        "time": ["S", 8],
        "open": ["P", 4, 1, 2],
        "high": ["P", 4, 1, 2],
        "low": ["P", 4, 1, 2],
        "newp": ["P", 4, 1, 2],
        "volume": ["U", 8],
        "money": ["F", 8],
        "name": ["C", 32],
        "askp": ["P", 4, 10, 2],  # 10-level book: repeated field
        "tdate": ["D", 4],
    },
    "index": {"time": "mindex", "name": "solely"},
}


def test_parse_and_type_map():
    sch = parse_table_spec("stk_day", STK_DAY)
    st = sch.to_struct_type()
    by_name = {f.name: f for f in st.fields}
    assert isinstance(by_name["time"].dataType, T.TimestampType)
    assert by_name["open"].dataType == T.DecimalType(18, 6)
    assert by_name["open"].nullable  # P invalid marker → nullable
    assert isinstance(by_name["volume"].dataType, T.LongType)  # u64 rule
    assert isinstance(by_name["money"].dataType, T.DoubleType)
    assert isinstance(by_name["name"].dataType, T.StringType)
    assert by_name["askp"].dataType == T.ArrayType(T.DecimalType(18, 6), False)
    assert isinstance(by_name["tdate"].dataType, T.DateType)
    assert sch.time_field() == "time"
    assert sch.unique_fields() == ["name"]


def test_conversion_plan_add_widen_drop():
    v1 = parse_table_spec(
        "t", {"fields": {"time": ["S", 8], "v": ["F", 4], "gone": ["I", 4]}}
    )
    v2 = parse_table_spec(
        "t",
        {"fields": {"time": ["S", 8], "v": ["F", 8], "added": ["I", 4]}},
    )
    plan = dict(conversion_plan(v1, v2))
    assert plan == {"time": "copy", "v": "cast", "added": "default"}


def test_mismatched_type_defaults_to_zero(spark):
    v1 = parse_table_spec("t", {"fields": {"k": ["I", 4], "x": ["C", 8]}})
    v2 = parse_table_spec("t", {"fields": {"k": ["I", 4], "x": ["F", 8]}})
    df = spark.createDataFrame([(1, "abc")], "k int, x string")
    out = apply_conversion(df, v1, v2).collect()[0]
    assert out.k == 1
    assert out.x == 0.0  # string → float is mismatched → 0 (sis_dynamic rule)


def test_apply_conversion_roundtrip(spark):
    v1 = parse_table_spec(
        "t", {"fields": {"k": ["I", 4], "v": ["F", 4], "old": ["C", 4]}}
    )
    v2 = parse_table_spec(
        "t", {"fields": {"k": ["I", 8], "v": ["F", 8], "nm": ["C", 8]}}
    )
    df = spark.createDataFrame([(7, 1.5, "x"), (8, 2.5, "y")], "k int, v float, old string")
    out = apply_conversion(df, v1, v2)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "double", "string",
    ]
    rows = out.orderBy("k").collect()
    assert rows[0].k == 7 and abs(rows[0].v - 1.5) < 1e-9 and rows[0].nm == ""


def test_registry_versions():
    reg = SchemaRegistry()
    reg.create("stk_day", {"fields": {"time": ["S", 8], "v": ["F", 4]}})
    reg.create("stk_day", {"fields": {"time": ["S", 8], "v": ["F", 8]}})
    assert reg.versions("stk_day") == 2
    assert reg.get("stk_day").version == 2
    assert reg.get("stk_day", 1).fields[1].length == 4


def test_unknown_style_raises():
    with pytest.raises(ValueError):
        parse_table_spec("t", {"fields": {"x": ["Z", 4]}}).to_struct_type()


def test_conversion_property_numeric_widening(spark):
    """Property: any numeric→numeric conversion preserves exactly-
    representable values."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None)
    @given(st.integers(min_value=-127, max_value=127))
    def run(v):
        v1 = parse_table_spec("t", {"fields": {"x": ["I", 1]}})
        for style, length in (("I", 2), ("I", 4), ("I", 8), ("F", 4), ("F", 8)):
            v2 = parse_table_spec("t", {"fields": {"x": [style, length]}})
            df = spark.createDataFrame([(v,)], v1.to_struct_type())
            out = apply_conversion(df, v1, v2).collect()[0].x
            assert float(out) == float(v)

    run()
