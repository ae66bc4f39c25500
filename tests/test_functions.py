"""Time-codec + P-decimal property tests (SURVEY §5 plan items 4)."""

from __future__ import annotations

from datetime import date

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ago_sisdb_spark.functions import price, timecodec

# module-level handle filled by the spark fixture via an autouse fixture
_SPARK = {}


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _grab_spark(spark):
    _SPARK["s"] = spark
    yield


def _one_col(values, schema, expr):
    s = _SPARK["s"]
    df = s.createDataFrame([(v,) for v in values], schema)
    return [r[0] for r in df.select(expr(F.col(df.columns[0]))).collect()]


@settings(max_examples=20, deadline=None)
@given(st.dates(min_value=date(1970, 1, 2), max_value=date(2199, 12, 31)))
def test_int_date_roundtrip(d):
    intd = d.year * 10000 + d.month * 100 + d.day
    [as_date] = _one_col([intd], "d int", timecodec.from_int_date)
    assert as_date == d
    [back] = _one_col([d], "d date", timecodec.to_int_date)
    assert back == intd


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=0, max_value=86399))
def test_int_time_roundtrip(sec):
    h, rem = divmod(sec, 3600)
    m, s = divmod(rem, 60)
    hhmmss = h * 10000 + m * 100 + s
    [got_sec] = _one_col([hhmmss], "t int", timecodec.from_int_time)
    assert got_sec == sec
    [back] = _one_col([sec], "t int", timecodec.to_int_time)
    assert back == hhmmss


def test_from_int_minute():
    # 28489680 min × 60 = 1709380800 s epoch = 2024-03-02 12:00:00 UTC
    [ts] = _one_col([28489680], "m long", timecodec.from_int_minute)
    assert str(ts) == "2024-03-02 12:00:00"


def test_next_workday_skips_weekend():
    fri, sat, sun, mon = (
        date(2024, 2, 2),
        date(2024, 2, 3),
        date(2024, 2, 4),
        date(2024, 2, 5),
    )
    got = _one_col([fri, sat, sun, mon], "d date", timecodec.next_workday)
    assert got == [date(2024, 2, 5), date(2024, 2, 5), date(2024, 2, 5), date(2024, 2, 6)]


@settings(max_examples=20, deadline=None)
@given(
    st.floats(min_value=-99999.0, max_value=99999.0, allow_nan=False).map(
        lambda x: round(x, 3)
    )
)
def test_zint_roundtrip(v):
    s = _SPARK["s"]
    df = s.createDataFrame([(float(v),)], "v double")
    out = df.select(
        price.zint_decode(price.zint_encode(F.col("v"), 3)).alias("d")
    ).collect()[0][0]
    assert out is not None
    assert abs(float(out) - v) < 1e-9


def test_zint_invalid_scale_is_null():
    s = _SPARK["s"]
    # attr bits (28-30) = 7 → invalid → NULL (sis_zint.h:13)
    packed = 7 << 28
    df = s.createDataFrame([(packed,)], "p int")
    assert df.select(price.zint_decode(F.col("p"))).collect()[0][0] is None


def test_zint_reference_bit_layout():
    """Decode known reference-packed constants (sis_double_to_zint32 of
    123.45 at dot=2: zint=12345, attr=2, sign=0 → mantissa | attr<<28, and
    the negative twin sets bit 31 → a negative int32)."""
    s = _SPARK["s"]
    pos = 12345 | (2 << 28)  # 0x20003039
    neg = (12345 | (2 << 28) | (1 << 31)) - (1 << 32)  # int32 view of 0xA0003039
    df = s.createDataFrame([(pos,), (neg,)], "p int")
    got = [
        None if r[0] is None else float(r[0])
        for r in df.select(price.zint_decode(F.col("p"))).collect()
    ]
    assert got == [123.45, -123.45]


def test_zint_encode_matches_reference_packing():
    s = _SPARK["s"]
    df = s.createDataFrame([(123.45,), (-123.45,), (0.0,)], "v double")
    got = [r[0] for r in df.select(price.zint_encode(F.col("v"), 2)).collect()]
    assert got[0] == 12345 | (2 << 28)
    assert got[1] == (12345 | (2 << 28) | (1 << 31)) - (1 << 32)
    assert got[2] == 0  # zero packs to all-zero bits (sis_zint.h:59 attr reset)


def test_zint_encode_overflow_marks_invalid():
    """A mantissa past 28 bits is unrepresentable: the reference flags it
    invalid (attr=7) instead of truncating bits — decode yields NULL."""
    s = _SPARK["s"]
    over = float((1 << 28) + 5) / 100.0  # mantissa 2^28+5 at scale 2
    ok = 123.45
    df = s.createDataFrame([(over,), (ok,)], "v double")
    got = df.select(
        price.zint_encode(F.col("v"), 2).alias("p"),
        price.zint_decode(price.zint_encode(F.col("v"), 2)).alias("d"),
    ).collect()
    assert got[0].p == 7 << 28  # invalid marker, not masked bits
    assert got[0].d is None
    assert float(got[1].d) == ok


def test_mathx_helpers():
    from ago_sisdb_spark.functions import mathx

    s = _SPARK["s"]
    df = s.createDataFrame([(7.0, 2.0), (1.0, 0.0)], "a double, b double")
    out = df.select(
        mathx.safe_div(F.col("a"), F.col("b")).alias("d"),
        mathx.floor_at(F.lit(3.14159), 2).alias("fl"),
        mathx.ceil_at(F.lit(3.14159), 2).alias("ce"),
        mathx.zoom10(3).alias("z"),
    ).collect()
    assert out[0].d == 3.5 and out[1].d is None
    assert out[0].fl == 3.14 and out[0].ce == 3.15
    assert out[0].z == 1000.0


def test_enrich_appends_fetcher_columns(spark):
    """U4 enrichment bridge: mapInPandas stage appends the fetcher's columns
    batch-wise; the deterministic stub mirrors the oracle arithmetic."""
    from ago_sisdb_spark.functions.enrich import enrich, stub_score_fetcher

    df = spark.createDataFrame([(i,) for i in range(50)], ["k"])
    out = enrich(df, stub_score_fetcher("k"), "score double, tier string")
    assert out.columns == ["k", "score", "tier"]
    rows = {r.k: r for r in out.collect()}
    assert len(rows) == 50
    for k, r in rows.items():
        expect = (((k % 1000003) * 2654435761) % 1000003) / 1000003.0
        assert abs(r.score - expect) < 1e-12
        assert r.tier == ("hot" if expect >= 0.66 else "warm" if expect >= 0.33 else "cold")


def test_enrich_null_safe_fetcher(spark):
    """A failing key must not fail the job: the fetcher contract is to
    return null cells, mirroring the media-stub null-safety rule."""
    import pandas as pd

    from ago_sisdb_spark.functions.enrich import enrich

    def flaky(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # simulate per-key fetch errors as null cells
        vals = [None if k % 2 else float(k) for k in pdf["k"]]
        return pd.DataFrame({"score": pd.array(vals, dtype="float64")})

    df = spark.createDataFrame([(i,) for i in range(10)], ["k"])
    out = enrich(df, flaky, "score double").collect()
    assert len(out) == 10
    assert sum(1 for r in out if r.score is None) == 5


def test_enrich_rejects_misaligned_fetcher(spark):
    """A fetcher returning the wrong row count must error loudly, not
    NaN-pad (silent misalignment corrupts every row after the gap)."""
    import pandas as pd
    import pytest
    from py4j.protocol import Py4JJavaError

    from ago_sisdb_spark.functions.enrich import enrich

    def short(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame({"score": [1.0]})  # always 1 row

    df = spark.createDataFrame([(i,) for i in range(10)], ["k"]).coalesce(1)
    with pytest.raises((Py4JJavaError, Exception), match="must be 1:1"):
        enrich(df, short, "score double").collect()


def test_variant_and_xml_edge_semantics(spark):
    """VARIANT: try_variant_get on a missing path → NULL (never throws);
    variant_get coerces JSON decimal → double.  XML: a field absent from
    the markup parses to NULL, attributes use the `_` prefix."""
    from pyspark.sql import functions as F

    df = spark.range(1)
    v = F.parse_json(F.lit('{"a": 1.5, "b": [1, 2]}'))
    r = df.select(
        F.try_variant_get(v, "$.missing", "int").alias("miss"),
        F.variant_get(v, "$.a", "double").alias("a"),
        F.variant_get(v, "$.b[0]", "bigint").alias("b0"),
        F.is_variant_null(F.parse_json(F.lit("null"))).alias("isnull"),
    ).collect()[0]
    assert (r["miss"], r["a"], r["b0"], r["isnull"]) == (None, 1.5, 1, True)

    x = F.from_xml(
        F.lit('<r key="7"><s>hi</s></r>'),
        "STRUCT<_key: BIGINT, s: STRING, absent: BIGINT>",
    )
    r = df.select(
        x.getField("_key").alias("k"),
        x.getField("s").alias("s"),
        x.getField("absent").alias("absent"),
    ).collect()[0]
    assert (r["k"], r["s"], r["absent"]) == (7, "hi", None)
