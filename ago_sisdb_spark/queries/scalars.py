"""§2.8 — scalar function family queries (date/time, math, string, price,
JSON, array, cast rules).

Each family from the SURVEY §2.8 table gets one query exercising several
functions at once; Spark and DuckDB spellings differ (date_format vs
strftime, get_json_object vs json_extract_string) but compute identical
values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ago_sisdb_spark.functions import mathx, timecodec
from ago_sisdb_spark.inventory import _t, query


@query(
    "f_datetime_extract",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)            AS y,
           month(o_orderdate)           AS mo,
           day(o_orderdate)             AS d,
           isodow(o_orderdate)          AS dow_iso,
           strftime(o_orderdate, '%Y-%m-%d') AS ymd,
           CAST(strftime(o_orderdate, '%Y%m%d') AS INTEGER) AS int_date
    FROM orders WHERE o_orderkey < 1000
    """,
    extended=True,
)
def f_datetime_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extractors + yyyymmdd codec (idate/iyear family, sis_time.h:13-68)."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
        (F.weekday("o_orderdate") + 1).cast("bigint").alias("dow_iso"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("ymd"),
        timecodec.to_int_date(F.col("o_orderdate")).alias("int_date"),
    )


@query(
    "f_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
           CASE isodow(o_orderdate)
                WHEN 5 THEN CAST(o_orderdate + INTERVAL 3 DAY AS DATE)
                WHEN 6 THEN CAST(o_orderdate + INTERVAL 2 DAY AS DATE)
                ELSE CAST(o_orderdate + INTERVAL 1 DAY AS DATE) END AS next_workday
    FROM orders WHERE o_orderkey < 1000
    """,
    extended=True,
)
def f_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day offsets + next-work-day weekend skip (sis_time.h:49-61)."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_add(d, 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).cast("bigint").alias("days_to_2002"),
        timecodec.next_workday(d).alias("next_workday"),
    )


@query(
    "f_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - l_quantity * 1000), 2)     AS abs_diff,
           least(l_quantity, l_discount * 100)                    AS least_v,
           greatest(l_quantity, l_discount * 100)                 AS greatest_v,
           floor(l_extendedprice / 100)                           AS floor_v,
           ceil(l_extendedprice / 100)                            AS ceil_v,
           round(l_extendedprice / nullif(l_discount, 0), 4)      AS safe_div,
           round(pow(10, 2) * sqrt(l_quantity), 6)                AS zoom_sqrt
    FROM lineitem WHERE l_orderkey < 500
    """,
    extended=True,
)
def f_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: abs/least/greatest/floor/ceil, zero-safe divide
    (SIS_DIVF), zoom10 (sis_math.h:12-36,211-271)."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000), 2).alias(
            "abs_diff"
        ),
        F.least(F.col("l_quantity"), F.col("l_discount") * 100).alias("least_v"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("greatest_v"),
        F.floor(F.col("l_extendedprice") / 100).cast("double").alias("floor_v"),
        F.ceil(F.col("l_extendedprice") / 100).cast("double").alias("ceil_v"),
        F.round(
            mathx.safe_div(F.col("l_extendedprice"), F.col("l_discount")), 4
        ).alias("safe_div"),
        F.round(mathx.zoom10(2) * F.sqrt("l_quantity"), 6).alias("zoom_sqrt"),
    )


@query(
    "f_string_funcs",
    oracle="""
    SELECT c_custkey,
           split_part(c_name, '#', 2)          AS cust_num,
           upper(c_mktsegment)                 AS seg_upper,
           lower(c_name)                       AS name_lower,
           substring(c_name, 1, 8)             AS name_prefix,
           length(c_name)                      AS name_len,
           contains(c_name, '1')               AS has_one,
           starts_with(c_name, 'Customer')     AS is_cust
    FROM customer WHERE c_custkey < 200
    """,
    extended=True,
)
def f_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: split/case/substring/prefix (sis_str.c, sis_utils.h:60-73)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") < 200)
    return c.select(
        "c_custkey",
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("cust_num"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.col("c_name").contains("1").alias("has_one"),
        F.col("c_name").startswith("Customer").alias("is_cust"),
    )


@query(
    "f_price_decimal",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2)) AS VARCHAR)
               AS price_str,
           printf('%.3f', round(l_extendedprice, 3)) AS price_dot3,
           round(l_extendedprice, 0) AS price_dot0,
           round(l_zint / pow(10.0, 2), 6) AS zint_roundtrip
    FROM (
        SELECT *,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS l_zint
        FROM lineitem
    ) WHERE l_orderkey < 500
    """,
)
def f_price_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P-type price rendering: DECIMAL(18,2) exercised then rendered to a
    string (driver-checked columns are Decimal-free — r1 showed the driver
    hasher and DuckDB disagree on Decimal canonicalization), per-field dot
    render, and a zint32 encode->decode round trip through the reference bit
    layout (sis_zint.h:11-15, sis_dynamic.h:240-299).  The DecimalType
    mapping itself is pinned by tests/test_functions.py."""
    from ago_sisdb_spark.functions import price

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2)
        .cast("decimal(18,2)")
        .cast("string")
        .alias("price_str"),
        price.price_render(F.col("l_extendedprice"), 3).alias("price_dot3"),
        F.round("l_extendedprice", 0).alias("price_dot0"),
        F.round(
            price.zint_decode(price.zint_encode(F.col("l_extendedprice"), 2)).cast(
                "double"
            ),
            6,
        ).alias("zint_roundtrip"),
    )


@query(
    "f_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
    FROM events WHERE event_id < 1000
    """,
    extended=True,
)
def f_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family (sis_json.c): extract + cast from the props column."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 1000)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
    )


@query(
    "f_array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding)                                           AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6)                   AS first_elem,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)), 4) AS sq_norm,
           round(CAST(list_max(embedding) AS DOUBLE), 6)            AS max_elem
    FROM embeddings WHERE vec_id < 100
    """,
    extended=True,
)
def f_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family (repeated fields, sis_dynamic.h:155-187): element access,
    transform+aggregate (dot/norm), max — all codegen'd builtins."""
    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    sq = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.round(sq, 4).alias("sq_norm"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_elem"),
    )


@query(
    "f_cast_rules",
    oracle="""
    SELECT o_orderkey,
           CAST(floor(o_totalprice) AS BIGINT)  AS price_int,
           CAST(o_orderkey AS VARCHAR)   AS key_str,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast
    FROM orders WHERE o_orderkey < 1000
    """,
    extended=True,
)
def f_cast_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion rules (sis_dynamic.h:110-116): widening casts + the
    "mismatched type → empty" rule as try_cast → NULL."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.floor("o_totalprice").cast("bigint").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderpriority").try_cast("int").alias("bad_cast"),
    )


@query(
    "u2_registered_methods",
    oracle="""
    SELECT event_id,
           round(1.0 / (1.0 + exp(-(value / 100.0))), 6) AS logistic_score,
           round(CASE WHEN value = 0 THEN NULL ELSE value / value END, 6)
               AS self_ratio,
           round(value * 100, 6) AS zoomed
    FROM events WHERE event_id < 500
    """,
    extended=True,
)
def u2_registered_methods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2/U3 extension surface: a pandas-UDF method registered by name and
    called through spark.sql, composed with expression methods resolved via
    `call()` dispatch (the reference's python-plugin + call-by-name,
    `pyscript/demo_method/demo_method.py:1-31`,
    `workers/sisdb_server/sisdb_server.c:770`)."""
    from ago_sisdb_spark.functions.registry import call, register_udfs

    register_udfs(spark)
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 500)
    ev.createOrReplaceTempView("u2_events")
    via_sql = spark.sql(
        "SELECT event_id, sis_logistic(value / 100.0) AS logistic_score, value"
        " FROM u2_events"
    )
    return via_sql.select(
        "event_id",
        F.round("logistic_score", 6).alias("logistic_score"),
        F.round(call("zero_safe_div", F.col("value"), F.col("value")), 6).alias(
            "self_ratio"
        ),
        F.round(call("zoom10", F.col("value"), 2), 6).alias("zoomed"),
    )


@query(
    "u5_grouped_agg_udaf",
    oracle="""
    SELECT event_type,
           round(exp(avg(ln(value))), 6) AS geo_mean
    FROM events WHERE value > 0 GROUP BY event_type
    """,
    extended=True,
)
def u5_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF surface: a grouped-agg pandas UDF (geometric mean) registered by
    name and used in a groupBy — the custom-aggregate extension path the
    reference exposes through worker plugins (U1/U2)."""
    from ago_sisdb_spark.functions.registry import register_udfs

    register_udfs(spark)
    ev = _t(spark, sf_dir, "events").where(F.col("value") > 0)
    ev.createOrReplaceTempView("u5_events")
    out = spark.sql(
        "SELECT event_type, sis_geomean(value) AS geo_mean"
        " FROM u5_events GROUP BY event_type"
    )
    return out.select("event_type", F.round("geo_mean", 6).alias("geo_mean"))


@query(
    "f_next_workday",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + CAST(
               CASE isodow(o_orderdate)
                    WHEN 5 THEN 3 WHEN 6 THEN 2 ELSE 1 END AS INTEGER
           ) AS next_wd
    FROM orders WHERE o_orderkey < 2000
    """,
    extended=True,
)
def f_next_workday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-work-day skipping weekends (sis_time.h next-work-day rule);
    holiday-aware deployments broadcast-join a calendar table instead —
    same plan shape, the rule becomes a lookup."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        timecodec.next_workday(F.to_date("o_orderdate")).alias("next_wd"),
    )


@query(
    "f_variant",
    oracle="""
    WITH j AS (
        SELECT o_orderkey,
               to_json(struct_pack(status := o_orderstatus,
                                   price := o_totalprice,
                                   keys := [o_orderkey, o_custkey])) AS v
        FROM orders WHERE o_orderkey < 500)
    SELECT o_orderkey,
           json_extract_string(v, '$.status') AS v_status,
           CAST(json_extract(v, '$.price') AS DOUBLE) AS v_price,
           CAST(json_extract(v, '$.keys[1]') AS BIGINT) AS v_custkey,
           CAST(NULL AS INTEGER) AS v_missing,
           'OBJECT<keys: ARRAY<BIGINT>, status: STRING>' AS v_schema,
           TRUE AS v_isnull
    FROM j
    """,
    extended=True,
)
def f_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT semi-structured type: parse_json → open-schema
    binary variant, typed path extraction (variant_get), missing-path
    try_variant_get → NULL, per-value schema introspection
    (schema_of_variant on a price-free struct — JSON decimal inference
    makes price's DECIMAL(p,2) width data-dependent), and JSON-null
    detection.  The engine-native successor to string get_json_object
    for schema-on-read columns (reference sis_json.c parses into dynamic
    nodes; VARIANT is the columnar-shreddable equivalent).  The double
    survives the JSON round-trip bit-exactly on both engines
    (shortest-repr serialization both ways)."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    v = F.parse_json(
        F.to_json(
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").alias("price"),
                F.array(F.col("o_orderkey"), F.col("o_custkey")).alias("keys"),
            )
        )
    )
    v_nop = F.parse_json(
        F.to_json(
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.array(F.col("o_orderkey"), F.col("o_custkey")).alias("keys"),
            )
        )
    )
    return o.select(
        "o_orderkey",
        F.variant_get(v, "$.status", "string").alias("v_status"),
        F.variant_get(v, "$.price", "double").alias("v_price"),
        F.variant_get(v, "$.keys[1]", "bigint").alias("v_custkey"),
        F.try_variant_get(v, "$.missing", "int").alias("v_missing"),
        F.schema_of_variant(v_nop).alias("v_schema"),
        F.is_variant_null(F.parse_json(F.lit("null"))).alias("v_isnull"),
    )


@query(
    "f_xml",
    oracle="""
    SELECT o_orderkey,
           o_orderkey   AS x_id,
           o_orderstatus AS x_status,
           o_custkey    AS x_custkey,
           o_orderstatus AS xp_status
    FROM orders WHERE o_orderkey < 500
    """,
    extended=True,
)
def f_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 native XML: from_xml struct parsing with attribute
    extraction (default ``_`` attribute prefix) plus XPath string
    extraction, over per-row XML built from real columns, so the parse
    results are restatable closed-form by the oracle (planted-oracle
    trick — DuckDB has no XML functions).  Only integers/enum strings go
    through the markup: float→text formatting is engine-specific."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    xml = F.concat(
        F.lit('<rec id="'), F.col("o_orderkey"), F.lit('"><st>'),
        F.col("o_orderstatus"), F.lit("</st><pr>"), F.col("o_custkey"),
        F.lit("</pr></rec>"),
    )
    s = F.from_xml(xml, "STRUCT<_id: BIGINT, st: STRING, pr: BIGINT>")
    return o.select(
        "o_orderkey",
        s.getField("_id").alias("x_id"),
        s.getField("st").alias("x_status"),
        s.getField("pr").alias("x_custkey"),
        F.xpath_string(xml, F.lit("/rec/st")).alias("xp_status"),
    )
