"""Reference search-DSL compiler (sisdb.h:50-53 forms) → Column predicates."""

from __future__ import annotations

import pytest

from ago_sisdb_spark.operators.search import compile_search


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "SH600600", "Beer Co", 10.0),
        (2, "SH688001", "Chip Co", 55.0),
        (3, "SZ300750", "Battery", 92.0),
        (4, "SZ000001", "BANK", 30.0),
    ]
    return spark.createDataFrame(rows, "id int, code string, name string, px double")


def _ids(df, search):
    return sorted(r.id for r in df.where(compile_search(search)).collect())


def test_equality_and_case_insensitive(df):
    assert _ids(df, {"name": "bank"}) == [4]  # reference: CI string compare
    assert _ids(df, {"px": 10.0}) == [1]


def test_range_group(df):
    assert _ids(df, {"px": {"min": 30.0, "max": 92.0}}) == [2, 3, 4]
    assert _ids(df, {"px": {"min": 56.0}}) == [3]
    assert _ids(df, {"px": {"max": 10.0}}) == [1]


def test_match_head_in(df):
    assert _ids(df, {"name": {"match": "co"}}) == [1, 2]
    assert _ids(df, {"code": {"head": "sz"}}) == [3, 4]
    assert _ids(df, {"code": {"in": ["sh600600", "SZ000001"]}}) == [1, 4]


def test_and_object(df):
    assert _ids(df, {"code": {"head": "SH"}, "px": {"min": 50.0}}) == [2]


def test_or_array(df):
    assert _ids(df, [{"name": "bank"}, {"px": {"max": 11.0}}]) == [1, 4]


def test_nested_and_inside_or(df):
    search = [
        {"code": {"head": "SZ"}, "px": {"min": 90.0}},
        {"name": {"match": "beer"}},
    ]
    assert _ids(df, search) == [1, 3]


def test_invalid_forms_raise(df):
    with pytest.raises(ValueError):
        compile_search({})
    with pytest.raises(ValueError):
        compile_search([])
    with pytest.raises(ValueError):
        compile_search({"px": {"unknown": 1}})
    with pytest.raises(TypeError):
        compile_search("px > 3")


def test_engine_where_integration(spark, sf_small):
    from ago_sisdb_spark.plans.engine import Engine, TableSpec

    eng = Engine(
        spark, sf_small,
        {"events": TableSpec("events", "user_id", "ts", order_col="event_id")},
    )
    out = eng.get(
        "*.events",
        where={"event_type": {"in": ["purchase"]}, "value": {"min": 50.0}},
        count=10,
    ).collect()
    assert 0 < len(out) <= 10
    assert all(r.event_type == "purchase" and r.value >= 50.0 for r in out)
    survivors = eng.delete("*.events", where={"event_type": "purchase"})
    assert survivors.where("event_type = 'purchase'").count() == 0
    assert survivors.where("event_type != 'purchase'").count() > 0
