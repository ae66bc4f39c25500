"""Inventory smoke: every registered query builds and executes at sf0.001.

The driver's hash gate runs at sf0.01 (mirrored by
tools/check_correctness.py); this suite guarantees the cheaper invariants on
every commit: each builder returns a plannable DataFrame, executes without
error, has stable column names, and every oracle key has a queries() twin.
"""

from __future__ import annotations

import pytest

from ago_sisdb_spark.inventory import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_inventory_size_floor():
    # SURVEY §2 coverage should only grow
    assert len(QUERIES) >= 90
    assert len(ORACLES) >= 80


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_executes(name, spark, sf_small):
    df = QUERIES[name](spark, sf_small)
    cols = df.columns
    assert cols, f"{name}: no columns"
    assert len(set(cols)) == len(cols), f"{name}: duplicate column names {cols}"
    n = df.count()
    assert n >= 0
