"""Reference search-DSL compiler (P4/T8/T9 `search` forms).

The reference's update/delete commands take a JSON search spec
(`workers/sisdb/sisdb.h:50-53`, predicate kinds `sisdb_fmap.h:92-100`):

- ``{"field": v}``                      → equality (``same``)
- ``{"field": {"min": a, "max": b}}``   → range (``group``), either bound open
- ``{"field": {"match": "sub"}}``       → substring (case-insensitive)
- ``{"field": {"in": [v, ...]}}``       → set membership
- ``{"field": {"head": "pre"}}``        → prefix (head match)
- object with several fields            → AND of its predicates
- array of objects                      → OR of the objects

String equality/membership compare case-insensitively, per the reference
rule (`sisdb_fmap.h:96`).  Output is one Column predicate — it composes
with time-range filters and pushes down like any hand-written expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _ci(col: Column, value):
    """Case-insensitive comparison lift for string operands."""
    if isinstance(value, str):
        return F.lower(col), value.lower()
    return col, value


def _field_pred(name: str, spec) -> Column:
    col = F.col(name)
    if not isinstance(spec, dict):
        c, v = _ci(col, spec)
        return c == F.lit(v)
    preds: list[Column] = []
    if "min" in spec:
        preds.append(col >= F.lit(spec["min"]))
    if "max" in spec:
        preds.append(col <= F.lit(spec["max"]))
    if "match" in spec:
        preds.append(F.lower(col).contains(str(spec["match"]).lower()))
    if "head" in spec:
        preds.append(F.lower(col).startswith(str(spec["head"]).lower()))
    if "in" in spec:
        vals = spec["in"]
        if vals and isinstance(vals[0], str):
            preds.append(F.lower(col).isin([v.lower() for v in vals]))
        else:
            preds.append(col.isin(list(vals)))
    if not preds:
        raise ValueError(f"field {name!r}: empty or unknown search spec {spec!r}")
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def compile_search(search) -> Column:
    """JSON search form → Column predicate (AND-object / OR-array)."""
    if isinstance(search, list):
        if not search:
            raise ValueError("empty OR-array search")
        parts = [compile_search(s) for s in search]
        out = parts[0]
        for p in parts[1:]:
            out = out | p
        return out
    if isinstance(search, dict):
        if not search:
            raise ValueError("empty AND-object search")
        parts = [_field_pred(k, v) for k, v in search.items()]
        out = parts[0]
        for p in parts[1:]:
            out = out & p
        return out
    raise TypeError(f"search form must be dict or list, got {type(search)}")
