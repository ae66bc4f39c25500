"""Relational + time-series operators (SURVEY.md §2), Spark-first.

Each module composes built-in DataFrame ops so Catalyst keeps predicate
pushdown / column pruning / join planning; Pandas UDFs appear only where the
semantics are genuinely non-relational (polyfit, turning-point scans,
MinHash signatures).
"""
