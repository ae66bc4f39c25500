"""Batch sources & sinks (SURVEY §2.1 S6-S10).

parquet is the native format (catalog.py); this package adds the reference's
interchange formats: CSV (S6), JSON (S8), DBF (S7), packed binary structs
(S9), multi-format rendering (S10), and multimodal binary columns (§2.11).
"""
