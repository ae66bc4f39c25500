"""Named query inventory modules (registered into ago_sisdb_spark.inventory).

One module per SURVEY.md §2 section:

- ``scans``      — §2.1 scans/sources + §2.2 projections/predicates + §2.6 sort/limit/topk + §2.7 set ops
- ``joins``      — §2.3 joins J1-J5 (incl. as-of)
- ``aggregates`` — §2.4 rollup + group-by surface (A1-A2, A15-A16, cube/rollup)
- ``series``     — §2.4/§2.5 series math A3-A14 over windows
- ``scalars``    — §2.8 scalar function families
- ``pipeline``   — §2.11 LLM-data-pipeline operators (dedup, similarity, text)
"""
