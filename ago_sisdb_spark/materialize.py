"""Central choke point for in-session materialization of small collapse
tables (the r7 two-consumer-trap fixes: vocab tables, bucket counts,
per-term dfreq, doc lengths, batch verdicts, query sets).

Why a choke point and not bare ``localCheckpoint`` at each site:

- ``SPARK_GRAFT_NO_MATERIALIZE=1`` turns every site into a no-op.  An
  eager checkpoint truncates lineage — the audited plan shows ``Scan
  ExistingRDD`` where the real subplan ran — so ``tools/audit_plans.py``
  sets this flag to audit the FULL lineage (anti-pattern detectors and
  --dupscans pass counting both need it).  Results are identical either
  way; only execution shape changes.
- One documented rule at one site: materialize ONLY frames that are
  bounded by vocabulary / bucket-count / batch / doc-cardinality — never
  corpus-scale rows (CLAUDE.md known-traps).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

ENV_FLAG = "SPARK_GRAFT_NO_MATERIALIZE"


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly pin a SMALL collapse table so multiple plan consumers read
    blocks instead of re-running its (corpus-pass) lineage.  No-op when
    ``SPARK_GRAFT_NO_MATERIALIZE=1`` (plan audits; debugging lineage)."""
    if os.environ.get(ENV_FLAG) == "1":
        return df
    return df.localCheckpoint(eager=True)
