"""Fast pre-commit smoke: import every package module and ANALYZE every
registry entry's plan at sf0.001 — no job execution.

This exists because of the r7 snapshot incident: a refactor left six
operator files calling ``materialize(...)`` without importing it, and the
NameError only fired when an entry's plan was *built* — pytest/gate/bench
all crashed, but only minutes into a full run.  Building each entry's
DataFrame and touching ``.schema`` (forces Catalyst analysis) catches the
whole class — missing names, bad column refs, unresolvable expressions —
in seconds, because nothing is collected and ``SPARK_GRAFT_NO_MATERIALIZE``
turns the eager checkpoints into no-ops.

Usage:  python tools/smoke_compile.py        (exit 0 = safe to commit)
Wired into ``tools/run_all.py --fast`` and ``.git/hooks/pre-commit``.
"""

from __future__ import annotations

import importlib
import os
import pkgutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")


def import_all() -> list[str]:
    """Import every module under ago_sisdb_spark; return failures."""
    import ago_sisdb_spark

    failures = []
    for info in pkgutil.walk_packages(
        ago_sisdb_spark.__path__, prefix="ago_sisdb_spark."
    ):
        try:
            importlib.import_module(info.name)
        except Exception as exc:  # noqa: BLE001 — report, don't mask
            failures.append(f"{info.name}: {type(exc).__name__}: {exc}")
    return failures


def analyze_all(spark) -> list[str]:
    """Build + analyze (schema only, no execution) every registry entry."""
    from ago_sisdb_spark.inventory import all_queries, extended_queries

    failures = []
    entries = {**all_queries(), **extended_queries()}
    for name, fn in entries.items():
        try:
            df = fn(spark, SF_DIR)
            _ = df.schema  # forces analysis; resolves every expression
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    return failures


def main() -> int:
    # Plan analysis only — never execute the eager localCheckpoint sites.
    # Set in main(), NOT at import: pytest imports this module, and a
    # module-level os.environ write would silently disable materialization
    # for every later test in the same process (plan-shape assertions like
    # test_bm25_tokenizes_corpus_exactly_once depend on it).
    os.environ["SPARK_GRAFT_NO_MATERIALIZE"] = "1"
    t0 = time.time()
    imp_fail = import_all()
    for line in imp_fail:
        print(f"IMPORT-FAIL  {line}")

    from ago_sisdb_spark.session import get_spark

    spark = get_spark()
    plan_fail = analyze_all(spark)
    for line in plan_fail:
        print(f"ANALYZE-FAIL  {line}")

    n_bad = len(imp_fail) + len(plan_fail)
    print(
        f"smoke: {n_bad} failures ({len(imp_fail)} import, "
        f"{len(plan_fail)} analyze) in {time.time() - t0:.1f}s"
    )
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
