"""Registry-wide physical-plan audit: anti-pattern gate over ALL entries.

PLANS.md documents the headline queries' executed plans by hand; this tool
mechanically sweeps EVERY registered query (driver window + extended) and
fails on the plan shapes that do not survive a 100 TB scale-up:

  cartesian        CartesianProduct join (full N x M shuffle-less blowup).
                   BroadcastNestedLoopJoin over a broadcast one-row/tiny
                   frame is fine and not flagged.
  row-python-udf   BatchEvalPython = row-at-a-time Python UDF.  Every
                   Python path must be Arrow-batched (ArrowEvalPython /
                   MapInPandas / FlatMapGroupsInPandas are fine).
  global-window    Window / WindowInPandas with an EMPTY partition spec —
                   WindowExec moves the whole input to ONE partition.
                   (Window node prints `[exprs], [partition], [order]`;
                   partition and/or order may be omitted.  Unpartitioned =
                   exactly 2 groups AND the 2nd is an ORDER spec, i.e.
                   carries ASC/DESC markers; 2 groups with a bare column
                   list is a partitioned whole-frame window and is fine.)
  sort-to-single   Sort directly above Exchange SinglePartition — a global
                   sort forced through one partition (rangepartitioning is
                   the scale-safe global sort; Exchange SinglePartition
                   under a final no-key HashAggregate is fine: partials
                   carry one row per partition and are NOT flagged).

Known-good exceptions live in WHITELIST with a reason each; a whitelisted
hit is reported as `waived` so the list can never rot silently (a waived
entry that stops tripping its detector is also reported, as `stale-waiver`).

The audit builds each entry's DataFrame and reads the AQE *initial*
physical plan (`queryExecution().executedPlan()` before any action) — no
query is executed, so the sweep is cheap even though some entries run
driver-side builds (IVF/PQ/BPE training, pipe8 state) while constructing.

Usage: python tools/audit_plans.py [name_prefix ...] [--dupscans]
  SPARK_GRAFT_AUDIT_DIR  testdata dir (default /root/testdata/sf0.001)
Exit 0 = no un-waived violations.

--dupscans additionally reports (informational, never failing) entries
whose final plan scans the same source table >= 3 times.  Triage guide:
umbrella/suite entries legitimately union many single-scan probes, and a
cheap pruned parquet re-scan is often the RIGHT call at 100 TB versus
materializing a corpus-sized intermediate (t12's documented 3-pass
design).  The signal to act on is a repeated scan feeding repeated
EXPENSIVE derived work whose result is small — the r7 BM25 case: four
explode+tokenize branches all collapsing into one vocabulary-bounded
postings table, fixed by materializing that table once.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_AUDIT_DIR", "/root/testdata/sf0.001")

# name -> {detector: reason}.  Every waiver must say why the shape is safe.
# (Empty as of r7: the former cartesian ground-truth twins d5/n6 now plan
# as broadcast joins at audit scale — first full sweep found 0 violations.)
WHITELIST: dict[str, dict[str, str]] = {}

_WINDOW_NODE = re.compile(r"^[\s+:*()\d-]*(Window(InPandas)?) \[")
_SORT_NODE = re.compile(r"^[\s+:*()\d-]*Sort \[")
_EXCH_SINGLE = re.compile(r"^[\s+:*()\d-]*Exchange SinglePartition")


def _top_level_groups(s: str) -> list[str]:
    """Split a plan-node argument string into top-level [...] groups."""
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in s:
        if ch == "[":
            if depth == 0:
                buf = []
            else:
                buf.append(ch)
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
            if depth == 0:
                groups.append("".join(buf))
            else:
                buf.append(ch)
        elif depth > 0:
            buf.append(ch)
    return groups


_ORDER_MARK = re.compile(r" (ASC|DESC)( NULLS (FIRST|LAST))?(,|$)")


def _is_unpartitioned_window(args: str) -> bool:
    groups = _top_level_groups(args)
    if len(groups) >= 3:
        return False
    if len(groups) == 2:
        # [exprs], [order]  -> unpartitioned; [exprs], [partition] -> fine
        return bool(_ORDER_MARK.search(groups[1]))
    return len(groups) == 1  # bare [exprs]: no partition, no order


def detect(plan: str) -> list[tuple[str, str]]:
    """Return (detector, offending line) pairs for one plan string."""
    hits: list[tuple[str, str]] = []
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "CartesianProduct" in line:
            hits.append(("cartesian", line.strip()[:160]))
        if "BatchEvalPython" in line:
            hits.append(("row-python-udf", line.strip()[:160]))
        m = _WINDOW_NODE.match(line)
        if m:
            args = line[line.index(m.group(1)) + len(m.group(1)) :]
            if _is_unpartitioned_window(args):
                hits.append(("global-window", line.strip()[:160]))
        if _EXCH_SINGLE.match(line) and i > 0:
            for back in range(1, 3):
                if i - back >= 0 and _SORT_NODE.match(lines[i - back]):
                    hits.append(("sort-to-single", lines[i - back].strip()[:160]))
                    break
    return hits


def dup_scans(plan: str, threshold: int = 3) -> dict[str, int]:
    """Tables scanned >= threshold times in the final plan section."""
    import collections

    final = plan.split("== Initial Plan ==")[0]
    counts = collections.Counter(re.findall(r"(\w+)\.parquet", final))
    return {t: c for t, c in counts.items() if c >= threshold}


def main() -> int:
    prefixes = [a for a in sys.argv[1:] if not a.startswith("-")]
    want_dupscans = "--dupscans" in sys.argv[1:]

    from __spark_entry__ import queries
    from ago_sisdb_spark.inventory import extended_queries
    from ago_sisdb_spark.session import get_spark

    # Dedicated warehouse so concurrently-running gates never share
    # artifact paths with the audit's build-if-missing entries.
    spark = get_spark(
        extra_conf={
            "spark.sql.warehouse.dir": os.path.abspath("spark-warehouse-audit")
        }
    )

    qs = dict(queries())
    qs.update(extended_queries())

    audited = failed = waived = 0
    errors: list[str] = []
    stale: list[str] = []
    for name, fn in sorted(qs.items()):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            errors.append(f"{name}: {type(exc).__name__}: {exc}")
            continue
        audited += 1
        allowed = WHITELIST.get(name, {})
        tripped: set[str] = set()
        for det, line in detect(plan):
            tripped.add(det)
            if det in allowed:
                waived += 1
                print(f"waived {name} [{det}] ({allowed[det]})")
            else:
                failed += 1
                print(f"FAIL   {name} [{det}] {line}")
        for det in allowed:
            if det not in tripped:
                stale.append(f"{name} [{det}]")
        if want_dupscans:
            d = dup_scans(plan)
            if d:
                print(f"dupscan {name} {d}")

    for s in stale:
        print(f"stale-waiver {s} — remove from WHITELIST")
    for e in errors:
        print(f"ERROR  {e}")
    print(
        f"plan audit: {audited} audited, {failed} violations, "
        f"{waived} waived, {len(stale)} stale waivers, {len(errors)} errors"
    )
    return 1 if (failed or stale or errors) else 0


if __name__ == "__main__":
    sys.exit(main())
