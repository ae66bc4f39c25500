"""One-shot validation: pytest + correctness gate + schema alignment + bench.

Usage: python tools/run_all.py  — prints a PASS/FAIL line per stage and
exits non-zero if any stage fails.  The per-stage commands are exactly what
.claude/skills/verify documents; this is the convenience wrapper.

After the stages it prints the canonical COVERAGE.md header block computed
from the registry AND the just-finished gate run — paste it, never
hand-edit (r4 verdict #2: header counts drifted from HEAD because entries
landed after the numbers commit).
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

STAGES = [
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=no"]),
    ("correctness", [sys.executable, "tools/check_correctness.py"]),
    ("schema-alignment", [sys.executable, "tools/check_schema_alignment.py"]),
    ("plan-audit", [sys.executable, "tools/audit_plans.py"]),
    ("bench", [sys.executable, "bench.py"]),
]


def coverage_header(gate_tail: str | None) -> str:
    """The COVERAGE.md header numbers, computed — never hand-written."""
    from ago_sisdb_spark.inventory import (
        all_oracles,
        all_queries,
        extended_oracles,
        extended_queries,
    )

    n_drv = len(all_queries())
    n_drv_oracle = len(all_oracles())
    n_ext = len(extended_queries())
    n_ext_oracle = len(extended_oracles())
    lines = [
        "--- COVERAGE.md header numbers (computed; paste, never hand-edit) ---",
        f"driver-facing queries(): {n_drv} entries "
        f"({n_drv_oracle} oracle-backed, {n_drv - n_drv_oracle} rows-only)",
        f"extended entries: {n_ext} ({n_ext_oracle} oracle-backed)",
    ]
    if gate_tail:
        lines.append(f"local gate at sf0.01: {gate_tail}")
    return "\n".join(lines)


def main() -> int:
    # self-heal the untracked pre-commit hook (lost on any .git reset —
    # it vanished between rounds 8 and 9; tools/install_hooks.py)
    from install_hooks import ensure_hooks

    if ensure_hooks(ROOT):
        print("reinstalled .git/hooks/pre-commit")

    # --fast: the pre-commit smoke (import every module + analyze every
    # registry plan at sf0.001, no execution).  Exists because the r7
    # snapshot commit shipped a NameError that only full runs caught.
    if "--fast" in sys.argv:
        r = subprocess.run(
            [sys.executable, "tools/smoke_compile.py"], cwd=ROOT
        )
        return r.returncode

    failed = []
    gate_tail = None
    for name, cmd in STAGES:
        r = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
        tail = (r.stdout.strip().splitlines() or [""])[-1]
        status = "PASS" if r.returncode == 0 else "FAIL"
        # r6 verdict #2 regression tripwire: a production operator that
        # reintroduces an unpartitioned window shows up here as WindowExec's
        # single-partition warning in the gate/bench logs — fail the stage
        n_funnels = (r.stdout + r.stderr).count("No Partition Defined")
        if n_funnels and name in ("correctness", "bench"):
            status = "FAIL"
            tail += f"  [{n_funnels} unpartitioned-window warnings]"
            print(f"{status}  {name}: {tail}")
            failed.append(name)
            continue
        print(f"{status}  {name}: {tail}")
        if name == "correctness":
            gate_tail = tail
        if r.returncode != 0:
            failed.append(name)
    print(coverage_header(gate_tail))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
