"""One-shot validation: pytest + correctness gate + schema alignment + bench.

Usage: python tools/run_all.py  — prints a PASS/FAIL line per stage and
exits non-zero if any stage fails.  The per-stage commands are exactly what
.claude/skills/verify documents; this is the convenience wrapper.
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STAGES = [
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=no"]),
    ("correctness", [sys.executable, "tools/check_correctness.py"]),
    ("schema-alignment", [sys.executable, "tools/check_schema_alignment.py"]),
    ("bench", [sys.executable, "bench.py"]),
]


def main() -> int:
    failed = []
    for name, cmd in STAGES:
        r = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
        tail = (r.stdout.strip().splitlines() or [""])[-1]
        status = "PASS" if r.returncode == 0 else "FAIL"
        print(f"{status}  {name}: {tail}")
        if r.returncode != 0:
            failed.append(name)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
