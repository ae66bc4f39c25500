"""Property sweep for the beyond-equi join family (r12): seeded
pseudo-random trials of asof_join (all three directions, strict,
tolerance) and the binned keyless interval joins, each compared against
an independent brute-force plain-Python twin.

Batched in ONE Spark call per operator family with the trial id folded
into the join key — the house property-test pattern (test_dedup.py,
test_prep_extra.py): one Spark session per hypothesis example would be
prohibitive, and folding trials into the key exercises exactly the keyed
partitioning the operators rely on.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ago_sisdb_spark.operators.asof import asof_join
from ago_sisdb_spark.operators.intervaljoin import (
    bin_join_intervals,
    bin_join_points,
)

N_TRIALS = 60


def _asof_best(lt, rights, direction, strict):
    """Brute-force matched (rt, rv) tuple or None; rights have UNIQUE rt."""
    if direction == "backward":
        cands = [(rt, rv) for rt, rv in rights if (rt < lt if strict else rt <= lt)]
        return max(cands, key=lambda x: x[0]) if cands else None
    if direction == "forward":
        cands = [(rt, rv) for rt, rv in rights if (rt > lt if strict else rt >= lt)]
        return min(cands, key=lambda x: x[0]) if cands else None
    # nearest: closer side wins, tie -> backward
    b = _asof_best(lt, rights, "backward", strict)
    f = _asof_best(lt, rights, "forward", strict)
    if b is None:
        return f
    if f is None:
        return b
    return f if abs(f[0] - lt) < abs(b[0] - lt) else b


def _asof_twin(lt, rights, direction, strict, tolerance):
    best = _asof_best(lt, rights, direction, strict)
    if best is None:
        return None
    if tolerance is not None and abs(best[0] - lt) > tolerance:
        return None
    return best[1]


def test_asof_join_matches_bruteforce_all_directions(spark):
    """60 seeded trials × {backward, forward, nearest} × {strict,
    inclusive} × {tolerance, none}: the distributed union+window as-of
    equals the brute-force definition row for row.  Right timestamps are
    unique per (trial, key) so match identity is well-defined (equal-time
    tie pinning has its own dedicated tests in test_asof.py)."""
    rnd = np.random.RandomState(4712)
    configs = [
        (d, s, tol)
        for d in ("backward", "forward", "nearest")
        for s in (False, True)
        for tol in (None, 7)
    ]
    for direction, strict, tol in configs:
        lrows, rrows, expect = [], [], {}
        for t in range(N_TRIALS):
            key = f"t{t}"
            rts = sorted(
                int(x) for x in rnd.choice(200, rnd.randint(0, 9), replace=False)
            )
            rights = [(rt, rt * 1000 + t) for rt in rts]
            rrows += [(key, rt, rv) for rt, rv in rights]
            for i in range(rnd.randint(1, 7)):
                lt = int(rnd.randint(0, 210))
                lid = t * 100 + i
                lrows.append((key, lt, lid))
                expect[lid] = _asof_twin(lt, rights, direction, strict, tol)
        left = spark.createDataFrame(lrows, "k string, ts long, lid long")
        right = spark.createDataFrame(rrows, "k string, ts long, rv long")
        got = {
            r["lid"]: r["asof_rv"]
            for r in asof_join(
                left, right, ["k"], "ts", ["rv"],
                strict=strict,
                tolerance=None if tol is None else F.lit(tol),
                direction=direction,
            ).collect()
        }
        assert set(got) == set(expect), (direction, strict, tol)
        bad = {k: (got[k], expect[k]) for k in expect if got[k] != expect[k]}
        assert not bad, (direction, strict, tol, dict(list(bad.items())[:5]))


def test_bin_join_points_matches_bruteforce(spark):
    """Seeded random intervals × points at several bin widths: the
    bin-replicated equi join equals the brute-force containment set with
    every match produced exactly once (negative lows included — the
    _floor_bin floor-semantics path)."""
    rnd = np.random.RandomState(913)
    for width in (1, 3, 10, 64):
        irows, prows = [], []
        for t in range(N_TRIALS):
            for i in range(rnd.randint(0, 5)):
                lo = int(rnd.randint(-50, 150))
                hi = lo + int(rnd.randint(0, 40))
                irows.append((t, t * 100 + i, lo, hi))
            for j in range(rnd.randint(0, 8)):
                prows.append((t, t * 100 + j, int(rnd.randint(-60, 200))))
        want = sorted(
            (t, iid, pid)
            for (t, iid, lo, hi) in irows
            for (pt, pid, p) in prows
            if pt == t and lo <= p <= hi
        )
        iv = spark.createDataFrame(irows, "trial long, iid long, lo long, hi long")
        pt_df = spark.createDataFrame(prows, "trial long, pid long, p long")
        got = sorted(
            (r["trial"], r["iid"], r["pid"])
            for r in bin_join_points(
                iv, pt_df, "lo", "hi", "p", width, keys=["trial"]
            ).collect()
        )
        assert got == want, (width, len(got), len(want))


def test_bin_join_intervals_matches_bruteforce(spark):
    """Seeded random interval × interval overlap at several bin widths:
    each overlapping pair appears EXACTLY once (the first-shared-bin
    dedup), matching the brute-force overlap predicate."""
    rnd = np.random.RandomState(1117)
    for width in (2, 7, 32):
        lrows, rrows = [], []
        for t in range(N_TRIALS):
            for i in range(rnd.randint(0, 4)):
                lo = int(rnd.randint(-40, 120))
                lrows.append((t, t * 100 + i, lo, lo + int(rnd.randint(0, 30))))
            for j in range(rnd.randint(0, 4)):
                lo = int(rnd.randint(-40, 120))
                rrows.append((t, t * 100 + j, lo, lo + int(rnd.randint(0, 30))))
        want = sorted(
            (t, lid, rid)
            for (t, lid, llo, lhi) in lrows
            for (rt, rid, rlo, rhi) in rrows
            if rt == t and llo <= rhi and rlo <= lhi
        )
        lv = spark.createDataFrame(lrows, "trial long, lid long, llo long, lhi long")
        rv = spark.createDataFrame(rrows, "trial long, rid long, rlo long, rhi long")
        rows = bin_join_intervals(
            lv, rv, "llo", "lhi", "rlo", "rhi", width, keys=["trial"]
        ).collect()
        got = sorted((r["trial"], r["lid"], r["rid"]) for r in rows)
        assert len(got) == len(set(got)), width  # exactly-once
        assert got == want, (width, len(got), len(want))
