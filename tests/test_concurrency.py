"""Concurrency soak (r12, r11 verdict #8): the reference is a multi-client
server (`workers/sisdb_server`); our engine maps clients to one shared
SparkSession.  This pins that N headline queries submitted CONCURRENTLY on
one session — each in its own FAIR scheduler pool — return exactly their
serial results.

Runs in a subprocess because `spark.scheduler.mode` is a SparkContext conf
that must be set before the JVM context exists (the shared test fixture
owns the in-process session).  PySpark pins one JVM thread per Python
thread (PYSPARK_PIN_THREAD, default on since 3.2), so per-thread
`spark.scheduler.pool` local properties land on the right scheduler pool.

Scheduler config notes are in API.md §concurrency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SOAK = r'''
import json
import sys
import threading

sys.path.insert(0, {repo!r})

from ago_sisdb_spark.inventory import all_queries
from ago_sisdb_spark.session import get_spark

SF = "/root/testdata/sf0.001"
NAMES = [
    "q1_pricing_summary", "q3_shipping_priority", "a1_ohlcv_rollup",
    "j3_asof_join", "p6_last_per_key", "d1_dedup_exact",
    "t2_quality_score", "w1_window_suite",
]

spark = get_spark(
    app_name="concurrency_soak",
    extra_conf={{"spark.scheduler.mode": "FAIR"}},
)
assert spark.sparkContext.getConf().get("spark.scheduler.mode") == "FAIR"
queries = all_queries()


def frozen(df):
    # sorted tuple-of-rows snapshot; every driver query's output is
    # exact/rounded by the oracle-hash contract, so Spark-vs-Spark
    # equality is well-defined
    return sorted(tuple(r) for r in df.collect())


serial = {{n: frozen(queries[n](spark, SF)) for n in NAMES}}

results, errors = {{}}, {{}}


def run(name):
    try:
        # each client thread gets its own FAIR pool (created on first use)
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
        results[name] = frozen(queries[name](spark, SF))
    except Exception as e:  # surfaced via the errors dict + exit code
        errors[name] = repr(e)


threads = [threading.Thread(target=run, args=(n,)) for n in NAMES]
for t in threads:
    t.start()
for t in threads:
    t.join(300)

matches = {{n: results.get(n) == serial[n] for n in NAMES}}
print(json.dumps({{
    "n_queries": len(NAMES),
    "errors": errors,
    "matches": matches,
    "all_match": not errors and all(matches.values()),
}}))
sys.exit(0 if not errors and all(matches.values()) else 1)
'''


def test_concurrent_fair_pools_match_serial(tmp_path):
    script = tmp_path / "soak.py"
    script.write_text(_SOAK.format(repo=REPO))
    r = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True, text=True, timeout=900,
    )
    tail = "\n".join(
        (r.stdout + "\n" + r.stderr).strip().splitlines()[-15:]
    )
    assert r.returncode == 0, tail
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["all_match"] is True, out
    assert out["n_queries"] == 8


def test_reads_race_streaming_upserts_see_only_committed_batches(
    spark, tmp_path
):
    """r13 (r12 verdict #5): the reference's real workload is WRITES
    racing reads (set + get/sub) — one thread streams upserts via
    foreachBatch into a `SnapshotStore` (atomic manifest publish per
    micro-batch) while reader threads hammer `read()`.  Every observed
    snapshot must be EXACTLY a committed micro-batch boundary:

    - batch b inserts 10 rows of a new sym S{b} and overwrites the 5
      shared HOT rows with its own marker, so a torn read is detectable
      three ways: row count != 10·n_commits+5, a sym group with mixed
      or missing rows, or HOT rows disagreeing on their marker;
    - manifest version v ⇒ exactly v+1 committed batches' content;
    - versions observed by one reader never go backwards.

    This pins the T5/T8 isolation semantics documented in API.md
    §concurrency: readers see the table before or after a micro-batch
    commit, never mid-commit."""
    import threading
    import time

    from ago_sisdb_spark.streaming.snapshot import SnapshotStore
    from ago_sisdb_spark.streaming.write import TimeScale, upsert

    src = str(tmp_path / "in")
    store = SnapshotStore(str(tmp_path / "state"))
    n_batches = 6
    for b in range(n_batches):
        rows = [(f"S{b}", t, float(b)) for t in range(10)] + [
            ("HOT", t, float(b)) for t in range(5)
        ]
        spark.createDataFrame(
            rows, "sym string, t int, v double"
        ).coalesce(1).write.mode("append").parquet(src)

    def apply_batch(batch_df, batch_id):
        cur = store.read(spark)
        if cur is None:
            merged = batch_df.dropDuplicates(["sym", "t"])
        else:
            merged = upsert(cur, batch_df, ["sym"], "t", TimeScale.MINUTE)
        store.commit(merged, int(batch_id))
        store.prune(keep_last=4)  # bounded trail, production shape

    done = threading.Event()
    violations: list[str] = []
    observed: list[int] = []

    def reader(rid: int):
        last_version = -1
        while not done.is_set() or store.current_version() is None:
            snap = store.read(spark)
            if snap is None:
                time.sleep(0.02)
                continue
            v = store.current_version()
            rows = snap.collect()
            observed.append(v)
            if v < last_version:
                violations.append(f"r{rid}: version went back {last_version}->{v}")
            last_version = max(last_version, v)
            by_sym: dict[str, list] = {}
            for r in rows:
                by_sym.setdefault(r.sym, []).append(r)
            n_commits = len(by_sym) - 1  # minus HOT
            if len(rows) != 10 * n_commits + 5:
                violations.append(f"r{rid}: torn row count {len(rows)} for {n_commits} syms")
            hot = by_sym.get("HOT", [])
            if len(hot) != 5 or len({r.v for r in hot}) != 1:
                violations.append(f"r{rid}: torn HOT group {[(r.t, r.v) for r in hot]}")
            for sym, grp in by_sym.items():
                if sym == "HOT":
                    continue
                if len(grp) != 10 or {r.v for r in grp} != {float(sym[1:])}:
                    violations.append(f"r{rid}: torn sym {sym}")
            if done.is_set() and v == n_batches - 1:
                break
            time.sleep(0.01)

    readers = [
        threading.Thread(target=reader, args=(i,)) for i in range(3)
    ]
    for t in readers:
        t.start()
    q = (
        spark.readStream.schema("sym string, t int, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    done.set()
    for t in readers:
        t.join(120)

    assert not violations, violations[:5]
    assert observed, "readers never observed a committed snapshot"
    # quiescent state is exact: all batches' syms, HOT carries one marker
    final = store.read(spark).collect()
    assert store.current_version() == n_batches - 1
    syms = {r.sym for r in final}
    assert syms == {f"S{b}" for b in range(n_batches)} | {"HOT"}
    assert len(final) == 10 * n_batches + 5
    hot_marks = {r.v for r in final if r.sym == "HOT"}
    assert len(hot_marks) == 1 and hot_marks <= {float(b) for b in range(n_batches)}


def test_snapshot_store_contract(spark, tmp_path):
    """SnapshotStore unit contract: None before first commit, version
    monotonicity enforced, prune keeps current + keep_last and never the
    current version."""
    import pytest

    from ago_sisdb_spark.streaming.snapshot import SnapshotStore

    store = SnapshotStore(str(tmp_path / "snap"))
    assert store.read(spark) is None and store.current_version() is None
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    store.commit(df, 0)
    store.commit(df, 3)
    with pytest.raises(ValueError, match="must increase"):
        store.commit(df, 3)
    store.commit(df, 4)
    assert store.current_version() == 4
    assert [r.id for r in store.read(spark).collect()] == [1]
    pruned = store.prune(keep_last=1)
    assert pruned == [0]  # keeps v4 (current) + v3 (one predecessor)
