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
