"""Driver-environment parity: the correctness driver builds its OWN
vanilla SparkSession (no configs from our session factory) and calls
`queries()` entries with it. Round 1 failed every events query this way
(nanos conf was session-build-time only). This test reproduces that
environment in a subprocess — a bare local session, no
eeecs485_p4_mapreduce_spark.session involvement — and runs the
conf-sensitive query families end-to-end."""

from __future__ import annotations

import json
import subprocess
import sys

SCRIPT = r"""
import json, sys
from pyspark.sql import SparkSession

# EXACTLY a vanilla session: no AQE/Arrow/timezone/nanos confs of ours.
spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla-driver-sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
sys.path.insert(0, ".")
import __spark_entry__ as se

qs = se.queries()
results = {}
for name in [
    "q18_events_hourly",      # events ts normalization
    "q22_asof_last_purchase", # events + window
    "mm_payload_stats",       # binary mapInPandas without our Arrow conf
    "sim_topk_bruteforce",    # array folds
    "stream_hourly_finalized",# streaming on a vanilla session
    "dedup_exact",
]:
    df = qs[name](spark, "/root/testdata/sf0.001")
    results[name] = df.count()
print("VANILLA_RESULTS:" + json.dumps(results))
"""


def test_queries_run_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("VANILLA_RESULTS:")
    ]
    assert line, proc.stdout[-2000:]
    results = json.loads(line[0].split(":", 1)[1])
    assert all(n > 0 for n in results.values()), results
