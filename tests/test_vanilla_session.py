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
    "stream_session_finalized",# session windows + scoped state partitions
    "mm_wav_energy",          # real WAV decode via mapInPandas, no Arrow conf
    "dedup_exact",
]:
    df = qs[name](spark, "/root/testdata/sf0.001")
    results[name] = df.count()
print("VANILLA_RESULTS:" + json.dumps(results))
"""


def test_oracle_gate_on_non_utc_vanilla_session():
    """The driver's vanilla session inherits the HOST timezone. The
    NTZ→LTZ events cast and every epoch bucket (unix_micros div,
    window(), date_format) run in session tz, so a non-UTC host would
    shift cohort/hour buckets vs the DuckDB oracle's tz-free epoch math
    unless catalog.load_table pins spark.sql.session.timeZone=UTC
    (runtime-settable, like nanosAsLong). Run the tz-sensitive queries
    through the real oracle gate with TZ=America/New_York."""
    import os

    env = dict(os.environ, TZ="America/New_York", SPARK_VANILLA="1")
    proc = subprocess.run(
        [
            sys.executable,
            "tools/oracle_check.py",
            "/root/testdata/sf0.001",
            "q18_events_hourly",
            "q19_sessionize",
            "q22_asof_last_purchase",
            "q57_peak_concurrency",
            "q70_cohort_ltv",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith('{"failed"')]
    assert line, proc.stdout[-2000:]
    assert json.loads(line[0])["failed"] == [], line[0]


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
