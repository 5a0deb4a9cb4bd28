#!/usr/bin/env python3
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly one JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total steady-state wall time of all headline queries: each
query runs twice and the faster run counts, so the number measures the
engine's throughput, not one-time JVM JIT / parquet-footer / plan-compile
overhead (a long-running cluster pays those once, not per query). Each run
executes to completion (count + first-row collect), not lazy plan
construction. Per-query cold times are reported alongside under
``queries_cold``.

Env knobs:
- SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
- SPARK_GRAFT_CPUS    (default *, used by session factory)
- BENCH_QUERIES       (comma list to restrict; default = headline set)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the flagship relational queries plus one representative from
# each extension family (dedup, similarity, text analysis, multimodal, MR
# parity). Kept small enough to run per-round; full coverage is the oracle
# gate's job, not the bench's.
#
# Timing caveat for the sketch queries (q26_approx_sketches,
# q59_rolling_distinct_sketch, reachable via BENCH_QUERIES): their
# REGISTERED plans run an exact verification branch alongside the sketch
# (that is what makes them oracle-checkable), so their bench numbers
# mostly measure the exact counterpart. The sketch-path cost alone is the
# private helpers _q26_sketch_vs_exact / _q59_sketch_rolling.
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_top_customers",
    "q08_customer_running_spend",
    "q14_promo_revenue",
    "q17_above_brand_average",
    "q18_events_hourly",
    "q22_asof_last_purchase",
    "q24_group_percentiles",
    "q28_window_rank_family",
    "q34_click_attribution",
    "q36_volume_shipping",
    "q37_product_profit",
    "q42_gap_fill_hourly",
    "q43_sliding_window_trend",
    "q56_rolling_distinct_users",
    "q57_peak_concurrency",
    "q66_incremental_rollup",
    "q67_range_join_buckets",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_cc_clusters",
    "dedup_chunk_shared",
    "dedup_embedding_cosine",
    "dedup_incremental",
    "sim_topk_bruteforce",
    "sim_ann_lsh",
    "sim_ivf_build",
    "sim_ivf_search",
    "sim_pq_search",
    "sim_kmeans_step",
    "ta_token_stats",
    "ta_tfidf_top_terms",
    "ta_gopher_repetition",
    "ta_pii_scrub",
    "mm_thumbnail",
    "skew_salted_enrich",
    "pipeline_curate",
    "mr_wordcount",
]


def _run_one(spark, fn, sf_dir: str, label: str = "") -> float:
    # Label the jobs (guide §1.5) so UI/event-log stages map back to
    # queries; description is driver-side metadata, timing-neutral. The
    # finally-reset (r14 advice) keeps follow-on tooling reusing this
    # SparkContext from inheriting the last query's label.
    spark.sparkContext.setJobDescription(f"bench:{label}" if label else None)
    try:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # Force ONE full execution of the plan. The noop sink materializes
        # every row without driver-side collection — unlike count()+collect()
        # which runs the plan twice and measures the driver round-trip.
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0
    finally:
        spark.sparkContext.setJobDescription(None)


def main() -> int:
    from eeecs485_p4_mapreduce_spark import get_spark
    from eeecs485_p4_mapreduce_spark.registry import QUERIES, load_all

    load_all()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    names = [
        q
        for q in os.environ.get("BENCH_QUERIES", ",".join(HEADLINE)).split(",")
        if q.strip()
    ]
    names = [q for q in names if q in QUERIES]

    spark = get_spark("bench")
    # Warm the JVM/session so the first measured query isn't paying JVM
    # startup + parquet footer caching for everyone.
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in names:
        try:
            t1 = _run_one(spark, QUERIES[name], sf_dir, f"{name}:cold")
            t2 = _run_one(spark, QUERIES[name], sf_dir, f"{name}:warm")
            cold[name] = round(t1, 3)
            timings[name] = round(min(t1, t2), 3)
        except Exception as exc:  # noqa: BLE001 — bench must always emit JSON
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            cold[name] = timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # Cold-run details go to a side file: the driver's stdout capture is
    # tail-truncated, so the one parsed line must stay small (<~1 KB).
    try:
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
        with open(detail_path, "w") as f:
            json.dump({"queries_cold": cold, "queries_warm": timings}, f, indent=1)
    except OSError:
        pass
    # The driver captures only the TAIL of stdout (~500 bytes in round 1,
    # which cut a 2.6 KB line mid-line and recorded "parsed": null), so
    # the one JSON line stays under ~450 bytes: the 10 slowest queries
    # inline, the full per-query map in BENCH_DETAIL.json.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "queries": {k: round(v, 2) for k, v in slowest.items()},
                "sf": sf_val,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()
    return 0 if all(t >= 0 for t in timings.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
