#!/usr/bin/env python3
"""Scaling probe: time a query subset at sf0.01 and sf0.1 (10x the rows)
in ONE warm session and report the wall-time ratio per query.

A ratio near 1 means fixed overhead dominates at this corpus size; near
10 means linear in data; well above 10 flags a super-linear stage (the
thing that kills a 100 TB run). Output: markdown table on stdout
(redirect to SCALING.md) + one JSON summary line on stderr.

Usage: python tools/scale_probe.py [q1,q2,... (default: bench headline)]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.01"
SF_LARGE = "/root/testdata/sf0.1"
DATA_RATIO = 10.0


def _time_one(spark, fn, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):  # warm min-of-2, like bench.py
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    from bench import HEADLINE

    from eeecs485_p4_mapreduce_spark import get_spark
    from eeecs485_p4_mapreduce_spark.registry import QUERIES, load_all

    load_all()
    names = (
        sys.argv[1].split(",") if len(sys.argv) > 1 else HEADLINE
    )
    names = [n for n in names if n in QUERIES]
    spark = get_spark("scale-probe")
    spark.range(1000).selectExpr("sum(id)").collect()

    rows = []
    for name in names:
        try:
            t_small = _time_one(spark, QUERIES[name], SF_SMALL)
            t_large = _time_one(spark, QUERIES[name], SF_LARGE)
            rows.append((name, t_small, t_large, t_large / max(t_small, 1e-9)))
        except Exception as exc:  # noqa: BLE001
            print(f"probe: {name} failed: {exc}", file=sys.stderr)

    print("# SCALING — wall-time ratio for 10x the data (sf0.01 -> sf0.1)")
    print()
    print("Warm min-of-2 per scale, one session, local[32], noop sink.")
    print("ratio ~1: overhead-bound at this size; ~10: linear; >>10: a")
    print("super-linear stage that needs attention before 100 TB.")
    print()
    print("| query | sf0.01 s | sf0.1 s | ratio |")
    print("|---|---|---|---|")
    for name, ts, tl, r in sorted(rows, key=lambda x: -x[3]):
        print(f"| {name} | {ts:.2f} | {tl:.2f} | {r:.1f} |")

    ratios = sorted(r for _, _, _, r in rows)
    summary = {
        "n": len(rows),
        "median_ratio": round(ratios[len(ratios) // 2], 2) if rows else None,
        "max_ratio": round(ratios[-1], 2) if rows else None,
        "data_ratio": DATA_RATIO,
    }
    print(json.dumps(summary), file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
