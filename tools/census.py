"""Full-registry timing census: run every registered query at a given
sf_dir, twice each (warm = the faster run), and write BENCH_FULL.json.

This is the whole-surface complement to bench.py's 40-query headline:
bench.py is the driver's per-round gate; the census is where per-query
regressions and scheduling-floor outliers show up. Pure timing — the
correctness gate is tools/oracle_check.py / the driver.

Usage: python tools/census.py [sf_dir] [note...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from eeecs485_p4_mapreduce_spark import get_spark
    from eeecs485_p4_mapreduce_spark.registry import QUERIES, load_all

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    note = " ".join(sys.argv[2:]) or f"Full-registry timing census at {sf_dir}"

    load_all()
    spark = get_spark("census")
    times: dict[str, float] = {}
    errors: list[str] = []
    for name, fn in sorted(QUERIES.items()):
        best = None
        for _ in range(2):
            t0 = time.time()
            try:
                fn(spark, sf_dir).count()
            except Exception as e:  # noqa: BLE001
                errors.append(f"{name}: {type(e).__name__}: {str(e)[:200]}")
                best = None
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            times[name] = round(best, 3)
            print(f"{best:7.2f}  {name}", flush=True)
    slowest = sorted(times.items(), key=lambda kv: -kv[1])[:10]
    record = {
        "note": note,
        "n_queries": len(QUERIES),
        "errors": errors,
        "total_warm_s": round(sum(times.values()), 1),
        "slowest": [[k, v] for k, v in slowest],
        "queries_warm": times,
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_FULL.json",
    )
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(
        f"census: {len(times)} queries, {len(errors)} errors, "
        f"{record['total_warm_s']} s warm total -> {out}"
    )
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
