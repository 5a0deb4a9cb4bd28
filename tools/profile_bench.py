#!/usr/bin/env python3
"""Per-query profile of the headline bench set (guide §1: measure first).

For each query: plan-construction time (the ``fn(spark, sf_dir)`` call,
which for a few queries includes eager work — .first()/localCheckpoint/
index writes), noop-sink execution time (cold + warm), and the number of
Spark jobs each phase launched (scheduler overhead is the dominant cost
at sf0.1, so job count is the first-order metric to shrink).

Optionally dumps .explain("formatted") per query with --plans DIR.

Usage:
    python tools/profile_bench.py [--plans plans/r14] [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None, help="dir for explain dumps")
    ap.add_argument("--queries", default=None, help="comma list override")
    ap.add_argument("--suffix", default="before", help="plan file suffix")
    args = ap.parse_args()

    from eeecs485_p4_mapreduce_spark import get_spark
    from eeecs485_p4_mapreduce_spark.registry import QUERIES, load_all

    load_all()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = (args.queries.split(",") if args.queries else HEADLINE)
    names = [n for n in names if n in QUERIES]

    spark = get_spark("profile")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()  # warm JVM

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    def n_jobs() -> int:
        return len(sc.statusTracker().getJobIdsForGroup(None))

    rows = []
    for name in names:
        sc.setJobDescription(f"profile:{name}")
        j0, t0 = n_jobs(), time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        t_build = time.perf_counter() - t0
        j_build = n_jobs() - j0

        if args.plans:
            try:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:
                import io
                from contextlib import redirect_stdout

                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)

        j1, t1 = n_jobs(), time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_cold = time.perf_counter() - t1
        j_exec = n_jobs() - j1

        t2 = time.perf_counter()
        df2 = QUERIES[name](spark, sf_dir)
        df2.write.format("noop").mode("overwrite").save()
        t_warm = time.perf_counter() - t2

        rows.append(
            {
                "query": name,
                "build_s": round(t_build, 3),
                "exec_cold_s": round(t_cold, 3),
                "rerun_warm_s": round(t_warm, 3),
                "jobs_build": j_build,
                "jobs_exec": j_exec,
            }
        )
        print(
            f"{name:32s} build {t_build:6.2f}s ({j_build:3d} jobs)  "
            f"exec {t_cold:6.2f}s ({j_exec:3d} jobs)  warm {t_warm:6.2f}s",
            file=sys.stderr,
        )

    out = {
        "sf_dir": sf_dir,
        "total_warm": round(sum(r["rerun_warm_s"] for r in rows), 2),
        "rows": sorted(rows, key=lambda r: -r["rerun_warm_s"]),
    }
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
