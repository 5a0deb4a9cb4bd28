"""Query-runner CLI — the analytics-engine counterpart to mrlite's
``mapreduce-submit`` surface (reference: mapreduce/submit.py is the only
user-facing entry point of the reference; this is ours for the DataFrame
engine).

Usage:
    python -m eeecs485_p4_mapreduce_spark list
    python -m eeecs485_p4_mapreduce_spark run QUERY [QUERY ...] \
        [--sf-dir DIR] [--limit N] [--explain] [--oracle]
    python -m eeecs485_p4_mapreduce_spark sql "SELECT ..." \
        [--sf-dir DIR] [--limit N] [--explain]

``run --oracle`` executes the query on Spark AND its DuckDB oracle SQL and
reports the driver-style match verdict; ``--explain`` prints the formatted
physical plan instead of rows. ``sql`` registers every catalog table
(region nation customer supplier part orders lineitem events documents
embeddings) as a temp view and runs arbitrary Spark SQL against them —
the ad-hoc surface on top of the same scan layer the named queries use.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="p4spark", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    run = sub.add_parser("run", help="run one or more queries")
    run.add_argument("queries", nargs="+")
    run.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    run.add_argument("--limit", type=int, default=20)
    run.add_argument("--explain", action="store_true")
    run.add_argument("--oracle", action="store_true")
    sql = sub.add_parser("sql", help="run ad-hoc Spark SQL over the catalog")
    sql.add_argument("statement")
    sql.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    sql.add_argument("--limit", type=int, default=20)
    sql.add_argument("--explain", action="store_true")
    args = parser.parse_args(argv)

    if args.cmd == "sql":
        from eeecs485_p4_mapreduce_spark import get_spark
        from eeecs485_p4_mapreduce_spark.catalog import register_views

        spark = get_spark("p4spark-sql")
        register_views(spark, args.sf_dir)
        df = spark.sql(args.statement)
        if args.explain:
            from eeecs485_p4_mapreduce_spark.plans.explain import formatted_plan

            print(formatted_plan(df))
        else:
            df.show(args.limit, truncate=False)
        return 0

    from eeecs485_p4_mapreduce_spark.registry import ORACLES, QUERIES, load_all

    load_all()
    if args.cmd == "list":
        for name in sorted(QUERIES):
            marker = "oracle" if name in ORACLES else "rows-only"
            print(f"{name:32s} [{marker}]")
        return 0

    unknown = [q for q in args.queries if q not in QUERIES]
    if unknown:
        print(f"unknown queries: {', '.join(unknown)}", file=sys.stderr)
        return 2

    from eeecs485_p4_mapreduce_spark import get_spark

    spark = get_spark("p4spark-cli")
    rc = 0
    for name in args.queries:
        df = QUERIES[name](spark, args.sf_dir)
        if args.explain:
            from eeecs485_p4_mapreduce_spark.plans.explain import formatted_plan

            print(f"== {name} ==")
            print(formatted_plan(df))
            continue
        if args.oracle:
            if name not in ORACLES:
                print(f"{name}: NO-ORACLE (rows={df.count()})")
                continue
            import duckdb

            from eeecs485_p4_mapreduce_spark.catalog import TABLES, table_path

            sys.path.insert(0, "tools")
            from oracle_check import canon_lines, lines_hash

            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM"
                    f" read_parquet('{table_path(args.sf_dir, t)}')"
                )
            s_pd = df.toPandas()
            rel = con.sql(ORACLES[name])
            d_pd = rel.df()
            ok = (
                len(s_pd) == len(d_pd)
                and sorted(s_pd.columns) == sorted(d_pd.columns)
                and lines_hash(canon_lines(s_pd)) == lines_hash(canon_lines(d_pd))
            )
            con.close()
            print(f"{name}: {'PASS' if ok else 'FAIL'} ({len(s_pd)} rows)")
            rc = rc if ok else 1
            continue
        print(f"== {name} ==")
        df.show(args.limit, truncate=False)
    return rc


if __name__ == "__main__":
    sys.exit(main())
