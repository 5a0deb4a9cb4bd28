"""Local replica of the driver's t2 correctness gate.

Runs every registered query on Spark AND its DuckDB oracle over the same
parquet tables, then compares row count, schema arity, and an
order-insensitive value hash (columns sorted by name, rows sorted by their
stringified form). Use this BEFORE the driver does.

Usage: python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def normalize_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 6))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows: list[tuple], colnames: list[str]) -> str:
    import hashlib

    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(normalize_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    import duckdb

    from eeecs485_p4_mapreduce_spark import get_spark
    from eeecs485_p4_mapreduce_spark.catalog import TABLES, table_path
    from eeecs485_p4_mapreduce_spark.registry import ORACLES, QUERIES, load_all

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    load_all()
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    results: dict[str, dict] = {}
    failed = []
    for name, fn in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        entry: dict = {}
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            entry["spark_rows"] = len(s_rows)
        except Exception as e:  # noqa: BLE001
            entry["spark_error"] = f"{type(e).__name__}: {str(e)[:300]}"
            results[name] = entry
            failed.append(name)
            print(f"FAIL {name}: spark error {entry['spark_error']}")
            continue
        if name not in ORACLES:
            entry["status"] = "rows_only"
            results[name] = entry
            print(f"ok?  {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            rel = con.sql(ORACLES[name])
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            entry["oracle_error"] = f"{type(e).__name__}: {str(e)[:300]}"
            results[name] = entry
            failed.append(name)
            print(f"FAIL {name}: oracle error {entry['oracle_error']}")
            continue
        entry["oracle_rows"] = len(d_rows)
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount {len(s_rows)} != {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns {sorted(s_cols)} != {sorted(d_cols)}")
        else:
            sh, dh = table_hash(s_rows, s_cols), table_hash(d_rows, d_cols)
            if sh != dh:
                problems.append(f"value hash {sh} != {dh}")
        if problems:
            entry["status"] = "MISMATCH: " + "; ".join(problems)
            failed.append(name)
            print(f"FAIL {name}: {entry['status']}")
            if "hash" in entry["status"]:
                order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                s_set = sorted(
                    "\x1f".join(normalize_cell(r[i]) for i in order) for r in s_rows
                )
                dorder = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                d_set = sorted(
                    "\x1f".join(normalize_cell(r[i]) for i in dorder) for r in d_rows
                )
                s_only = [x for x in s_set if x not in set(d_set)][:3]
                d_only = [x for x in d_set if x not in set(s_set)][:3]
                for x in s_only:
                    print(f"    spark-only: {x[:160]}")
                for x in d_only:
                    print(f"    duck-only:  {x[:160]}")
        else:
            entry["status"] = "match"
            print(f"PASS {name} ({len(s_rows)} rows)")
        results[name] = entry

    print(json.dumps({"failed": failed, "n": len(results)}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
