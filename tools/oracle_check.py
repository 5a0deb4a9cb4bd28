"""Local replica of the driver's t2 correctness gate.

Runs every registered query on Spark AND its DuckDB oracle over the same
parquet tables, then compares row count, schema arity, and an
order-insensitive value hash. Use this BEFORE the driver does.

Byte-faithfulness (round-2 fix): the driver canonicalizes through PANDAS
(`sdf.toPandas()` / `rel.df()`, sort columns by name, `df.sort_values`,
stringify, hash). That path preserves dtype differences the old
fetchall-based normalizer masked — DuckDB HUGEINT (sum of BIGINT) lands in
pandas as float64/object, DECIMAL as decimal.Decimal — so `96` vs `96.0`
or `0.123` vs `Decimal('0.1230')` hash-mismatch even when values are
"equal". This replica reproduces that: no float->int collapse, no
rounding, and `sort_values` is called so list-typed output columns raise
the same TypeError the driver hits. Local green should predict driver
green.

Usage: python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def canon_cell(v) -> str:
    """Stringify one pandas cell with NO cross-type normalization."""
    import datetime
    import math

    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (np.floating,)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, np.ndarray):
        return "[" + ",".join(canon_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(v)
    # decimal.Decimal, str, bytes, pd.Timestamp all go through str() and
    # keep their type-specific rendering (trailing zeros included).
    return str(v)


def canon_lines(pdf) -> list[str]:
    """Driver-shaped canonicalization of a pandas DataFrame.

    Columns sorted by name; `sort_values` over all columns (raises
    TypeError for unhashable cells exactly like the driver); each row
    stringified; the line list re-sorted so the hash is order-insensitive
    even when sort_values tie-breaks differently across engines.
    """
    import pandas as pd  # noqa: F401

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf.columns) and len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    lines = [
        "\x1f".join(canon_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return sorted(lines)


def lines_hash(lines: list[str]) -> str:
    import hashlib

    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    import os

    import duckdb

    from eeecs485_p4_mapreduce_spark.catalog import TABLES, table_path
    from eeecs485_p4_mapreduce_spark.registry import ORACLES, QUERIES, load_all

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    load_all()
    if os.environ.get("SPARK_VANILLA") == "1":
        # Simulate the correctness driver's environment: a bare session
        # with NONE of our session-factory confs (AQE, Arrow, UTC, ...).
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle-check-vanilla")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from eeecs485_p4_mapreduce_spark import get_spark

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
            s_pd = sdf.toPandas()
            entry["spark_rows"] = len(s_pd)
        except Exception as e:  # noqa: BLE001
            entry["spark_error"] = f"{type(e).__name__}: {str(e)[:300]}"
            results[name] = entry
            failed.append(name)
            print(f"FAIL {name}: spark error {entry['spark_error']}")
            continue
        if name not in ORACLES:
            # rows-only queries still go through canonicalization so a
            # list-typed column fails HERE, not in the driver.
            try:
                canon_lines(s_pd)
                entry["status"] = "rows_only"
                print(f"ok?  {name}: rows-only ({len(s_pd)} rows)")
            except Exception as e:  # noqa: BLE001
                entry["status"] = f"canon_error: {type(e).__name__}: {str(e)[:200]}"
                failed.append(name)
                print(f"FAIL {name}: {entry['status']}")
            results[name] = entry
            continue
        try:
            rel = con.sql(ORACLES[name])
            d_pd = rel.df()
        except Exception as e:  # noqa: BLE001
            entry["oracle_error"] = f"{type(e).__name__}: {str(e)[:300]}"
            results[name] = entry
            failed.append(name)
            print(f"FAIL {name}: oracle error {entry['oracle_error']}")
            continue
        entry["oracle_rows"] = len(d_pd)
        problems = []
        if len(s_pd) != len(d_pd):
            problems.append(f"rowcount {len(s_pd)} != {len(d_pd)}")
        if sorted(s_pd.columns) != sorted(d_pd.columns):
            problems.append(
                f"columns {sorted(s_pd.columns)} != {sorted(d_pd.columns)}"
            )
        else:
            try:
                s_lines, d_lines = canon_lines(s_pd), canon_lines(d_pd)
            except Exception as e:  # noqa: BLE001
                problems.append(f"canon_error {type(e).__name__}: {str(e)[:200]}")
            else:
                if lines_hash(s_lines) != lines_hash(d_lines):
                    problems.append("value hash mismatch")
                    d_set = set(d_lines)
                    s_set = set(s_lines)
                    for x in [x for x in s_lines if x not in d_set][:3]:
                        print(f"    spark-only: {x[:160]}")
                    for x in [x for x in d_lines if x not in s_set][:3]:
                        print(f"    duck-only:  {x[:160]}")
        if problems:
            entry["status"] = "MISMATCH: " + "; ".join(problems)
            failed.append(name)
            print(f"FAIL {name}: {entry['status']}")
        else:
            entry["status"] = "match"
            print(f"PASS {name} ({len(s_pd)} rows)")
        results[name] = entry

    print(json.dumps({"failed": failed, "n": len(results)}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
