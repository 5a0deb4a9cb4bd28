"""Shared Spark session + DuckDB oracle fixtures for the test suite."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from eeecs485_p4_mapreduce_spark import get_spark

    spark = get_spark("pytest")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    import duckdb

    from eeecs485_p4_mapreduce_spark.catalog import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    yield con
    con.close()


def assert_query_matches_oracle(spark, duck, sf_dir: str, name: str) -> None:
    """Driver-style compare: rowcount + column names + order-insensitive hash.

    Uses the same pandas-shaped canonicalization as tools/oracle_check.py
    (the round-2 byte-faithful replica of the driver's normalizer), so a
    test-suite pass predicts a driver pass.
    """
    sys.path.insert(0, str(REPO_ROOT / "tools"))
    from oracle_check import canon_lines, lines_hash

    from eeecs485_p4_mapreduce_spark.registry import ORACLES, QUERIES

    s_pd = QUERIES[name](spark, sf_dir).toPandas()
    rel = duck.sql(ORACLES[name])
    d_pd = rel.df()
    assert len(s_pd) == len(d_pd), f"{name}: rowcount {len(s_pd)} != {len(d_pd)}"
    assert sorted(s_pd.columns) == sorted(d_pd.columns), (
        f"{name}: columns {sorted(s_pd.columns)} != {sorted(d_pd.columns)}"
    )
    s_lines, d_lines = canon_lines(s_pd), canon_lines(d_pd)
    if lines_hash(s_lines) != lines_hash(d_lines):
        d_set, s_set = set(d_lines), set(s_lines)
        spark_only = [x for x in s_lines if x not in d_set][:3]
        duck_only = [x for x in d_lines if x not in s_set][:3]
        raise AssertionError(
            f"{name}: value hash mismatch\n  spark-only: {spark_only}\n"
            f"  duck-only:  {duck_only}"
        )
