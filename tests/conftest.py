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
    """Driver-style compare: rowcount + column names + order-insensitive hash."""
    sys.path.insert(0, str(REPO_ROOT / "tools"))
    from oracle_check import table_hash

    from eeecs485_p4_mapreduce_spark.registry import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(ORACLES[name])
    d_rows = rel.fetchall()
    assert len(s_rows) == len(d_rows), f"{name}: rowcount {len(s_rows)} != {len(d_rows)}"
    assert sorted(sdf.columns) == sorted(rel.columns), (
        f"{name}: columns {sorted(sdf.columns)} != {sorted(rel.columns)}"
    )
    assert table_hash(s_rows, sdf.columns) == table_hash(d_rows, rel.columns), (
        f"{name}: value hash mismatch"
    )
