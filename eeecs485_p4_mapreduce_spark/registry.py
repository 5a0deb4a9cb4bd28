"""Query registry: the single source of truth for the engine's query surface.

Operator modules register each query with an optional DuckDB oracle SQL
string; ``__spark_entry__`` re-exports the registry to the driver.

Conventions (driver contract, see repo root ``__spark_entry__.py``):

- every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver sorts columns by name before value-hashing);
- double-valued aggregates are ``round()``-ed on both sides so
  floating-point accumulation-order differences cannot flip the hash;
- timestamps that appear in output are formatted to strings on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query function, optionally with its DuckDB oracle SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator; the
    driver then records a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so their @query decorators run."""
    from eeecs485_p4_mapreduce_spark.operators import (  # noqa: F401
        dedup,
        multimodal,
        pipeline,
        relational,
        similarity,
        skew,
        text_analysis,
    )
    from eeecs485_p4_mapreduce_spark import mr_queries  # noqa: F401
    from eeecs485_p4_mapreduce_spark.streaming import queries  # noqa: F401
