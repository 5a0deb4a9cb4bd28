"""Plan-quality assertions: the 100 TB design rules, made checkable.

Every rule here is one the operator modules claim to follow (filters reach
the parquet scan, projections prune columns, dimensions broadcast, no
superfluous exchanges). Tests call these against the actual physical plan
so a regression that silently de-optimizes a query fails CI, not the
cluster bill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """The parquet scan must carry a pushed filter mentioning fragment."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return
    raise AssertionError(
        f"no pushed filter containing {fragment!r}; plan:\n{plan}"
    )


def assert_read_schema_only(df: DataFrame, columns: set[str]) -> None:
    """The scan's ReadSchema must contain exactly `columns` (column
    pruning reached the reader)."""
    import re

    plan = formatted_plan(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, f"no ReadSchema in plan:\n{plan}"
    for schema in schemas:
        read_cols = {
            c.split(":")[0].strip() for c in schema.split(",") if c.strip()
        }
        if read_cols <= columns:
            return
    raise AssertionError(
        f"no scan reads only {sorted(columns)}; found {schemas}"
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"no broadcast join in plan:\n{plan}"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (excludes
    broadcast exchanges, which don't move the fact table). Counts the
    numbered node headers so tree + detail sections aren't double-counted."""
    import re

    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.MULTILINE))


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """Formatted plans mark codegen membership per-node as
    ``[codegen id : N]`` (the literal 'WholeStageCodegen' only appears in
    the simple-mode tree)."""
    plan = formatted_plan(df)
    assert "codegen id" in plan, f"no codegen spans:\n{plan}"
