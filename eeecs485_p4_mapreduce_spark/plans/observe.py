"""In-flight data-quality metrics via Spark's Observation API.

``df.observe`` attaches aggregate metrics that are computed DURING the
main action — at 100 TB this is the difference between free row/null
counters and a second full scan to compute them. The metrics ride the
existing exchange-free pipeline (they are accumulator-backed), so any
production job can report volume + completeness with zero extra I/O.

The reference has no metrics surface at all (SURVEY.md §2.8); this is
engine plumbing a real pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame, name: str = "quality", null_cols: tuple[str, ...] = ()
) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-column null-count metrics to ``df``.

    Returns the instrumented DataFrame and the Observation; after any
    action on the DataFrame, ``obs.get`` yields
    ``{"n_rows": ..., "nulls_<col>": ...}`` without a second job.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    return df.observe(obs, metrics[0], *metrics[1:]), obs
