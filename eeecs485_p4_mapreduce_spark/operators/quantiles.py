"""Exact equi-depth quantile thresholds, assembled scale-safely.

The naive tiling operator — ``ntile(k) OVER (ORDER BY v)`` — funnels the
ENTIRE relation through one task (a partitionless global-sort Window): a
scale-killer the moment the per-key relation stops fitting one executor.
This module provides the broadcast-threshold replacement used by the
decile/quintile queries (q85 decile lift, q87 RFM): compute the k-1 exact
empirical quantile boundaries

    t_j = min { v : cm(v) * k >= n * j },   j = 1 .. k-1

where ``cm(v)`` is the cumulative count of rows with value <= v and ``n``
the total — then broadcast the tiny threshold array and score each row by
counting thresholds strictly below its value. Ties share a bucket (the
semantic difference vs ntile's arbitrary tie-splitting: here equal inputs
ALWAYS get equal scores, which is what a segmentation actually wants).

Scale design — no single-partition Window anywhere:

1. value-domain histogram: ``groupBy(v) -> cnt`` (map-side combinable);
2. within-bucket running counts: a Window PARTITIONED BY the coarse
   bucket ``floor(v / bucket_width)`` — each partition holds at most
   ``bucket_width`` distinct values, so no task sees unbounded input;
3. cross-bucket prefix totals: computed HIERARCHICALLY — a second
   window over bucket totals partitioned by the super-bucket
   ``floor(b / super_width)`` (<= super_width rows per partition), then
   a broadcast non-equi self-join only over the SUPER-bucket totals
   (B / super_width rows). With B populated buckets the non-equi step
   is O((B/super_width)^2) instead of O(B^2): at B ~ 1e6 buckets that
   is ~1e6 pairs, not 1e12;
4. every distinct value emits exactly the j's it bounds via integer
   interval arithmetic (``(cm_prev*k) div n + 1 .. (cm*k) div n``), so
   there is no k-way row blow-up before the final fold;
5. the <= k-1 winners fold into ONE array row, broadcast to the scorer.

BIGINT-exact throughout: the largest intermediate is ``cm * k <= n * k``
(n ~ 1e13 rows at 100 TB, k <= 10 -> ~1e14, far below 2^63).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_thresholds(
    df: DataFrame,
    value_col: str,
    k: int,
    bucket_width: int = 1 << 20,
    super_width: int = 1 << 10,
) -> DataFrame:
    """One-row DataFrame with ``thr``: the ascending k-1 exact equi-depth
    boundaries of ``df[value_col]`` (BIGINT-valued, NULLs ignored — the
    empirical distribution is over the non-null rows, matching
    ``oracle_threshold_cte``). See module docstring for the scale
    argument.
    """
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # exact floor-division bucket ids (work for negative v too)
    hist = hist.withColumn(
        "b",
        F.expr(
            f"CASE WHEN v >= 0 THEN v div {bucket_width} "
            f"ELSE ((v + 1) div {bucket_width}) - 1 END"
        ),
    )
    # The histogram feeds three branches (within-bucket cumsum, bucket
    # totals, grand total); materializing it (it is value-domain-sized,
    # tiny next to the input) keeps the expensive input aggregation to
    # ONE scan instead of three recomputations — the q98 localCheckpoint
    # precedent.
    hist = hist.localCheckpoint(eager=False)
    wcum = hist.withColumn(
        "wcum", F.sum("cnt").over(Window.partitionBy("b").orderBy("v"))
    )
    # Hierarchical cross-bucket prefix: window within super-buckets
    # (bounded partitions), non-equi join only across super-bucket
    # totals — O((B/super_width)^2) pairs instead of O(B^2).
    btot = hist.groupBy("b").agg(F.sum("cnt").alias("bt")).withColumn(
        "sb",
        F.expr(
            f"CASE WHEN b >= 0 THEN b div {super_width} "
            f"ELSE ((b + 1) div {super_width}) - 1 END"
        ),
    )
    wb = btot.withColumn(
        "wbt",
        F.sum("bt").over(Window.partitionBy("sb").orderBy("b"))
        - F.col("bt"),
    )
    stot = btot.groupBy("sb").agg(F.sum("bt").alias("st"))
    # renamed copy: avoids Spark's ambiguous-self-join analysis failure
    sprior = stot.select(F.col("sb").alias("ps"), F.col("st").alias("pst"))
    spre = (
        stot.join(F.broadcast(sprior), F.col("ps") < F.col("sb"), "left")
        .groupBy("sb")
        .agg(F.coalesce(F.sum("pst"), F.lit(0)).alias("spre"))
    )
    bpre = wb.join(F.broadcast(spre), "sb").select(
        "b", (F.col("spre") + F.col("wbt")).alias("bpre")
    )
    tot = hist.agg(F.sum("cnt").alias("n"))
    cm = (
        wcum.join(F.broadcast(bpre), "b")
        .crossJoin(F.broadcast(tot))
        .withColumn("cm", F.col("bpre") + F.col("wcum"))
    )
    bounds = cm.select(
        "v",
        F.expr(f"((cm - cnt) * {k}) div n + 1").alias("j_lo"),
        F.least(F.expr(f"(cm * {k}) div n"), F.lit(k - 1)).alias("j_hi"),
    ).filter(F.col("j_hi") >= F.col("j_lo"))
    thr = bounds.select(
        F.explode(F.expr("sequence(j_lo, j_hi)")).alias("j"), "v"
    )
    return thr.groupBy().agg(
        F.expr(
            "transform(sort_array(collect_list(struct(j, v))), x -> x.v)"
        ).alias("thr")
    )


def bucket_score(
    value: Column | str, thr_col: str, k: int, descending: bool = False
) -> Column:
    """Quantile-bucket score of ``value`` against a broadcast ``thr``
    array: ascending -> 1 + #{t < value} (largest values score k);
    descending -> k - #{t < value} (largest values score 1, the
    ``ORDER BY v DESC`` tiling convention)."""
    v = F.col(value) if isinstance(value, str) else value
    below = F.size(F.filter(F.col(thr_col), lambda t: v > t))
    score = (F.lit(k) - below) if descending else (F.lit(1) + below)
    return score.cast("long")


def oracle_threshold_cte(src: str, col: str, k: int, name: str) -> str:
    """DuckDB CTE chain computing the same thresholds as
    ``exact_thresholds`` (one LIST row named ``{name}.thr``); append to a
    WITH list. The oracle may use the plain global window — it only runs
    at oracle scale."""
    return f"""{name}_hist AS (
      SELECT {col} AS v, CAST(count(*) AS BIGINT) AS cnt
      FROM {src} WHERE {col} IS NOT NULL GROUP BY 1
    ), {name}_cum AS (
      SELECT v, sum(cnt) OVER (ORDER BY v) AS cm,
             sum(cnt) OVER () AS n
      FROM {name}_hist
    ), {name}_min AS (
      SELECT j.j, min(c.v) AS t
      FROM {name}_cum c
      CROSS JOIN (SELECT unnest(range(1, {k})) AS j) j
      WHERE c.cm * {k} >= c.n * j.j
      GROUP BY j.j
    ), {name} AS MATERIALIZED (
      SELECT list(t ORDER BY j) AS thr FROM {name}_min
    )"""


def oracle_bucket_score(value: str, thr: str, k: int, descending: bool = False) -> str:
    """DuckDB scoring expression matching ``bucket_score``."""
    below = f"len(list_filter({thr}, x -> {value} > x))"
    expr = f"{k} - {below}" if descending else f"1 + {below}"
    return f"CAST({expr} AS BIGINT)"


def exact_thresholds_grouped(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int,
    bucket_width: int = 1 << 20,
    super_width: int = 1 << 10,
) -> DataFrame:
    """Per-group variant of :func:`exact_thresholds`: one row per
    ``group_col`` value with that group's ascending k-1 exact
    equi-depth boundaries in ``thr``. Every window below simply adds
    the group key to its PARTITION BY, so the per-task bounds are the
    same as the ungrouped pipeline's — and a caller with several
    dimensions to tile (q87's R/F/M) melts them into one (dim, value)
    relation and runs ONE pipeline instead of one per dimension (the
    ungrouped form cost ~8 tiny exchanges per call; three calls tripled
    every stage)."""
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hist = hist.withColumn(
        "b",
        F.expr(
            f"CASE WHEN v >= 0 THEN v div {bucket_width} "
            f"ELSE ((v + 1) div {bucket_width}) - 1 END"
        ),
    ).localCheckpoint(eager=False)
    wcum = hist.withColumn(
        "wcum",
        F.sum("cnt").over(Window.partitionBy("g", "b").orderBy("v")),
    )
    btot = hist.groupBy("g", "b").agg(F.sum("cnt").alias("bt")).withColumn(
        "sb",
        F.expr(
            f"CASE WHEN b >= 0 THEN b div {super_width} "
            f"ELSE ((b + 1) div {super_width}) - 1 END"
        ),
    )
    wb = btot.withColumn(
        "wbt",
        F.sum("bt").over(Window.partitionBy("g", "sb").orderBy("b"))
        - F.col("bt"),
    )
    stot = btot.groupBy("g", "sb").agg(F.sum("bt").alias("st"))
    sprior = stot.select(
        F.col("g").alias("pg"), F.col("sb").alias("ps"),
        F.col("st").alias("pst"),
    )
    spre = (
        stot.join(
            F.broadcast(sprior),
            (F.col("pg") == F.col("g")) & (F.col("ps") < F.col("sb")),
            "left",
        )
        .groupBy("g", "sb")
        .agg(F.coalesce(F.sum("pst"), F.lit(0)).alias("spre"))
    )
    bpre = wb.join(F.broadcast(spre), ["g", "sb"]).select(
        "g", "b", (F.col("spre") + F.col("wbt")).alias("bpre")
    )
    tot = hist.groupBy("g").agg(F.sum("cnt").alias("n"))
    cm = (
        wcum.join(F.broadcast(bpre), ["g", "b"])
        .join(F.broadcast(tot), "g")
        .withColumn("cm", F.col("bpre") + F.col("wcum"))
    )
    bounds = cm.select(
        "g",
        "v",
        F.expr(f"((cm - cnt) * {k}) div n + 1").alias("j_lo"),
        F.least(F.expr(f"(cm * {k}) div n"), F.lit(k - 1)).alias("j_hi"),
    ).filter(F.col("j_hi") >= F.col("j_lo"))
    thr = bounds.select(
        "g", F.explode(F.expr("sequence(j_lo, j_hi)")).alias("j"), "v"
    )
    return thr.groupBy("g").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(j, v))), x -> x.v)"
        ).alias("thr")
    ).withColumnRenamed("g", group_col)
