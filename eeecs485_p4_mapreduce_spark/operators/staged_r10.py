"""REGISTERED batch (promoted via ``registry.load_all``; first driver
rows expected in CORRECTNESS_r08 — it was staged one judged round
earlier under the staging discipline below).

Staging discipline shared with operators/staged_r9.py: built, pytest
hash-checked against DuckDB (tests/test_staged_r10.py), plan-gate
compliant, and x10-probed BEFORE registration. Same contract as every
registered query: identical aliases both sides, round()-ed or
integer-exact outputs, no nullable hash-bearing columns.

Staged surface:

- ``q84_trend_regression`` — per-type daily-volume trend via EXACT
  integer OLS: slope/intercept from the closed-form normal equations
  over (day index, daily count) aggregates, kept in BIGINT micros
  end-to-end (no float sums anywhere, so shuffle order is irrelevant).
- ``q85_decile_lift`` — the marketing gains table: users are tiled
  into spend deciles by broadcast exact-quantile thresholds (tie-aware;
  see ``operators/quantiles.py`` — no partitionless ntile window) and
  each decile reports its conversion share and the cumulative lift
  curve in ppm.
- ``q86_pit_join`` — point-in-time (temporal) join: each event picks
  the dimension version valid AT ITS TIMESTAMP from a 3-version SCD-
  style tier table synthesized per user, then aggregates by tier — the
  feature-store backfill join (equi-key on user + range predicate on
  validity, never a cross join).
- ``curate_quota_apportion`` — Hamilton largest-remainder
  apportionment of a fixed 10,000-slot sampling budget across source
  domains proportional to their char mass: floor quotas plus +1 for
  the largest remainders, deterministic ties, Σquota == budget exactly
  (the property floats cannot give you).
- ``sim_mmr_rerank`` — Maximal Marginal Relevance diversification
  (Carbonell & Goldstein 1998): top-8 dot-product candidates per query
  are greedily re-ranked by λ·relevance − (1−λ)·max-similarity-to-
  selected (λ=0.7) for 5 rounds, entirely in integer micros after one
  shared rounding point; relevance uses raw dot, diversity uses
  pairwise cosine within the bounded candidate set (8×8 per query,
  never corpus-wide).
- ``ta_burstiness`` — corpus term burstiness: the variance-to-mean
  ratio (dispersion index) of per-document counts for the 15 most
  frequent tokens, zeros included, from exact integer sums (n·Σc²,
  (Σc)²) — the content-word vs function-word diagnostic corpus
  linguists run.
- ``mm_zip_shards`` — REAL ZIP archive walk: stored entries with real
  CRC-32s; the walker starts at the END (EOCD record), walks the
  central directory, cross-checks every local header field-for-field,
  and recomputes each CRC. Encoder cross-checked against stdlib
  zipfile in pytest.
- ``mm_flac_streaminfo`` — REAL FLAC metadata walk: big-endian
  bit-packed STREAMINFO (20-bit sample rate, 36-bit total samples
  crossing byte boundaries) plus the little-endian VORBIS_COMMENT
  block in the same file — the mixed-endian trap done faithfully.
- ``stream_new_users`` — streaming first-touch attribution: per-user
  min(first_ts) merged across micro-batches in foreachBatch (min is
  order- and batching-insensitive, so the replay is deterministic),
  finalized into an hourly new-users histogram. State is user-sized by
  the metric's nature — the docstring names the HLL-sketch fallback a
  100 TB deployment would swap in per retention window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eeecs485_p4_mapreduce_spark.catalog import load_table
from eeecs485_p4_mapreduce_spark.operators.quantiles import (
    bucket_score,
    exact_thresholds,
    oracle_bucket_score,
    oracle_threshold_cte,
)

# ---------------------------------------------------------------------------
# q84: exact integer OLS over daily volumes. Phase 1 aggregates events
# to (event_type, day) counts; phase 2 turns each type's daily series
# into the five OLS sufficient statistics (n, Σx, Σy, Σxy, Σxx) with x
# = whole days since the corpus min date (one broadcast scalar) — all
# BIGINT, so the normal-equation slope/intercept are exact integer
# ratios scaled to micros. No per-row state beyond the day histogram;
# the 100 TB plan is two keyed aggregations.
# ---------------------------------------------------------------------------
Q84_ORACLE = """
    WITH ref AS (SELECT CAST(min(ts) AS DATE) AS d0 FROM events),
    daily AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - d0 AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events, ref GROUP BY 1, 2
    ), stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n AS n_days, sy AS total_events,
           CAST(((n * sxy - sx * sy) * 1000000)
                // (n * sxx - sx * sx) AS BIGINT) AS slope_e6,
           CAST(((sy * sxx - sx * sxy) * 1000000)
                // (n * sxx - sx * sx) AS BIGINT) AS intercept_e6
    FROM stats WHERE n >= 2
"""


def q84_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BIGINT OLS slope/intercept of daily event volume per type
    (see section comment)."""
    events = load_table(spark, sf_dir, "events")
    ref = events.agg(F.to_date(F.min("ts")).alias("d0"))
    daily = (
        events.crossJoin(F.broadcast(ref))
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.col("d0")).cast("long").alias("x"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return stats.filter(F.col("n") >= 2).selectExpr(
        "event_type",
        "n AS n_days",
        "sy AS total_events",
        "((n * sxy - sx * sy) * 1000000) div (n * sxx - sx * sx)"
        " AS slope_e6",
        "((sy * sxx - sx * sxy) * 1000000) div (n * sxx - sx * sx)"
        " AS intercept_e6",
    )


# ---------------------------------------------------------------------------
# q85: decile gains table. Users collapse to one (spend, conversions)
# row each FIRST (the fact table never reaches any ranking step); the
# decile assignment is tie-aware broadcast-threshold tiling, NOT
# ntile — ntile's partitionless global-sort Window would funnel every
# user through one task (the round-6 verdict's scale-killer). The 9
# exact spend boundaries come from operators/quantiles.exact_thresholds
# (two-phase bucketed cumulative histogram, no single-partition
# Window); decile 1 = the top spend band (spend above all 9
# thresholds). Ties share a decile, so equal spenders always land in
# the same band. The cumulative lift column uses a running sum over
# the <= 10 decile rows (bounded relation — safe by construction).
# ---------------------------------------------------------------------------
Q85_ORACLE = f"""
    WITH per_user AS MATERIALIZED (
      SELECT user_id,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS spend_cents,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS conversions
      FROM events GROUP BY user_id
    ), {oracle_threshold_cte("per_user", "spend_cents", 10, "sthr")},
    tiled AS (
      SELECT u.*,
             {oracle_bucket_score("u.spend_cents", "t.thr", 10, descending=True)}
               AS decile
      FROM per_user u CROSS JOIN sthr t
    ), per_decile AS (
      SELECT decile,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(spend_cents) AS BIGINT) AS sum_cents,
             CAST(sum(conversions) AS BIGINT) AS n_conversions
      FROM tiled GROUP BY decile
    ), tot AS (SELECT sum(n_conversions) AS all_conv FROM per_decile)
    SELECT decile, n_users, sum_cents, n_conversions,
           CAST((sum(n_conversions)
                   OVER (ORDER BY decile) * 1000000)
                // greatest(all_conv, 1) AS BIGINT) AS cum_conv_ppm
    FROM per_decile, tot
"""


def q85_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-decile conversion gains table (see section comment)."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.sum(F.expr("cast(round(value * 100, 0) as bigint)")).alias(
            "spend_cents"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("long").alias("conversions"),
    )
    # per_user feeds both the threshold computation (which eagerly
    # materializes its histogram) and the scorer — checkpoint it so the
    # events aggregation runs once, not twice.
    per_user = per_user.localCheckpoint(eager=False)
    thr = exact_thresholds(per_user, "spend_cents", 10)
    tiled = per_user.crossJoin(F.broadcast(thr)).withColumn(
        "decile", bucket_score("spend_cents", "thr", 10, descending=True)
    )
    per_decile = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("spend_cents").alias("sum_cents"),
        F.sum("conversions").alias("n_conversions"),
    # <= 10 rows; feeds the conversion total AND the lift table — pin it
    # so the tiling aggregation runs once
    ).localCheckpoint(eager=False)
    tot = per_decile.agg(F.sum("n_conversions").alias("all_conv"))
    cum = F.sum("n_conversions").over(
        Window.orderBy("decile").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    return (
        per_decile.crossJoin(F.broadcast(tot))
        .withColumn("cum_conv", cum)
        .selectExpr(
            "decile",
            "n_users",
            "sum_cents",
            "n_conversions",
            "(cum_conv * 1000000) div greatest(all_conv, 1L)"
            " AS cum_conv_ppm",
        )
    )


# ---------------------------------------------------------------------------
# q86: point-in-time join — the feature-store backfill. A 3-version
# SCD-style tier dimension is synthesized per user from arithmetic both
# engines recompute: version v (0..2) of user u becomes valid at
# corpus_min_ts + v * (span/3) (integer microseconds) and carries tier
# (u*7 + v) % 100; version validity ends where the next begins, v=2 is
# open-ended. Each event must join THE version valid at its own ts —
# an equi-join on user_id plus a half-open range predicate, the classic
# temporal-join shape (at 100 TB: shuffle both sides on user_id; the
# per-user version list is 3 rows, so the range probe is bounded).
# ---------------------------------------------------------------------------
Q86_ORACLE = """
    WITH ref AS (
      SELECT epoch_us(min(ts)) AS t0,
             (epoch_us(max(ts)) - epoch_us(min(ts))) // 3 + 1 AS seg
      FROM events
    ), versions AS (
      SELECT u.user_id, v.v,
             t0 + v.v * seg AS valid_from_us,
             CASE WHEN v.v < 2 THEN t0 + (v.v + 1) * seg
                  ELSE 9223372036854775807 END AS valid_to_us,
             (u.user_id * 7 + v.v) % 100 AS tier
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN (SELECT unnest(range(3)) AS v) v, ref
    ), joined AS (
      SELECT e.user_id, e.value, d.tier
      FROM events e JOIN versions d
        ON e.user_id = d.user_id
       AND epoch_us(e.ts) >= d.valid_from_us
       AND epoch_us(e.ts) <  d.valid_to_us
    )
    SELECT tier // 10 AS tier_band,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM joined GROUP BY 1
"""


def q86_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (point-in-time) join of events against a synthesized
    3-version per-user dimension, aggregated by tier band (see section
    comment)."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    ref = events.agg(
        F.min("ts_us").alias("t0"),
        F.expr("(max(ts_us) - min(ts_us)) div 3 + 1").alias("seg"),
    )
    versions = (
        events.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(ref))
        .withColumn("v", F.explode(F.sequence(F.lit(0), F.lit(2))))
        .selectExpr(
            # renamed key: versions derive FROM events, so a shared
            # column name would trip Spark's ambiguous-self-join check
            "user_id AS d_user_id",
            "t0 + v * seg AS valid_from_us",
            "CASE WHEN v < 2 THEN t0 + (v + 1) * seg"
            " ELSE 9223372036854775807L END AS valid_to_us",
            "(user_id * 7 + v) % 100 AS tier",
        )
        .localCheckpoint(eager=False)
    )
    joined = events.join(
        versions,
        (events["user_id"] == versions["d_user_id"])
        & (events["ts_us"] >= versions["valid_from_us"])
        & (events["ts_us"] < versions["valid_to_us"]),
    ).select("user_id", "value", "tier")
    return (
        joined.groupBy(F.expr("tier div 10").alias("tier_band"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.expr("cast(round(value * 100, 0) as bigint)")).alias(
                "sum_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# curate_quota_apportion: Hamilton (largest-remainder) apportionment.
# A fixed sampling budget of 10,000 slots is split across source
# domains proportional to char mass: each source gets
# floor(B * chars / total) slots, then the B - Σfloor leftover slots go
# to the largest remainders (B * chars % total), ties broken by source
# name. Everything is BIGINT and Σquota == B EXACTLY — the property
# float shares cannot guarantee. The ranking window runs over the
# domain table (tens of rows at any corpus size), never documents.
# ---------------------------------------------------------------------------
APPORTION_BUDGET = 10_000

CURATE_APPORTION_ORACLE = f"""
    WITH domains AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY source
    ), tot AS (SELECT sum(chars) AS total FROM domains),
    based AS (
      SELECT source, chars,
             ({APPORTION_BUDGET} * chars) // total AS base_quota,
             ({APPORTION_BUDGET} * chars) % total AS rem
      FROM domains, tot
    ), ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, source) AS rem_rank,
             {APPORTION_BUDGET} - sum(base_quota) OVER () AS leftover
      FROM based
    )
    SELECT source, chars,
           CAST(base_quota AS BIGINT) AS base_quota,
           CAST(CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS extra,
           CAST(base_quota
                + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS quota
    FROM ranked
"""


def curate_quota_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder apportionment of a 10,000-slot budget across
    sources by char mass (see section comment)."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    domains = docs.groupBy("source").agg(F.sum("n_chars").alias("chars"))
    tot = domains.agg(F.sum("chars").alias("total"))
    based = domains.crossJoin(F.broadcast(tot)).selectExpr(
        "source",
        "chars",
        f"({APPORTION_BUDGET}L * chars) div total AS base_quota",
        f"({APPORTION_BUDGET}L * chars) % total AS rem",
    )
    w_rank = Window.orderBy(F.col("rem").desc(), F.col("source"))
    w_all = Window.partitionBy()
    ranked = based.withColumn(
        "rem_rank", F.row_number().over(w_rank)
    ).withColumn(
        "leftover",
        F.lit(APPORTION_BUDGET) - F.sum("base_quota").over(w_all),
    )
    return ranked.selectExpr(
        "source",
        "chars",
        "base_quota",
        "cast(CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END as bigint)"
        " AS extra",
        "base_quota + (CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END)"
        " AS quota",
    )


# ---------------------------------------------------------------------------
# sim_mmr_rerank: Maximal Marginal Relevance (Carbonell & Goldstein
# 1998) — the diversity re-rank every retrieval stack applies after
# ANN: greedily pick argmax of λ·rel(c) − (1−λ)·max_{s∈selected}
# sim(c, s). Here λ = 0.7, rel = query·candidate dot, sim = candidate-
# candidate cosine, BOTH rounded to integer micros at one shared point
# before any comparison, so the greedy argmax is pure BIGINT arithmetic
# and deterministic across engines (ties by candidate id). Candidates
# are the top-8 per query, so the pairwise sim matrix is 8×8 PER QUERY
# — bounded, never corpus-wide; the 4 selection rounds are unrolled
# joins over these tiny frames (the oracle unrolls the same 4 CTEs).
# ---------------------------------------------------------------------------
MMR_N_QUERIES = 5
MMR_CANDIDATES = 8
MMR_SELECT = 5
MMR_LAM_NUM = 7  # λ = 0.7 as the exact ratio 7/10
MMR_LAM_DEN = 10

_MMR_DOT = "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
_MMR_NORM = (
    "sqrt(list_dot_product({x}.embedding::DOUBLE[], {x}.embedding::DOUBLE[]))"
)

SIM_MMR_ORACLE = f"""
    WITH cand AS MATERIALIZED (
      SELECT * FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS cid,
               CAST(round({_MMR_DOT} * 1000000, 0) AS BIGINT) AS rel_e6,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_MMR_DOT} DESC, b.vec_id)
                 AS r
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {MMR_N_QUERIES}
      ) WHERE r <= {MMR_CANDIDATES}
    ), sims AS MATERIALIZED (
      SELECT c1.query_id, c1.cid AS cid_a, c2.cid AS cid_b,
             CAST(round({_MMR_DOT}
                        / ({_MMR_NORM.format(x="a")}
                           * {_MMR_NORM.format(x="b")}) * 1000000, 0)
                  AS BIGINT) AS sim_e6
      FROM cand c1 JOIN cand c2
        ON c1.query_id = c2.query_id AND c1.cid <> c2.cid
      JOIN embeddings a ON a.vec_id = c1.cid
      JOIN embeddings b ON b.vec_id = c2.cid
    ), s1 AS MATERIALIZED (
      SELECT query_id, cid, rel_e6, 1 AS sel_rank
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY rel_e6 DESC, cid) AS rr FROM cand)
      WHERE rr = 1
    ), s2 AS MATERIALIZED (
      SELECT query_id, cid, rel_e6, 2 AS sel_rank FROM (
        SELECT c.query_id, c.cid, c.rel_e6,
               row_number() OVER (PARTITION BY c.query_id ORDER BY
                 ({MMR_LAM_NUM} * c.rel_e6
                  - ({MMR_LAM_DEN} - {MMR_LAM_NUM}) * mx.ms)
                   // {MMR_LAM_DEN} DESC, c.cid) AS rr
        FROM cand c
        JOIN (SELECT s.query_id, si.cid_a AS cid, max(si.sim_e6) AS ms
              FROM s1 s JOIN sims si
                ON si.query_id = s.query_id AND si.cid_b = s.cid
              GROUP BY 1, 2) mx
          ON mx.query_id = c.query_id AND mx.cid = c.cid
        WHERE c.cid NOT IN (SELECT cid FROM s1 WHERE query_id = c.query_id)
      ) WHERE rr = 1
    ), s3 AS MATERIALIZED (
      SELECT query_id, cid, rel_e6, 3 AS sel_rank FROM (
        SELECT c.query_id, c.cid, c.rel_e6,
               row_number() OVER (PARTITION BY c.query_id ORDER BY
                 ({MMR_LAM_NUM} * c.rel_e6
                  - ({MMR_LAM_DEN} - {MMR_LAM_NUM}) * mx.ms)
                   // {MMR_LAM_DEN} DESC, c.cid) AS rr
        FROM cand c
        JOIN (SELECT sel.query_id, si.cid_a AS cid, max(si.sim_e6) AS ms
              FROM (SELECT query_id, cid FROM s1
                    UNION ALL SELECT query_id, cid FROM s2) sel
              JOIN sims si
                ON si.query_id = sel.query_id AND si.cid_b = sel.cid
              GROUP BY 1, 2) mx
          ON mx.query_id = c.query_id AND mx.cid = c.cid
        WHERE c.cid NOT IN (SELECT cid FROM s1 WHERE query_id = c.query_id
                            UNION ALL
                            SELECT cid FROM s2 WHERE query_id = c.query_id)
      ) WHERE rr = 1
    ), s4 AS MATERIALIZED (
      SELECT query_id, cid, rel_e6, 4 AS sel_rank FROM (
        SELECT c.query_id, c.cid, c.rel_e6,
               row_number() OVER (PARTITION BY c.query_id ORDER BY
                 ({MMR_LAM_NUM} * c.rel_e6
                  - ({MMR_LAM_DEN} - {MMR_LAM_NUM}) * mx.ms)
                   // {MMR_LAM_DEN} DESC, c.cid) AS rr
        FROM cand c
        JOIN (SELECT sel.query_id, si.cid_a AS cid, max(si.sim_e6) AS ms
              FROM (SELECT query_id, cid FROM s1
                    UNION ALL SELECT query_id, cid FROM s2
                    UNION ALL SELECT query_id, cid FROM s3) sel
              JOIN sims si
                ON si.query_id = sel.query_id AND si.cid_b = sel.cid
              GROUP BY 1, 2) mx
          ON mx.query_id = c.query_id AND mx.cid = c.cid
        WHERE c.cid NOT IN (SELECT cid FROM s1 WHERE query_id = c.query_id
                            UNION ALL
                            SELECT cid FROM s2 WHERE query_id = c.query_id
                            UNION ALL
                            SELECT cid FROM s3 WHERE query_id = c.query_id)
      ) WHERE rr = 1
    ), s5 AS (
      SELECT query_id, cid, rel_e6, 5 AS sel_rank FROM (
        SELECT c.query_id, c.cid, c.rel_e6,
               row_number() OVER (PARTITION BY c.query_id ORDER BY
                 ({MMR_LAM_NUM} * c.rel_e6
                  - ({MMR_LAM_DEN} - {MMR_LAM_NUM}) * mx.ms)
                   // {MMR_LAM_DEN} DESC, c.cid) AS rr
        FROM cand c
        JOIN (SELECT sel.query_id, si.cid_a AS cid, max(si.sim_e6) AS ms
              FROM (SELECT query_id, cid FROM s1
                    UNION ALL SELECT query_id, cid FROM s2
                    UNION ALL SELECT query_id, cid FROM s3
                    UNION ALL SELECT query_id, cid FROM s4) sel
              JOIN sims si
                ON si.query_id = sel.query_id AND si.cid_b = sel.cid
              GROUP BY 1, 2) mx
          ON mx.query_id = c.query_id AND mx.cid = c.cid
        WHERE c.cid NOT IN (SELECT cid FROM s1 WHERE query_id = c.query_id
                            UNION ALL
                            SELECT cid FROM s2 WHERE query_id = c.query_id
                            UNION ALL
                            SELECT cid FROM s3 WHERE query_id = c.query_id
                            UNION ALL
                            SELECT cid FROM s4 WHERE query_id = c.query_id)
      ) WHERE rr = 1
    )
    SELECT query_id, CAST(sel_rank AS BIGINT) AS sel_rank,
           cid AS vec_id, rel_e6
    FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
          UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
          UNION ALL SELECT * FROM s5)
"""


def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 per query over top-8 dot-product
    candidates (see section comment): one candidate window, one
    bounded pairwise-sim frame, then the 4 greedy
    (max-sim-to-selected, argmax) rounds folded ROW-LOCALLY over the
    per-query candidate/sim arrays in integer micros (r15 — the old
    unrolled join rounds each paid an eager checkpoint barrier)."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    ).withColumn(
        "norm",
        F.sqrt(
            F.expr(
                "aggregate(zip_with(v, v, (x, y) -> x * y),"
                " 0.0d, (acc, x) -> acc + x)"
            )
        ),
    )
    queries = emb.filter(F.col("vec_id") < MMR_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dot = F.expr(
        "aggregate(zip_with(qv, v, (x, y) -> x * y),"
        " 0.0d, (acc, x) -> acc + x)"
    )
    w_q = Window.partitionBy("query_id").orderBy(
        F.col("dot_raw").desc(), F.col("cid")
    )
    cand = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cid"),
            dot.alias("dot_raw"),
        )
        .withColumn("r", F.row_number().over(w_q))
        .filter(F.col("r") <= MMR_CANDIDATES)
        .select(
            "query_id",
            "cid",
            F.round(F.col("dot_raw") * 1_000_000, 0)
            .cast("long")
            .alias("rel_e6"),
        )
        .localCheckpoint(eager=False)  # reused by the sim frame and all 5 rounds
    )
    e_a = emb.select(
        F.col("vec_id").alias("cid_a"),
        F.col("v").alias("va"),
        F.col("norm").alias("na"),
    )
    e_b = emb.select(
        F.col("vec_id").alias("cid_b"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
    )
    pair_dot = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> x * y),"
        " 0.0d, (acc, x) -> acc + x)"
    )
    sims = (
        cand.select("query_id", F.col("cid").alias("cid_a"))
        .join(
            cand.select(
                F.col("query_id").alias("q2"), F.col("cid").alias("cid_b")
            ),
            (F.col("query_id") == F.col("q2"))
            & (F.col("cid_a") != F.col("cid_b")),
        )
        .join(e_a, "cid_a")
        .join(e_b, "cid_b")
        .select(
            "query_id",
            "cid_a",
            "cid_b",
            F.round(pair_dot / (F.col("na") * F.col("nb")) * 1_000_000, 0)
            .cast("long")
            .alias("sim_e6"),
        )
    )
    # r15: the 4 greedy rounds run ROW-LOCALLY inside one aggregation
    # (the PQ row-local rule) instead of 4 unrolled join rounds with an
    # eager localCheckpoint each — the loop was 38 sequential build
    # jobs at bench scale, each barrier re-materializing the chain.
    # Both state tables are bounded PER QUERY ({MMR_CANDIDATES}
    # candidates, {MMR_CANDIDATES}^2 sims), so collecting them to one
    # array-pair row per query is the same bound the old per-round
    # window partitions had; the greedy argmax chain is inherently
    # sequential, which makes it per-row compute, not dataflow. The
    # arithmetic inside the fold is byte-identical to the old round
    # loop: same integer micros, same `div`, same (mmr desc, cid)
    # tie-break — and every step is order-insensitive to collect_list
    # order (argmax by a total order; exists/filter set-membership).
    sel_cmp = (
        "(x, y) -> CASE WHEN x.rel_e6 > y.rel_e6 THEN -1"
        " WHEN x.rel_e6 < y.rel_e6 THEN 1"
        " WHEN x.cid < y.cid THEN -1 WHEN x.cid > y.cid THEN 1"
        " ELSE 0 END"
    )
    mmr_cmp = (
        "(x, y) -> CASE WHEN x.mmr > y.mmr THEN -1"
        " WHEN x.mmr < y.mmr THEN 1"
        " WHEN x.cid < y.cid THEN -1 WHEN x.cid > y.cid THEN 1"
        " ELSE 0 END"
    )
    ms_expr = (
        "array_max(transform(filter(sims,"
        " p -> p.cid_a = c.cid AND exists(acc, s -> s.cid = p.cid_b)),"
        " p -> p.sim_e6))"
    )
    step_expr = (
        "concat(acc, transform(slice(array_sort(transform("
        "filter(cands, c -> NOT exists(acc, s -> s.cid = c.cid)),"
        " c -> named_struct("
        f"'mmr', ({MMR_LAM_NUM}L * c.rel_e6"
        f" - {MMR_LAM_DEN - MMR_LAM_NUM}L * {ms_expr}) div {MMR_LAM_DEN}L,"
        " 'cid', c.cid, 'rel_e6', c.rel_e6)), "
        f"{mmr_cmp}), 1, 1),"
        " p -> named_struct('cid', p.cid, 'rel_e6', p.rel_e6,"
        " 'sel_rank', k)))"
    )
    greedy = (
        f"aggregate(sequence(2, {MMR_SELECT}), "
        f"transform(slice(array_sort(cands, {sel_cmp}), 1, 1),"
        " c -> named_struct('cid', c.cid, 'rel_e6', c.rel_e6,"
        " 'sel_rank', 1)), "
        f"(acc, k) -> {step_expr})"
    )
    cand_arr = cand.groupBy("query_id").agg(
        F.collect_list(F.struct("cid", "rel_e6")).alias("cands")
    )
    sims_arr = sims.groupBy("query_id").agg(
        F.collect_list(F.struct("cid_a", "cid_b", "sim_e6")).alias("sims")
    )
    return (
        cand_arr.join(sims_arr, "query_id")
        .select("query_id", F.explode(F.expr(greedy)).alias("s"))
        .select(
            "query_id",
            F.col("s.sel_rank").cast("long").alias("sel_rank"),
            F.col("s.cid").alias("vec_id"),
            F.col("s.rel_e6").alias("rel_e6"),
        )
    )


# ---------------------------------------------------------------------------
# ta_burstiness: term dispersion. For the 15 most frequent tokens, the
# variance-to-mean ratio of per-document counts (zeros INCLUDED — docs
# not containing the token are part of the distribution). With n docs,
# Σc, and Σc² as exact BIGINTs, sample VMR = ((n·Σc² − (Σc)²) · 1e6)
# div ((n−1)·Σc) micros — content words cluster (VMR >> 1), function
# words spread (VMR ≈ 1). Token counts come from one explode/groupBy;
# the top-15 cut is deterministic (count DESC, token ASC).
# ---------------------------------------------------------------------------
TA_BURST_TOP = 15

TA_BURST_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ), per_doc AS (
      SELECT token, doc_id, CAST(count(*) AS BIGINT) AS c
      FROM tok WHERE token <> '' GROUP BY 1, 2
    ), n_docs AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    stats AS (
      SELECT token,
             CAST(sum(c) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS docs_with,
             CAST(sum(c * c) AS BIGINT) AS sum_sq
      FROM per_doc GROUP BY token
      ORDER BY total DESC, token LIMIT {TA_BURST_TOP}
    )
    SELECT token, total, docs_with,
           CAST((((n * sum_sq - total * total) * 1000)
                 // ((n - 1) * total)) * 1000
                + ((((n * sum_sq - total * total) * 1000)
                    % ((n - 1) * total)) * 1000)
                  // ((n - 1) * total) AS BIGINT) AS vmr_e6
    FROM stats, n_docs
"""


def ta_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion index (variance-to-mean, zeros included) for the 15
    most frequent tokens (see section comment)."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n"))
    per_doc = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = (
        per_doc.groupBy("token")
        .agg(
            F.sum("c").alias("total"),
            F.count(F.lit(1)).alias("docs_with"),
            F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
        )
        .orderBy(F.col("total").desc(), F.col("token"))
        .limit(TA_BURST_TOP)
    )
    # micros in two x1000 steps with remainder carry — the single
    # x1e6 multiply overflows BIGINT once n*sum_sq clears ~9e12 (the
    # same overflow the x100 probe caught live in ta_char_gini)
    return stats.crossJoin(F.broadcast(n_docs)).selectExpr(
        "token",
        "total",
        "docs_with",
        "(((n * sum_sq - total * total) * 1000)"
        " div ((n - 1) * total)) * 1000"
        " + ((((n * sum_sq - total * total) * 1000)"
        " % ((n - 1) * total)) * 1000) div ((n - 1) * total) AS vmr_e6",
    )


# ---------------------------------------------------------------------------
# mm_zip_shards: REAL ZIP walk (see the encode_zip/parse_zip_entries
# section in multimodal.py). Member j of doc d is 40 + (d*11 + j*17) %
# 200 bytes named {d:08d}.{ext}; the oracle mirrors the exact byte
# accounting: each stored entry costs 30 + name_len + size in the local
# section and 46 + name_len in the central directory, plus the 22-byte
# EOCD.
# ---------------------------------------------------------------------------
ZIP_SCHEMA_FIELDS = (
    "media_id",
    "n_members",
    "payload_bytes",
    "central_dir_bytes",
    "archive_bytes",
    "n_crc_ok",
)

_ZIP_EXTS = ("txt", "json", "bin", "idx")

MM_ZIP_ORACLE = """
    WITH members AS (
      SELECT doc_id, t.j AS j,
             40 + (doc_id * 11 + t.j * 17) % 200 AS sz,
             12 + CASE WHEN (doc_id + t.j) % 4 = 1 THEN 1 ELSE 0 END
               AS name_len
      FROM (SELECT doc_id, 2 + doc_id % 3 AS k FROM documents),
           LATERAL (SELECT unnest(range(k)) AS j) t
    )
    SELECT doc_id AS media_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(sz) AS BIGINT) AS payload_bytes,
           CAST(sum(46 + name_len) AS BIGINT) AS central_dir_bytes,
           CAST(sum(30 + name_len + sz) + sum(46 + name_len) + 22
                AS BIGINT) AS archive_bytes,
           CAST(count(*) AS BIGINT) AS n_crc_ok
    FROM members GROUP BY doc_id
"""


def mm_zip_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: build a stored-entry ZIP shard and re-walk it from
    the EOCD with the real parser (see section comment). Zero-shuffle
    Arrow mapInPandas via the shared media_walk_query scaffold."""
    from eeecs485_p4_mapreduce_spark.operators.multimodal import (
        encode_zip,
        media_walk_query,
        parse_zip_entries,
    )

    def per_doc(d: int) -> dict:
        members = []
        for j in range(2 + d % 3):
            size = 40 + (d * 11 + j * 17) % 200
            # modulo pins the name to 8 digits: the oracle arithmetic
            # assumes fixed-width names, and replica-probe doc_ids
            # start at 1e8 (scale_probe KEY_OFFSET)
            name = f"{d % 10**8:08d}.{_ZIP_EXTS[(d + j) % 4]}"
            members.append((name, bytes([(d + j) % 251]) * size))
        _parsed, info = parse_zip_entries(encode_zip(members))
        return info

    return media_walk_query(spark, sf_dir, ZIP_SCHEMA_FIELDS, per_doc)


# ---------------------------------------------------------------------------
# mm_flac_streaminfo: REAL FLAC metadata walk (see encode_flac/
# parse_flac_stream in multimodal.py): big-endian bit-packed
# STREAMINFO + little-endian VORBIS_COMMENT in one file. Every emitted
# column comes from the walk; the oracle mirrors the synthesis
# arithmetic (rate table lookup, 1 + d % 3 comments, padding d % 128
# with the block dropped entirely when that is 0).
# ---------------------------------------------------------------------------
FLAC_SCHEMA_FIELDS = (
    "media_id",
    "sample_rate",
    "channels",
    "total_samples",
    "duration_us",
    "n_blocks",
    "padding_bytes",
    "n_comments",
)

FLAC_RATES = (8000, 16000, 22050, 32000, 44100, 48000)

MM_FLAC_ORACLE = f"""
    WITH params AS (
      SELECT doc_id,
             ([{", ".join(str(r) for r in FLAC_RATES)}])[1 + doc_id % 6]
               AS rate,
             1 + doc_id % 2 AS ch,
             1000 + (doc_id * 441) % 100000 AS total,
             1 + doc_id % 3 AS ncom,
             doc_id % 128 AS pad
      FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(rate AS BIGINT) AS sample_rate,
           CAST(ch AS BIGINT) AS channels,
           CAST(total AS BIGINT) AS total_samples,
           CAST((total * 1000000) // rate AS BIGINT) AS duration_us,
           CAST(2 + CASE WHEN pad > 0 THEN 1 ELSE 0 END AS BIGINT)
             AS n_blocks,
           CAST(pad AS BIGINT) AS padding_bytes,
           CAST(ncom AS BIGINT) AS n_comments
    FROM params
"""


def mm_flac_streaminfo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: build a FLAC metadata stream and re-walk it with
    the real parser (see section comment). Zero-shuffle Arrow
    mapInPandas via the shared media_walk_query scaffold."""
    from eeecs485_p4_mapreduce_spark.operators.multimodal import (
        encode_flac,
        media_walk_query,
        parse_flac_stream,
    )

    def per_doc(d: int) -> dict:
        return parse_flac_stream(
            encode_flac(
                FLAC_RATES[d % 6],
                1 + d % 2,
                16,
                1000 + (d * 441) % 100000,
                comments=[(f"k{i}", "v") for i in range(1 + d % 3)],
                padding_len=d % 128,
            )
        )

    return media_walk_query(spark, sf_dir, FLAC_SCHEMA_FIELDS, per_doc)


# ---------------------------------------------------------------------------
# stream_new_users: streaming first-touch — "new users per hour".
# foreachBatch reduces each micro-batch to per-user min(ts) and merges
# into a stored snapshot by taking the min again (min is associative,
# commutative, and batching-insensitive, so the finite replay is
# deterministic with no watermark sentinel). Finalization buckets each
# user's first ts by hour. State is user-sized BY THE METRIC'S NATURE
# (first-touch needs to remember who has been seen); a 100 TB
# deployment bounds it with a per-retention-window HLL sketch or a TTL
# on the snapshot — both change the metric's contract, so the exact
# form is what this query registers.
# ---------------------------------------------------------------------------
STREAM_NEW_USERS_ORACLE = """
    WITH first_touch AS (
      SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
    )
    SELECT strftime(time_bucket(INTERVAL '1 hour', first_ts),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(count(*) AS BIGINT) AS new_users
    FROM first_touch GROUP BY 1
"""


def stream_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hourly new-user counts from a foreachBatch-merged
    per-user first-seen snapshot (see section comment), via the shared
    mergeable-snapshot scaffold (streaming.queries.merged_snapshot_stream
    holds the split/replay/first-batch/checkpoint invariants)."""
    from eeecs485_p4_mapreduce_spark.streaming.queries import (
        merged_snapshot_stream,
    )

    def partial(batch_df):
        return batch_df.groupBy("user_id").agg(
            F.min("ts").alias("first_ts")
        )

    def finalize(snapshot):
        return snapshot.groupBy(
            F.date_format(
                F.date_trunc("hour", F.col("first_ts")),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("window_start")
        ).agg(F.count(F.lit(1)).alias("new_users"))

    return merged_snapshot_stream(
        spark, sf_dir, partial, ["user_id"], {"first_ts": "min"},
        finalize, prefix="p4spark_newu_",
    )


STAGED: dict[str, tuple] = {
    "q84_trend_regression": (q84_trend_regression, Q84_ORACLE),
    "q85_decile_lift": (q85_decile_lift, Q85_ORACLE),
    "q86_pit_join": (q86_pit_join, Q86_ORACLE),
    "curate_quota_apportion": (
        curate_quota_apportion,
        CURATE_APPORTION_ORACLE,
    ),
    "sim_mmr_rerank": (sim_mmr_rerank, SIM_MMR_ORACLE),
    "ta_burstiness": (ta_burstiness, TA_BURST_ORACLE),
    "mm_zip_shards": (mm_zip_shards, MM_ZIP_ORACLE),
    "mm_flac_streaminfo": (mm_flac_streaminfo, MM_FLAC_ORACLE),
    "stream_new_users": (stream_new_users, STREAM_NEW_USERS_ORACLE),
}


def register_staged() -> None:
    """Registration hook: called from registry.load_all(). Idempotent."""
    from eeecs485_p4_mapreduce_spark.registry import register_staged_dict

    register_staged_dict(STAGED)
