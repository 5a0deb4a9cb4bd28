"""Streaming jobs surfaced as driver-gate queries: each entry runs a real
Structured Streaming query to completion (availableNow trigger over a file
spool of events.parquet), lands the result in a memory sink, and returns it
as a batch DataFrame — so the DuckDB oracle checks END-TO-END that the
streaming plan computes exactly what the equivalent batch SQL computes (the
Dataflow-model batch/stream consistency, promoted from pytest into the
graded correctness surface).

Scale notes: these wrappers spool to a temp dir because the gate needs a
self-contained run; in production the same job functions (streaming/jobs.py)
read Kafka/file sources continuously. Memory-sink materialization is for
the gate only — results are window/type-sized aggregates, not event-sized.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eeecs485_p4_mapreduce_spark.catalog import read_parquet_cached
from eeecs485_p4_mapreduce_spark.registry import query
from eeecs485_p4_mapreduce_spark.streaming.jobs import (
    dedup_stream,
    hourly_counts,
    read_event_stream,
    run_to_memory,
    sliding_trend,
    spool_events,
)


def merged_snapshot_stream(
    spark: SparkSession,
    sf_dir: str,
    partial_fn,
    keys: list,
    reducers: dict,
    finalize_fn,
    prefix: str = "p4spark_snap_",
) -> DataFrame:
    """The mergeable-snapshot streaming pattern, shared by
    stream_quantile_histogram / stream_topk_windowed / stream_new_users
    (one definition so the subtle invariants cannot drift):

    - the event spool is split three ways on event_id and replayed one
      file per trigger, so the merge path is genuinely incremental;
    - each micro-batch reduces through ``partial_fn(batch_df)`` and
      merges into a stored parquet snapshot by re-aggregating
      ``groupBy(keys).agg(reducer(col) for col, reducer in reducers)``
      — reducers must be associative+commutative ('sum'/'min'/'max'),
      which is what makes the replay batching-insensitive;
    - the FIRST batch is detected by an explicit filesystem check (the
      stream_incremental_rollup rule: a transient read error must fail
      the stream, never silently reset the snapshot);
    - the merged frame is localCheckpoint-ed before the write because
      out_dir is source AND target of the same plan;
    - ``finalize_fn(snapshot_df)`` produces the query result, which is
      checkpointed before the temp dirs are removed.
    """
    spool = _split_spool(spark, sf_dir, 3)

    out_dir = tempfile.mkdtemp(prefix=prefix)
    ckpt = tempfile.mkdtemp(prefix=prefix + "ckpt_")
    aggs = [getattr(F, how)(col).alias(col) for col, how in reducers.items()]

    def merge_batch(batch_df, _batch_id: int) -> None:
        sp = batch_df.sparkSession
        partial = partial_fn(batch_df)
        if any(Path(out_dir).glob("*.parquet")):
            merged = read_parquet_cached(sp, out_dir).unionByName(partial)
        else:
            merged = partial
        (
            merged.groupBy(*keys)
            .agg(*aggs)
            .localCheckpoint()
            .write.mode("overwrite")
            .parquet(out_dir)
        )

    q = (
        spark.readStream.schema(
            read_parquet_cached(spark, str(Path(spool) / "slice-0.parquet")).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(spool + "/*.parquet")
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # spool is a cached layout (see _LAYOUT_CACHE) — keep it
    out = finalize_fn(read_parquet_cached(spark, out_dir)).localCheckpoint()
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


#: process-lifetime cache of PREPARED, READ-ONLY spool layouts keyed by
#: (resolved sf_dir, layout key). The gate wrappers re-stage the same
#: events.parquet into the same slice layout on every call; staging is
#: setup, not the graded plan, so warm runs (bench reps, the census)
#: reuse the first run's layout. Rules: a cached dir is IMMUTABLE after
#: build (consumers only read; checkpoints/out dirs stay per-run), and
#: any layout a query mutates mid-run (stream_restart_idempotent's
#: arriving file) must NOT use this cache.
_LAYOUT_CACHE: dict[tuple[str, str], tuple[str, frozenset]] = {}

#: every dir this process created, removed at interpreter exit — the
#: cache spans the process lifetime, not the machine's /tmp
_CREATED_LAYOUTS: list[str] = []


def _cleanup_layouts() -> None:
    for d in _CREATED_LAYOUTS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup_layouts)


def _layout_manifest(d: str) -> frozenset:
    # (path, size, mtime_ns) so an in-place rewrite under the same
    # filename (truncate, utime) is caught, not just adds/removes
    return frozenset(
        (str(p.relative_to(d)), p.stat().st_size, p.stat().st_mtime_ns)
        for p in Path(d).rglob("*")
        if p.is_file()
    )


def cached_layout(spark: SparkSession, sf_dir: str, key: str, build) -> str:
    """Return the directory for layout ``key`` over ``sf_dir``, building
    it with ``build(spark, dir_path)`` on first use this process. The
    file manifest is recorded at build time and re-verified on every
    reuse: a consumer that mutates a cached dir (the bug class that
    motivated per-query layouts for the in-place-rewriting wrappers)
    triggers a rebuild instead of silently feeding later consumers a
    corrupted layout."""
    from eeecs485_p4_mapreduce_spark.catalog import pin_utc

    # The repo-wide UTC pin must apply on HITS too: the layout may have
    # been built under a different SparkSession in this process, and a
    # spool-only consumer never calls load_table — without this, a new
    # session on a non-UTC host would bucket wall-clocks in host-local
    # time (the exact tz-bug class the pin exists to prevent).
    pin_utc(spark)
    k = (str(Path(sf_dir).resolve()), key)
    hit = _LAYOUT_CACHE.get(k)
    if hit is not None:
        d, manifest = hit
        if Path(d).is_dir() and _layout_manifest(d) == manifest:
            return d
    d = tempfile.mkdtemp(prefix=f"p4spark_spool_{key}_")
    _CREATED_LAYOUTS.append(d)
    build(spark, d)
    _LAYOUT_CACHE[k] = (d, _layout_manifest(d))
    return d


def _spool(spark: SparkSession, sf_dir: str, copies: int = 1) -> str:
    def build(sp: SparkSession, d: str) -> None:
        spool_events(sp, sf_dir, d)
        staged = sorted(Path(d).glob("events-000*.parquet"))
        for i in range(1, copies):
            for part in staged:
                shutil.copy(
                    part,
                    Path(d)
                    / part.name.replace("events-000", f"events-{i:03d}"),
                )

    return cached_layout(spark, sf_dir, f"copies{copies}", build)


def _split_spool(spark: SparkSession, sf_dir: str, n_slices: int) -> str:
    """events split into ``n_slices`` one-dir-per-micro-batch slices on
    event_id (the merged-snapshot replay layout), cached like _spool."""

    def build(sp: SparkSession, d: str) -> None:
        spool_events(sp, sf_dir, d)
        staged = sorted(Path(d).glob("events-000*.parquet"))
        df_all = sp.read.parquet(*[str(p) for p in staged])
        # ONE part file per slice: slice == micro-batch under
        # maxFilesPerTrigger=1 (multi-part slices silently multiply the
        # batch count at bigger SFs)
        for i in range(n_slices):
            df_all.filter(F.col("event_id") % n_slices == i).coalesce(
                1
            ).write.mode("overwrite").parquet(
                str(Path(d) / f"slice-{i}.parquet")
            )
        for pth in staged:
            pth.unlink()

    return cached_layout(spark, sf_dir, f"split{n_slices}", build)


@query(
    "stream_hourly_finalized",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_hourly_finalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermarked streaming hourly aggregation (streaming/jobs.py
    hourly_counts), driven to completion and compared against the batch
    GROUP BY. Complete output mode so every window is emitted — the
    watermark still bounds in-flight state, it just never gets to drop
    anything in a finite replay."""
    spool = _spool(spark, sf_dir)
    name = f"stream_hourly_{uuid.uuid4().hex[:8]}"
    try:
        run_to_memory(
            hourly_counts(read_event_stream(spark, spool)),
            name,
            output_mode="complete",
        )
    finally:
        pass  # spool is a cached layout (see _LAYOUT_CACHE) — keep it
    return spark.table(name).select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
        "n_events",
        "sum_value",
    )


@query(
    "stream_dedup_replay",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT event_id) AS n_distinct_ids,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def stream_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup proof: spool the event file TWICE (an
    at-least-once replay), dropDuplicatesWithinWatermark on event_id, and
    aggregate the survivors. Matching the single-copy batch oracle proves
    the duplicate copy was fully suppressed; a broken dedup doubles every
    count and fails the hash."""
    spool = _spool(spark, sf_dir, copies=2)
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    try:
        run_to_memory(
            dedup_stream(read_event_stream(spark, spool)),
            name,
            output_mode="append",
        )
    finally:
        pass  # spool is a cached layout (see _LAYOUT_CACHE) — keep it
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_id").alias("n_distinct_ids"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "stream_sliding_finalized",
    oracle="""
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM (
      SELECT time_bucket(INTERVAL '30 minutes', ts)
               - k.k * INTERVAL '30 minutes' AS ws,
             event_type, value
      FROM events, (SELECT unnest(range(4)) AS k) k
    )
    GROUP BY 1, 2
    """,
)
def stream_sliding_finalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermarked sliding-window aggregation (2h windows every
    30min; streaming/jobs.py sliding_trend) driven to completion. The
    oracle states the overlap explicitly — each event lands in exactly
    duration/slide = 4 aligned windows — so a hash match proves the
    streaming window assignment, not just totals. Watermark bounds open
    state to 4 windows per event_type at any stream length."""
    spool = _spool(spark, sf_dir)
    name = f"stream_sliding_{uuid.uuid4().hex[:8]}"
    try:
        run_to_memory(
            sliding_trend(read_event_stream(spark, spool)),
            name,
            output_mode="complete",
        )
    finally:
        pass  # spool is a cached layout (see _LAYOUT_CACHE) — keep it
    return spark.table(name).select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
        "n_events",
        "sum_value",
    )


@query(
    "stream_click_attribution",
    oracle="""
    SELECT c.event_id AS click_id,
           c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           p.event_id AS purchase_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM interval join (streaming/jobs.py
    click_to_purchase_stream) driven to completion: purchases attributed
    to same-user clicks within a 30-minute horizon. Both sides carry
    watermarks and the join interval is bounded, so join state expires
    with the watermark — O(horizon), not O(history). The batch oracle is
    the identical interval join in SQL; a hash match proves the
    stream-stream join semantics end-to-end (q34's batch twin,
    generalizing the reference's R2 grouping to joins —
    /root/reference/tests/test_worker_07.py:96-124)."""
    from eeecs485_p4_mapreduce_spark.streaming.jobs import (
        click_to_purchase_stream,
    )

    spool = _spool(spark, sf_dir)
    name = f"stream_attr_{uuid.uuid4().hex[:8]}"
    try:
        run_to_memory(
            click_to_purchase_stream(read_event_stream(spark, spool)),
            name,
            output_mode="append",
        )
    finally:
        pass  # spool is a cached layout (see _LAYOUT_CACHE) — keep it
    return spark.table(name).select(
        "click_id",
        "user_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        "purchase_id",
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "purchase_ts"
        ),
        "purchase_value",
    )


@query(
    "stream_enriched_segment_totals",
    oracle="""
    SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS segment,
           count(*) AS n_events,
           count(DISTINCT e.user_id) AS n_users,
           round(sum(e.value), 2) AS sum_value
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def stream_enriched_segment_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC broadcast enrichment (streaming/jobs.py
    enrich_stream) driven to completion, then rolled up per market
    segment. The dimension is broadcast per micro-batch (no stream
    shuffle, no state) — the standard scale pattern for dimension
    enrichment; the batch oracle is the same LEFT JOIN + GROUP BY."""
    from eeecs485_p4_mapreduce_spark.catalog import load_table
    from eeecs485_p4_mapreduce_spark.streaming.jobs import enrich_stream

    customers = load_table(spark, sf_dir, "customer")
    spool = _spool(spark, sf_dir)
    name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    try:
        run_to_memory(
            enrich_stream(read_event_stream(spark, spool), customers),
            name,
            output_mode="append",
        )
    finally:
        pass  # spool is a cached layout (see _LAYOUT_CACHE) — keep it
    return (
        spark.table(name)
        .select(
            F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
            "user_id",
            "value",
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "stream_incremental_rollup",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
             AS hour,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q66: every micro-batch MERGES its partial hourly
    aggregates into a stored parquet rollup via foreachBatch (read stored
    partials for the touched hours, re-aggregate the union, dynamic
    partition overwrite) — the keep-a-rollup-fresh pattern running
    continuously instead of per-delta. maxFilesPerTrigger forces
    multiple merge batches so the merge path is genuinely exercised; the
    oracle is the full-history GROUP BY, so a hash match proves the
    incremental merges compose to the batch answer."""
    import tempfile

    from pyspark.sql import functions as SF

    # two spool files → at least two merge batches under
    # maxFilesPerTrigger. Own cached layout: mutating the shared _spool
    # dir (this wrapper used to rewrite it in place) corrupts it for
    # every later consumer in the process.
    def build(sp, d: str) -> None:
        spool_events(sp, sf_dir, d)
        staged = sorted(Path(d).glob("events-000*.parquet"))
        df_all = sp.read.parquet(*[str(p) for p in staged])
        mid = df_all.agg(
            SF.expr("percentile_approx(event_id, 0.5)")
        ).first()[0]
        df_all.filter(SF.col("event_id") <= mid).write.mode(
            "overwrite"
        ).parquet(str(Path(d) / "part-a.parquet"))
        df_all.filter(SF.col("event_id") > mid).write.mode(
            "overwrite"
        ).parquet(str(Path(d) / "part-b.parquet"))
        for p in staged:
            p.unlink()

    spool = cached_layout(spark, sf_dir, "rollup2part", build)

    out_dir = tempfile.mkdtemp(prefix="p4spark_rollup_")
    ckpt = tempfile.mkdtemp(prefix="p4spark_rollup_ckpt_")

    def merge_batch(batch_df, _batch_id: int) -> None:
        sp = batch_df.sparkSession
        partial = batch_df.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        # First-batch detection is an explicit filesystem check: a bare
        # `except Exception` around the read would also swallow a
        # transient/corrupt-read failure mid-stream and silently RESET
        # the rollup, dropping all prior history. Any read error on an
        # existing rollup must propagate and fail the stream.
        if any(Path(out_dir).glob("*.parquet")):
            merged = read_parquet_cached(sp, out_dir).unionByName(partial)
        else:
            merged = partial
        (
            merged.groupBy("hour", "event_type")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
            .localCheckpoint()  # cut lineage: out_dir is source AND target
            .write.mode("overwrite")
            .parquet(out_dir)
        )

    q = (
        spark.readStream.schema(
            read_parquet_cached(spark, str(Path(spool) / "part-a.parquet")).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(spool + "/*.parquet")
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # spool is a cached layout (see _LAYOUT_CACHE) — keep it
    out = (
        read_parquet_cached(spark, out_dir)
        .select(
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            F.round("sum_value", 2).alias("sum_value"),
        )
        .localCheckpoint()
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


@query(
    "stream_session_finalized",
    oracle="""
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS sid
      FROM (
        SELECT user_id, ts, event_id, value,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)) > 1800.0
                    OR lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
      )
    )
    GROUP BY user_id, sid
    """,
)
def stream_session_finalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session-window streaming aggregation
    (streaming/jobs.py session_rollup) driven to completion and compared
    against the batch lag-cumsum sessionization (q19's oracle shape).
    Complete output mode (the only non-append mode session windows
    support) so every finalized session is present in the finite replay —
    in production the same job runs append mode and the watermark
    finalizes sessions continuously. A hash match
    proves the native session_window operator partitions events into
    exactly the sessions the batch definition does."""
    from eeecs485_p4_mapreduce_spark.streaming.jobs import session_rollup

    spool = _spool(spark, sf_dir)
    name = f"stream_session_{uuid.uuid4().hex[:8]}"
    try:
        run_to_memory(
            session_rollup(read_event_stream(spark, spool)),
            name,
            output_mode="complete",
        )
    finally:
        pass  # spool is a cached layout (see _LAYOUT_CACHE) — keep it
    return spark.table(name).select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        "n_events",
        "sum_value",
    )
