"""Structured Streaming tests: each streaming job run to completion with
availableNow and checked against its batch twin (Dataflow-model
batch/stream consistency)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def spool(spark, sf_dir, tmp_path_factory):
    from eeecs485_p4_mapreduce_spark.streaming.jobs import spool_events

    return spool_events(
        spark, sf_dir, str(tmp_path_factory.mktemp("events-spool"))
    )


def test_hourly_counts_matches_batch(spark, sf_dir, spool):
    from eeecs485_p4_mapreduce_spark.catalog import load_table
    from eeecs485_p4_mapreduce_spark.streaming import jobs

    stream = jobs.read_event_stream(spark, spool)
    jobs.run_to_memory(jobs.hourly_counts(stream), "t_hourly", "complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("t_hourly").collect()
    }

    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in batch.collect()
    }
    assert got == want


def test_dedup_stream_drops_duplicates(spark, spool, tmp_path):
    import shutil
    from pathlib import Path

    from eeecs485_p4_mapreduce_spark.streaming import jobs

    # spool the same file twice → every event is duplicated
    dup_spool = tmp_path / "dup-spool"
    dup_spool.mkdir()
    src = next(Path(spool).glob("*.parquet"))
    shutil.copy(src, dup_spool / "a.parquet")
    shutil.copy(src, dup_spool / "b.parquet")

    stream = jobs.read_event_stream(spark, str(dup_spool))
    jobs.run_to_memory(jobs.dedup_stream(stream), "t_dedup", "append")
    n_unique = spark.table("t_dedup").select("event_id").distinct().count()
    n_total = spark.table("t_dedup").count()
    assert n_total == n_unique  # no duplicate survived


def test_enrich_stream_matches_batch_join(spark, sf_dir, spool):
    """Stream-static dimension enrichment must equal the batch join."""
    from eeecs485_p4_mapreduce_spark.catalog import load_table
    from eeecs485_p4_mapreduce_spark.streaming import jobs

    customers = load_table(spark, sf_dir, "customer")
    stream = jobs.read_event_stream(spark, spool)
    jobs.run_to_memory(
        jobs.enrich_stream(stream, customers), "t_enriched", "append"
    )
    got = {
        (r.event_id, r.c_name, r.c_mktsegment)
        for r in spark.table("t_enriched").collect()
    }
    events = load_table(spark, sf_dir, "events")
    want = {
        (r.event_id, r.c_name, r.c_mktsegment)
        for r in jobs.enrich_stream(events, customers).collect()
    }
    assert got == want
    assert len(got) == events.count()


def test_click_purchase_stream_matches_batch(spark, sf_dir, spool):
    """Stream-stream interval join must equal the same join run in batch
    (watermarks only bound state, they drop nothing in availableNow)."""
    from eeecs485_p4_mapreduce_spark.catalog import load_table
    from eeecs485_p4_mapreduce_spark.streaming import jobs

    stream = jobs.read_event_stream(spark, spool)
    jobs.run_to_memory(
        jobs.click_to_purchase_stream(stream), "t_funnel", "append"
    )
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.table("t_funnel").collect()
    }
    events = load_table(spark, sf_dir, "events")
    want = {
        (r.click_id, r.purchase_id)
        for r in jobs.click_to_purchase_stream(events).collect()
    }
    assert got == want
    assert got, "expected at least one attributed purchase"


def test_sessionize_stream_closed_sessions(spark, sf_dir, spool):
    """Closed sessions emitted by the stateful operator must be a subset of
    the batch sessionization (q19) with identical boundaries/aggregates."""
    from eeecs485_p4_mapreduce_spark.registry import QUERIES, load_all
    from eeecs485_p4_mapreduce_spark.streaming import jobs

    load_all()
    stream = jobs.read_event_stream(spark, spool)
    jobs.run_to_memory(jobs.sessionize_stream(stream), "t_sessions", "update")
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.session_value, 2))
        for r in spark.table("t_sessions").collect()
    }
    assert got, "expected at least one closed session"

    batch = QUERIES["q19_sessionize"](spark, sf_dir)
    # q19 formats timestamps as strings; compare on the same representation
    want = {
        (
            r.user_id,
            r.session_start,
            r.session_end,
            r.n_events,
            round(r.session_value, 2),
        )
        for r in batch.collect()
    }
    got_fmt = {
        (
            u,
            s.strftime("%Y-%m-%d %H:%M:%S"),
            e.strftime("%Y-%m-%d %H:%M:%S"),
            n,
            v,
        )
        for (u, s, e, n, v) in got
    }
    assert got_fmt <= want
    # in a single availableNow batch all gap-proven sessions close:
    # every batch session except each user's last open one must appear
    assert len(got_fmt) >= len(want) - spark.table("t_sessions").select("user_id").distinct().count() * 2


def test_upsert_sink_matches_batch_and_is_idempotent(spark, sf_dir, spool, tmp_path):
    """foreachBatch dynamic-partition upsert: streaming latest-event-per-
    (user, type) must equal the batch answer, and re-running the stream
    over the same checkpoint must be a no-op."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from eeecs485_p4_mapreduce_spark.catalog import load_table
    from eeecs485_p4_mapreduce_spark.streaming import jobs

    out = str(tmp_path / "latest-events")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(jobs.EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)  # force multi-batch upserts
            .parquet(spool)
        )
        q = jobs.upsert_stream_to_parquet(
            stream, out, ckpt,
            keys=["user_id", "event_type"],
            order_col="event_id",
            partition_col="event_type",
        )
        q.awaitTermination()

    run()
    got = {
        (r.user_id, r.event_type): r.event_id
        for r in spark.read.parquet(out).collect()
    }

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("event_id").desc()
    )
    want = {
        (r.user_id, r.event_type): r.event_id
        for r in events.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .collect()
    }
    assert got == want

    run()  # same checkpoint, no new files -> no-op
    again = {
        (r.user_id, r.event_type): r.event_id
        for r in spark.read.parquet(out).collect()
    }
    assert again == want


def test_sliding_trend_matches_batch(spark, sf_dir, spool):
    """Streaming sliding windows (complete mode over the spool) must
    equal the batch sliding-window query's answer."""
    from pyspark.sql import functions as F

    from eeecs485_p4_mapreduce_spark.operators.relational import (
        q43_sliding_window_trend,
    )
    from eeecs485_p4_mapreduce_spark.streaming import jobs

    stream = jobs.read_event_stream(spark, spool)
    jobs.run_to_memory(jobs.sliding_trend(stream), "t_sliding", "complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("t_sliding").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in q43_sliding_window_trend(spark, sf_dir)
        .withColumn(
            "window_start", F.to_timestamp("window_start")
        )
        .collect()
    }
    assert got == want


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode watermark semantics across micro-batches: an event
    arriving after the watermark has passed its window must be dropped,
    not merged — the bounded-state guarantee the streaming jobs rely on."""
    import datetime as dt

    from pyspark.sql import Row
    from eeecs485_p4_mapreduce_spark.streaming import jobs

    spool = tmp_path / "late-spool"
    spool.mkdir()

    def write_batch(name, events):
        rows = [
            Row(
                event_id=i,
                ts=dt.datetime.fromtimestamp(ts, dt.timezone.utc).replace(
                    tzinfo=None
                ),
                user_id=1,
                event_type="click",
                value=1.0,
                props="{}",
            )
            for i, ts in events
        ]
        spark.createDataFrame(rows, jobs.EVENT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(spool / name))

    base = 1_700_000_000  # any fixed epoch second, hour-aligned enough
    base -= base % 3600
    ckpt = str(tmp_path / "late-ckpt")
    out = str(tmp_path / "late-out")

    def run_once():
        stream = spark.readStream.schema(jobs.EVENT_SCHEMA).parquet(
            str(spool) + "/*.parquet"
        )
        q = (
            jobs.hourly_counts(stream, watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: one event at H0, one at H0+4h -> watermark persists at H0+2h
    write_batch("b0.parquet", [(0, base), (1, base + 4 * 3600)])
    run_once()
    # run 2 (same checkpoint): a late event back in H0 (below the saved
    # watermark: dropped) and a fresh one at H0+5h
    write_batch("b1.parquet", [(2, base + 60), (3, base + 5 * 3600)])
    run_once()

    got = {
        r.window_start.timestamp(): r.n_events
        for r in spark.read.parquet(out).collect()
    }
    # H0's window finalized with ONLY the on-time event; the late
    # arrival (event_id=2) was discarded by the watermark.
    assert got.get(float(base)) == 1


def test_click_purchase_outer_stream_matches_batch(spark, sf_dir, spool):
    """LEFT OUTER stream-stream interval join: matched pairs must equal the
    batch join exactly; null (abandoned-click) rows may lag the watermark,
    so the streamed null set must be a subset of the batch null set and
    every streamed click_id must appear with the same match set."""
    from eeecs485_p4_mapreduce_spark.catalog import load_table
    from eeecs485_p4_mapreduce_spark.streaming import jobs

    stream = jobs.read_event_stream(spark, spool)
    jobs.run_to_memory(
        jobs.click_to_purchase_outer_stream(stream), "t_funnel_outer", "append"
    )
    got = [
        (r.click_id, r.purchase_id)
        for r in spark.table("t_funnel_outer").collect()
    ]
    events = load_table(spark, sf_dir, "events")
    want = [
        (r.click_id, r.purchase_id)
        for r in jobs.click_to_purchase_outer_stream(events).collect()
    ]
    got_matched = {p for p in got if p[1] is not None}
    want_matched = {p for p in want if p[1] is not None}
    assert got_matched == want_matched
    got_null = {c for c, p in got if p is None}
    want_null = {c for c, p in want if p is None}
    assert got_null <= want_null
    # no click may appear both matched and null in the streamed output
    assert not (got_null & {c for c, _ in got_matched})
    assert want_null, "expected at least one abandoned click in batch"


def test_running_spend_transform_with_state_matches_batch(spark, sf_dir, spool):
    """transformWithStateInPandas running totals: the LAST update emitted
    per user must equal the batch per-user sum/count exactly."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState state server requires protobuf",
    )
    from pyspark.sql import functions as F

    from eeecs485_p4_mapreduce_spark.catalog import load_table
    from eeecs485_p4_mapreduce_spark.streaming import jobs

    stream = jobs.read_event_stream(spark, spool)
    jobs.run_to_memory(
        jobs.running_spend_stream(stream), "t_running_spend", "update"
    )
    rows = spark.table("t_running_spend").collect()
    assert rows, "expected stateful output"
    last_by_user = {}
    for r in rows:  # memory sink appends updates in batch order
        last_by_user[r.user_id] = (r.total_spend, r.n_events)

    events = load_table(spark, sf_dir, "events")
    want = {
        r.user_id: (r.total, r.n)
        for r in events.groupBy("user_id")
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(last_by_user) == set(want)
    for u, (total, n) in want.items():
        got_total, got_n = last_by_user[u]
        assert got_n == n
        assert abs(got_total - total) < 1e-6


def test_no_session_boundary_collisions(spark, sf_dir):
    """session_rollup's native session_window starts a new session at
    gap >= 1800s while the batch oracle's lag-cumsum uses gap > 1800s;
    the two agree iff no user has an exact-1800s inter-event gap. This
    gate pins that data property per scale factor (see
    streaming/jobs.py session_rollup boundary note)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from eeecs485_p4_mapreduce_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = events.select(
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap")
    )
    n = gaps.filter(F.col("gap") == 1800).count()
    assert n == 0, f"{n} exact-1800s gaps: session boundary semantics differ"
