"""Connector round-trips and physical-plan quality gates."""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def _count_scans(df) -> int:
    from eeecs485_p4_mapreduce_spark.plans.explain import formatted_plan

    return len(re.findall(r"^\(\d+\) Scan parquet", formatted_plan(df), flags=re.M))


class TestSources:
    def test_csv_roundtrip(self, spark, tmp_path):
        from eeecs485_p4_mapreduce_spark.sources.readers import read_csv

        df = spark.range(100).select(
            F.col("id"), (F.col("id") % 5).alias("grp")
        )
        path = str(tmp_path / "csv")
        df.write.option("header", "true").csv(path)
        back = read_csv(spark, path, schema="id LONG, grp LONG")
        assert back.count() == 100
        assert dict(back.dtypes) == {"id": "bigint", "grp": "bigint"}

    def test_json_roundtrip(self, spark, tmp_path):
        from eeecs485_p4_mapreduce_spark.sources.readers import read_json

        df = spark.range(50).select(F.col("id"), F.lit("x").alias("s"))
        path = str(tmp_path / "json")
        df.write.json(path)
        back = read_json(spark, path, schema="id LONG, s STRING")
        assert back.count() == 50

    def test_text_dir_whole_file(self, spark, tmp_path):
        from eeecs485_p4_mapreduce_spark.sources.readers import read_text_dir

        d = tmp_path / "texts"
        d.mkdir()
        (d / "a.txt").write_text("line1\nline2\n")
        (d / "b.txt").write_text("line3\n")
        assert read_text_dir(spark, str(d)).count() == 3
        assert read_text_dir(spark, str(d), whole_file=True).count() == 2

    def test_partitioned_write_prunes(self, spark, tmp_path):
        from eeecs485_p4_mapreduce_spark.plans.explain import formatted_plan
        from eeecs485_p4_mapreduce_spark.sources.readers import (
            read_parquet,
            write_partitioned,
        )

        df = spark.range(200).select(
            F.col("id"), (F.col("id") % 4).cast("string").alias("part")
        )
        path = str(tmp_path / "parted")
        write_partitioned(df, path, ["part"])
        back = read_parquet(spark, path).filter(F.col("part") == "2")
        assert back.count() == 50
        plan = formatted_plan(back)
        assert "PartitionFilters" in plan and "part" in plan


class TestPlanQuality:
    """The scale claims in operator docstrings, verified on real plans."""

    def test_q01_filter_pushed_and_pruned(self, spark, sf_dir):
        from eeecs485_p4_mapreduce_spark.operators.relational import (
            q01_pricing_summary,
        )
        from eeecs485_p4_mapreduce_spark.plans.explain import (
            assert_pushed_filter,
            assert_read_schema_only,
            count_exchanges,
        )

        df = q01_pricing_summary(spark, sf_dir)
        assert_pushed_filter(df, "l_shipdate")
        assert_read_schema_only(
            df,
            {
                "l_returnflag",
                "l_linestatus",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_shipdate",
            },
        )
        assert count_exchanges(df) == 1  # single agg shuffle

    def test_q05_broadcasts_dimensions(self, spark, sf_dir):
        from eeecs485_p4_mapreduce_spark.operators.relational import (
            q05_local_supplier_volume,
        )
        from eeecs485_p4_mapreduce_spark.plans.explain import assert_broadcast_join

        assert_broadcast_join(q05_local_supplier_volume(spark, sf_dir))

    def test_q20_no_fact_shuffle_before_agg(self, spark, sf_dir):
        from eeecs485_p4_mapreduce_spark.operators.relational import (
            q20_customers_per_region,
        )
        from eeecs485_p4_mapreduce_spark.plans.explain import (
            assert_broadcast_join,
            count_exchanges,
        )

        df = q20_customers_per_region(spark, sf_dir)
        assert_broadcast_join(df)
        assert count_exchanges(df) == 1  # only the final agg exchange

    def test_q13_whole_stage_codegen(self, spark, sf_dir):
        from eeecs485_p4_mapreduce_spark.operators.relational import (
            q13_scalar_functions,
        )
        from eeecs485_p4_mapreduce_spark.plans.explain import (
            assert_whole_stage_codegen,
            count_exchanges,
        )

        df = q13_scalar_functions(spark, sf_dir)
        assert_whole_stage_codegen(df)
        assert count_exchanges(df) == 0  # pure map-side pipeline

    def test_gopher_repetition_map_side_only(self, spark, sf_dir):
        """Row-local repetition metrics must plan as a pure scan pipeline:
        zero exchanges, no Python nodes, tokenizer bound once (the plan
        shows a single regex split per row via the lambda let-binding)."""
        from eeecs485_p4_mapreduce_spark.operators.text_analysis import (
            ta_gopher_repetition,
        )
        from eeecs485_p4_mapreduce_spark.plans.explain import (
            assert_whole_stage_codegen,
            count_exchanges,
        )

        df = ta_gopher_repetition(spark, sf_dir)
        assert_whole_stage_codegen(df)
        assert count_exchanges(df) == 0

    def test_pii_scrub_map_side_and_total(self, spark, sf_dir):
        """The PII scrub must be a zero-exchange scan pipeline, and the
        deterministic augmentation guarantees every doc yields exactly one
        redaction of each kind — an all-zero pass would mean the regexes
        silently stopped matching (e.g. a literal-escaping regression)."""
        from eeecs485_p4_mapreduce_spark.operators.text_analysis import (
            ta_pii_scrub,
        )
        from eeecs485_p4_mapreduce_spark.plans.explain import count_exchanges

        df = ta_pii_scrub(spark, sf_dir)
        assert count_exchanges(df) == 0
        n = df.count()
        assert (
            df.filter(
                "n_emails = 1 AND n_phones = 1 AND n_ips = 1"
                " AND chars_removed > 0"
            ).count()
            == n
            > 0
        )

    def test_q22_asof_single_shuffle(self, spark, sf_dir):
        """The as-of composition must cost exactly one exchange (the
        user_id window shuffle) — no join, no explosion."""
        from eeecs485_p4_mapreduce_spark.operators.relational import (
            q22_asof_last_purchase,
        )
        from eeecs485_p4_mapreduce_spark.plans.explain import count_exchanges

        assert count_exchanges(q22_asof_last_purchase(spark, sf_dir)) == 1

    def test_q23_band_join_broadcasts(self, spark, sf_dir):
        """The interval dimension must broadcast (BroadcastNestedLoopJoin):
        the fact table never shuffles for the range join itself."""
        from eeecs485_p4_mapreduce_spark.operators.relational import (
            q23_quantity_band_join,
        )
        from eeecs485_p4_mapreduce_spark.plans.explain import (
            assert_broadcast_join,
            count_exchanges,
        )

        df = q23_quantity_band_join(spark, sf_dir)
        assert_broadcast_join(df)
        assert count_exchanges(df) == 1  # only the final agg

    def test_sim_topk_broadcasts_queries(self, spark, sf_dir):
        from eeecs485_p4_mapreduce_spark.operators.similarity import (
            sim_topk_bruteforce,
        )
        from eeecs485_p4_mapreduce_spark.plans.explain import assert_broadcast_join

        assert_broadcast_join(sim_topk_bruteforce(spark, sf_dir))

    def test_dedup_candidate_stages_scan_once(self, spark, sf_dir):
        """The bucket-explode pair generation must scan the corpus exactly
        once — a regression to a self-join doubles the scans."""
        from eeecs485_p4_mapreduce_spark.operators import dedup

        assert _count_scans(dedup.dedup_minhash_lsh(spark, sf_dir)) == 1
        assert _count_scans(dedup.dedup_ngram_jaccard(spark, sf_dir)) == 1
        assert _count_scans(dedup.dedup_simhash_pairs(spark, sf_dir)) == 1

    def test_q33_anti_join_filter_pushed(self, spark, sf_dir):
        """The NOT EXISTS date restriction must reach the orders scan."""
        from eeecs485_p4_mapreduce_spark.operators.relational import (
            q33_rich_inactive_customers,
        )
        from eeecs485_p4_mapreduce_spark.plans.explain import assert_pushed_filter

        assert_pushed_filter(q33_rich_inactive_customers(spark, sf_dir), "o_orderdate")

    def test_bucketed_join_is_exchange_free(self, spark, tmp_path):
        """Tables bucketed on the join key must sort-merge join with zero
        shuffle exchanges — the co-located join the writers exist for."""
        import uuid

        from eeecs485_p4_mapreduce_spark.plans.explain import count_exchanges
        from eeecs485_p4_mapreduce_spark.sources.readers import write_bucketed

        suffix = uuid.uuid4().hex[:8]
        left_name, right_name = f"bk_left_{suffix}", f"bk_right_{suffix}"
        left = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a")
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b")
        )
        write_bucketed(left, left_name, ["k"], 4, sort_by=["k"])
        write_bucketed(right, right_name, ["k"], 4, sort_by=["k"])
        prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # force the shuffle-join path: a broadcast join would also show
            # zero exchanges, proving nothing about bucketing
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = spark.table(left_name).join(
                spark.table(right_name).withColumnRenamed("k", "k2"),
                F.col("k") == F.col("k2"),
            )
            assert joined.count() == 1000
            from eeecs485_p4_mapreduce_spark.plans.explain import formatted_plan

            assert "SortMergeJoin" in formatted_plan(joined)
            assert count_exchanges(joined) == 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
            spark.sql(f"DROP TABLE IF EXISTS {left_name}")
            spark.sql(f"DROP TABLE IF EXISTS {right_name}")

    def test_q37_part_filter_precedes_broadcast(self, spark, sf_dir):
        """Q9-pattern: the p_name LIKE filter must be pushed to the part
        scan (only the qualifying slice broadcasts), and lineitem<->orders
        must be the only shuffle joins — dimensions all broadcast."""
        from eeecs485_p4_mapreduce_spark.operators.relational import (
            q37_product_profit,
        )
        from eeecs485_p4_mapreduce_spark.plans.explain import (
            assert_broadcast_join,
            assert_pushed_filter,
        )

        df = q37_product_profit(spark, sf_dir)
        assert_broadcast_join(df)
        assert_pushed_filter(df, "p_name")

    def test_q38_disjunction_prefilters_both_scans(self, spark, sf_dir):
        """Q19-pattern: the part-only OR reaches the part scan and the
        quantity hull [1, 30] reaches the lineitem scan."""
        from eeecs485_p4_mapreduce_spark.operators.relational import (
            q38_disjunctive_revenue,
        )
        from eeecs485_p4_mapreduce_spark.plans.explain import (
            assert_broadcast_join,
            assert_pushed_filter,
        )

        df = q38_disjunctive_revenue(spark, sf_dir)
        assert_broadcast_join(df)
        assert_pushed_filter(df, "l_quantity")

    def test_q39_single_lineitem_scan_no_self_join(self, spark, sf_dir):
        """Q21-pattern without the textbook EXISTS/NOT-EXISTS self-joins:
        lineitem appears in the plan exactly once."""
        from eeecs485_p4_mapreduce_spark.operators.relational import (
            q39_lone_return_suppliers,
        )
        from eeecs485_p4_mapreduce_spark.plans.explain import formatted_plan

        plan = formatted_plan(q39_lone_return_suppliers(spark, sf_dir))
        assert plan.count("lineitem.parquet") == 1

    def test_orc_roundtrip(self, spark, sf_dir, tmp_path):
        from eeecs485_p4_mapreduce_spark.catalog import load_table
        from eeecs485_p4_mapreduce_spark.sources.readers import read_orc, write_orc

        nation = load_table(spark, sf_dir, "nation")
        write_orc(nation, str(tmp_path / "nation.orc"))
        back = read_orc(spark, str(tmp_path / "nation.orc"))
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, nation.collect())
        )

    def test_q36_only_fact_joins_shuffle(self, spark, sf_dir):
        """Q7-pattern: dimensions broadcast; at most the orders/customer
        and lineitem/orders joins plus the final agg exchange shuffle."""
        from eeecs485_p4_mapreduce_spark.operators.relational import (
            q36_volume_shipping,
        )
        from eeecs485_p4_mapreduce_spark.plans.explain import (
            assert_broadcast_join,
            count_exchanges,
        )

        df = q36_volume_shipping(spark, sf_dir)
        assert_broadcast_join(df)
        assert count_exchanges(df) <= 3

    def test_contamination_broadcasts_benchmark(self, spark, sf_dir):
        """The eval-set shingle probe must broadcast (the corpus-side
        shingle stream never shuffles for the join)."""
        from eeecs485_p4_mapreduce_spark.operators.pipeline import (
            curate_contamination,
        )
        from eeecs485_p4_mapreduce_spark.plans.explain import (
            assert_broadcast_join,
        )

        assert_broadcast_join(curate_contamination(spark, sf_dir))

    def test_q43_single_agg_exchange(self, spark, sf_dir):
        from eeecs485_p4_mapreduce_spark.operators.relational import (
            q43_sliding_window_trend,
        )
        from eeecs485_p4_mapreduce_spark.plans.explain import count_exchanges

        assert count_exchanges(q43_sliding_window_trend(spark, sf_dir)) == 1

    def test_csv_permissive_quarantines_bad_rows(self, spark, tmp_path):
        from eeecs485_p4_mapreduce_spark.sources.readers import read_csv_permissive

        p = tmp_path / "feed.csv"
        p.write_text("id,qty\n1,10\n2,notanumber\n3,30\n")
        df = read_csv_permissive(
            spark, str(p), "id INT, qty INT"
        ).cache()
        good = df.filter("_corrupt_record IS NULL")
        bad = df.filter("_corrupt_record IS NOT NULL")
        assert sorted((r.id, r.qty) for r in good.collect()) == [(1, 10), (3, 30)]
        assert [r._corrupt_record for r in bad.collect()] == ["2,notanumber"]

    def test_zorder_bounds_both_dimensions(self, spark, sf_dir):
        """Data-skipping property: single-key range partitioning leaves
        the second key spanning ~its whole domain in every partition
        (predicates on it skip nothing); z-order clustering bounds BOTH
        keys' average per-partition span under half their domains."""
        from pyspark.sql import functions as F

        from eeecs485_p4_mapreduce_spark.catalog import load_table
        from eeecs485_p4_mapreduce_spark.sources.layout import zorder_by

        li = load_table(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_orderkey"
        )
        full = li.agg(
            (F.max("l_partkey") - F.min("l_partkey")).alias("fp"),
            (F.max("l_orderkey") - F.min("l_orderkey")).alias("fo"),
        ).first()

        def avg_span_ratios(df):
            parts = (
                df.withColumn("pid", F.spark_partition_id())
                .groupBy("pid")
                .agg(
                    (F.max("l_partkey") - F.min("l_partkey")).alias("dp"),
                    (F.max("l_orderkey") - F.min("l_orderkey")).alias("do"),
                )
            )
            r = parts.agg(F.avg("dp"), F.avg("do")).first()
            return r[0] / full.fp, r[1] / full.fo

        naive_p, naive_o = avg_span_ratios(
            li.repartitionByRange(16, "l_partkey")
        )
        z_p, z_o = avg_span_ratios(zorder_by(li, "l_partkey", "l_orderkey", 16))
        assert naive_o > 0.9  # second key unbounded under single-key range
        assert z_p < 0.5 and z_o < 0.5  # both keys bounded under z-order
        assert z_o < naive_o / 2


def test_no_python_udfs_outside_multimodal(spark, sf_dir):
    """Systemic 100 TB gate: every registered query's physical plan must
    stay JVM-side — no row-at-a-time BatchEvalPython anywhere, and
    Arrow-batched Python only in the multimodal family (whose whole
    point is hosting the decode UDFs)."""
    from eeecs485_p4_mapreduce_spark.plans.explain import formatted_plan
    from eeecs485_p4_mapreduce_spark.registry import QUERIES, load_all

    load_all()
    # Justified Arrow-batched Python outside multimodal: dense all-pairs
    # cosine is BLAS-shaped math (vectorized numpy kernel, 27x faster
    # than per-pair JVM array folds — see its docstring); the Avro OCF
    # roundtrip is a byte-level container codec — the mm_ walker class
    # under a q-number (neither engine ships an Avro reader, so the
    # from-scratch codec IS the query; see staged_r19's section
    # comment).
    # q114 joined the same codec class at the r10 staged_r20 flip:
    # Protocol Buffers wire format, hand-walked for the identical
    # reason (neither engine ships a protobuf reader).
    allowed = {
        "dedup_embedding_cosine",
        "q109_avro_roundtrip",
        "q114_protobuf_roundtrip",
    }
    offenders = []
    for name, fn in sorted(QUERIES.items()):
        if name.startswith("mm_") or name in allowed:
            continue  # multimodal: ArrowEvalPython/mapInPandas by design
        df = fn(spark, sf_dir)
        plan = formatted_plan(df)
        if "BatchEvalPython" in plan or "ArrowEvalPython" in plan or (
            "MapInPandas" in plan
        ):
            offenders.append(name)
    assert not offenders, f"Python in hot path: {offenders}"


def test_no_unpartitioned_fact_windows(spark, sf_dir):
    """Systemic 100 TB gate (VERDICT r2 items 1-2): no registered query
    may run a partition-less window directly over a scan-sized relation
    — that moves the whole fact table to ONE task. Global top-k must be
    ``orderBy().limit()`` (TakeOrderedAndProject) with ranks derived over
    the k survivors; global windows are only legal over aggregate- or
    limit-bounded inputs (q52/q65/curate_lang_balance pass because the
    detector sees the bounding aggregate, not via allowlist)."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from eeecs485_p4_mapreduce_spark.plans.explain import (
        unpartitioned_fact_windows,
    )
    from eeecs485_p4_mapreduce_spark.registry import QUERIES, load_all

    # Positive control first: the detector must flag the anti-pattern,
    # else an empty offender list proves nothing.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = docs.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("n_chars")))
    )
    assert unpartitioned_fact_windows(bad), "detector missed positive control"

    load_all()
    offenders = {}
    for name, fn in sorted(QUERIES.items()):
        off = unpartitioned_fact_windows(fn(spark, sf_dir))
        if off:
            offenders[name] = off[0][:160]
    assert not offenders, f"unpartitioned fact-sized windows: {offenders}"


def test_no_dimension_bounded_fact_windows(spark, sf_dir):
    """The q28 lesson, made systemic: a window partitioned ONLY by
    fixed-domain dimension columns (priority, status, lang, ...) over a
    scan-sized input caps parallelism at the dimension cardinality — 5
    tasks forever — which the x10 replica probe measured at 6.5x wall
    for 10x rows. The fix is the two-level prefix decomposition
    (bucket-local window + broadcast bucket prefixes, q28/q57 style).
    Windows over aggregate-bounded input pass via the bounder check, not
    an allowlist."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from eeecs485_p4_mapreduce_spark.plans.explain import (
        dimension_bounded_windows,
    )
    from eeecs485_p4_mapreduce_spark.registry import QUERIES, load_all

    # positive control: the pre-rewrite q28 shape must flag
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bad = orders.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("o_orderpriority").orderBy(
                F.desc("o_totalprice")
            )
        ),
    )
    assert dimension_bounded_windows(bad), "detector missed positive control"

    # second positive control: a PARTITION-ONLY window (no ORDER BY)
    # renders just two bracket groups in the plan ([funcs], [part]) and
    # was invisible to the first detector version — it still caps
    # parallelism at the dimension cardinality and must flag.
    bad2 = orders.withColumn(
        "prio_total",
        F.sum("o_totalprice").over(Window.partitionBy("o_orderstatus")),
    )
    assert dimension_bounded_windows(bad2), (
        "detector missed partition-only (no ORDER BY) positive control"
    )

    # q40's final per-segment rank consumes only rows semi-joined against
    # the windowed bucket-count prune (before < 3) — bounded at runtime,
    # but the static line-walker cannot see through the join to know the
    # probe side was pruned, so it still reports the scan.
    allowed = {"q40_sql_surface"}
    load_all()
    offenders = {}
    cartesian = []
    for name, fn in sorted(QUERIES.items()):
        df = fn(spark, sf_dir)
        # ride the same per-query plan build: no true cartesian product
        # may appear anywhere in the registry (broadcast nested-loop
        # against a scalar/packed row is fine; CartesianProduct — an
        # all-pairs shuffle explosion — never is)
        if "CartesianProduct" in df._jdf.queryExecution().executedPlan().toString():
            cartesian.append(name)
        if name in allowed:
            continue
        off = dimension_bounded_windows(df)
        if off:
            offenders[name] = off[0][:160]
    assert not cartesian, f"CartesianProduct in plans: {cartesian}"
    assert not offenders, f"dimension-cardinality-bounded windows: {offenders}"


def test_observe_quality_metrics_ride_the_action(spark, sf_dir):
    """Observation metrics must match a separately-computed count/null scan
    while costing zero extra jobs (they ride the main action)."""
    from eeecs485_p4_mapreduce_spark.catalog import load_table
    from eeecs485_p4_mapreduce_spark.plans.observe import observe_quality

    orders = load_table(spark, sf_dir, "orders")
    inst, obs = observe_quality(
        orders.filter("o_totalprice > 1000"), "t_obs", ("o_orderpriority",)
    )
    n = inst.count()
    got = obs.get
    assert got["n_rows"] == n
    want_nulls = (
        orders.filter("o_totalprice > 1000")
        .filter("o_orderpriority IS NULL")
        .count()
    )
    assert got["nulls_o_orderpriority"] == want_nulls


def test_cli_list_and_oracle_run(spark, sf_dir, capsys):
    """The query-runner CLI must list every registered query and pass an
    --oracle run in-process (it reuses the active session)."""
    from eeecs485_p4_mapreduce_spark.__main__ import main
    from eeecs485_p4_mapreduce_spark.registry import QUERIES, load_all

    load_all()
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    for name in QUERIES:
        assert name in out

    rc = main(["run", "q01_pricing_summary", "--sf-dir", sf_dir, "--oracle"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "q01_pricing_summary: PASS" in out

    rc = main(
        [
            "sql",
            "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1",
            "--sf-dir",
            sf_dir,
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "o_orderstatus" in out


def test_aqe_splits_skewed_join_partitions(spark, tmp_path):
    """AQE's runtime skew-join handling must actually fire on a pathological
    key distribution: one key holding ~95% of the left side. This is the
    engine's no-code-change answer to skew (the salted operators in
    operators/skew.py are the explicit-control alternative); the executed
    plan must show the sort-merge join marked skew=true with the hot
    partition split into multiple reader tasks."""
    left_path = str(tmp_path / "skew_left")
    right_path = str(tmp_path / "skew_right")
    spark.range(300_000).selectExpr(
        "CASE WHEN id % 20 != 0 THEN 0 ELSE id % 100 END AS k", "id AS v"
    ).write.mode("overwrite").parquet(left_path)
    spark.range(100).selectExpr("id AS k", "id * 10 AS w").write.mode(
        "overwrite"
    ).parquet(right_path)

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_skew_factor = spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    old_skew_bytes = spark.conf.get(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    )
    old_advisory = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    try:
        # force a sort-merge join and thresholds small enough that the test
        # dataset's hot partition counts as skewed
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        joined = spark.read.parquet(left_path).join(
            spark.read.parquet(right_path), "k"
        )
        # execute THIS DataFrame's own plan (count() would compile a
        # separate query and leave joined's AQE plan unfinalized)
        n = len(joined.collect())
        assert n == 300_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE skew join did not trigger:\n{plan[:2000]}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", old_skew_factor)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", old_skew_bytes
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", old_advisory)


def test_runtime_bloom_filter_on_selective_join(spark, tmp_path):
    """A selective dim-side filter must inject a runtime bloom filter into
    the fact-side scan of a shuffle join — the row-level sibling of DPP
    that prunes shuffle input when the fact table isn't partitioned on the
    join key. At 100 TB this is the difference between shuffling the whole
    fact table and shuffling only rows whose key might match the filtered
    dim. Thresholds are lowered so the test-sized fact side qualifies as
    'large'; the engine leaves them at defaults."""
    fact_path = str(tmp_path / "bloom_fact")
    dim_path = str(tmp_path / "bloom_dim")
    spark.range(500_000).selectExpr("id AS k", "id * 2 AS v").write.mode(
        "overwrite"
    ).parquet(fact_path)
    spark.range(1000).selectExpr("id * 500 AS k", "id AS w").write.mode(
        "overwrite"
    ).parquet(dim_path)

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_scan = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    try:
        # force the shuffle-join path (a broadcast join needs no bloom
        # filter) and let the test-sized fact side count as scan-heavy
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        joined = spark.read.parquet(fact_path).join(
            spark.read.parquet(dim_path).filter(F.col("w") < 100), "k"
        )
        optimized = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized.lower(), optimized[:2000]
        assert joined.count() == 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_scan,
        )


def test_dynamic_partition_pruning_on_hive_layout(spark, tmp_path):
    """A fact table hive-partitioned on the join key must get a runtime
    dynamicpruning filter from the dim side's predicate — the mechanism
    that turns a 100 TB full scan into a few-partition scan when the dim
    filter only resolves at run time (no static literal to push down)."""
    from eeecs485_p4_mapreduce_spark.plans.explain import formatted_plan
    from eeecs485_p4_mapreduce_spark.sources.readers import write_partitioned

    fact = spark.range(10_000).selectExpr(
        "id", "id % 50 AS dim_id", "cast(id % 10 AS string) AS region"
    )
    path = str(tmp_path / "fact_parted")
    write_partitioned(fact, path, ["region"])

    dim = spark.range(10).selectExpr(
        "cast(id AS string) AS region", "id AS pop"
    )
    joined = (
        spark.read.parquet(path)
        .join(dim.filter(F.col("pop") >= 8), "region")
        .groupBy("region")
        .count()
    )
    plan = formatted_plan(joined)
    assert "dynamicpruning" in plan.lower()
    assert joined.count() == 2  # regions 8 and 9 only


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Files written before a column existed must read as null for that
    column under merge_schema=True, and the evolved column must still
    support predicate pushdown."""
    from eeecs485_p4_mapreduce_spark.sources.readers import read_parquet

    path = str(tmp_path / "evolving")
    spark.range(5).selectExpr("id", "id * 2 AS a").write.mode(
        "overwrite"
    ).parquet(path)
    spark.range(5, 10).selectExpr(
        "id", "id * 2 AS a", "id * 3 AS b"
    ).write.mode("append").parquet(path)

    df = read_parquet(spark, path, merge_schema=True)
    assert set(df.columns) == {"id", "a", "b"}
    rows = {r.id: (r.a, r.b) for r in df.collect()}
    assert len(rows) == 10
    assert rows[0] == (0, None)       # old file: evolved column is null
    assert rows[9] == (18, 27)        # new file: fully populated
    assert df.filter("b IS NULL").count() == 5


def test_compaction_hits_target_file_count(spark, tmp_path):
    """Compaction must rewrite a many-small-files directory into
    ceil(total_bytes / target) files with identical contents; the sorted
    variant must additionally leave files covering disjoint key ranges
    (the data-skipping property the rewrite exists for)."""
    from eeecs485_p4_mapreduce_spark.sources.layout import (
        compact_parquet,
        list_data_files,
    )

    src = str(tmp_path / "fragmented")
    # 64 tiny files; round-robin repartition scatters ids across all of them
    spark.range(20_000).selectExpr("id", "id * 2 AS v").repartition(
        64
    ).write.parquet(src)
    files = list_data_files(spark, src)
    assert len(files) == 64
    total = sum(sz for _, sz in files)
    target = total // 4  # aim for ~4 output files

    out = str(tmp_path / "compacted")
    audit = compact_parquet(spark, src, out, target_file_bytes=target)
    expected = -(-total // target)
    assert audit["files_in"] == 64
    assert audit["files_out"] == expected <= 5

    back = spark.read.parquet(out)
    assert back.count() == 20_000
    assert back.agg(F.sum("v")).first()[0] == spark.read.parquet(src).agg(
        F.sum("v")
    ).first()[0]

    # sorted compaction: per-file id ranges must not overlap
    out_sorted = str(tmp_path / "compacted_sorted")
    compact_parquet(spark, src, out_sorted, target_file_bytes=target, sort_by=["id"])
    ranges = (
        spark.read.parquet(out_sorted)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(ranges) > 1
    for prev, cur in zip(ranges, ranges[1:]):
        assert prev.hi < cur.lo
