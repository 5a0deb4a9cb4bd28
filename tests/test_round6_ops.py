"""Semantics / guarantee tests for the round-6 operator batch beyond the
oracle hash gate: bloom prefilter properties, SCD2 on a constructed
fixture (the sf events data is degenerate — every user emits every event
type — so drop-out/run-collapse semantics need adversarial rows, the q73
lesson), CMS guarantees on raw estimates, and scalar-quantization error
bounds recomputed in numpy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_bloom_prefilter_no_false_negatives_and_selective(spark, sf_dir):
    """The bitmap must pass EVERY true match (no false negatives — a
    Bloom structural invariant) while filtering out a real fraction of
    the non-matching probe rows (otherwise it's dead weight in the
    plan)."""
    from eeecs485_p4_mapreduce_spark.catalog import load_table
    from eeecs485_p4_mapreduce_spark.operators.relational import (
        Q74_PRICE_MIN,
        bloom_build,
        bloom_might_contain,
    )

    lineitem = load_table(spark, sf_dir, "lineitem")
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > Q74_PRICE_MIN)
        .select("o_orderkey")
    )
    bloom = bloom_build(keys, "o_orderkey")
    flagged = lineitem.crossJoin(F.broadcast(bloom)).withColumn(
        "might", bloom_might_contain("l_orderkey")
    )
    true_matches = flagged.join(
        keys, flagged["l_orderkey"] == keys["o_orderkey"], "left_semi"
    )
    n_total = lineitem.count()
    n_candidates = flagged.filter("might").count()
    n_true = true_matches.count()
    missed = true_matches.filter(~F.col("might")).count()
    assert missed == 0, "bloom false negative"
    # false-positive rate over the NON-matching rows must be small
    # (split-block: 32768 words, 3 bits/key in ONE word, ~4.5k build
    # keys at sf0.001 -> ~0.14 keys/word -> fp ~ (3c/64)^3 << 10%)
    fp_rate = (n_candidates - n_true) / max(1, n_total - n_true)
    assert fp_rate < 0.10, fp_rate


def test_scd2_constructed_fixture(spark, tmp_path):
    """Run-collapse semantics on adversarial rows: consecutive repeats
    merge, alternations do not, versions count per user, exactly one
    current row per user, intervals chain without gaps."""
    from eeecs485_p4_mapreduce_spark.operators.relational import (
        q75_scd2_dimension,
    )

    rows = [
        # user 7: A A B A  -> runs A(2) B(1) A(1)
        (1, "2024-01-01 00:00:00", 7, "A", 1.0, "{}"),
        (2, "2024-01-01 01:00:00", 7, "A", 1.0, "{}"),
        (3, "2024-01-01 02:00:00", 7, "B", 1.0, "{}"),
        (4, "2024-01-01 03:00:00", 7, "A", 1.0, "{}"),
        # user 9: single event -> one current run
        (5, "2024-02-02 10:00:00", 9, "Z", 2.0, "{}"),
        # user 11: same-ts tiebreak by event_id -> C then D
        (6, "2024-03-03 05:00:00", 11, "C", 0.0, "{}"),
        (7, "2024-03-03 05:00:00", 11, "D", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
        " value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {
        (r.user_id, r.version): r
        for r in q75_scd2_dimension(spark, str(tmp_path)).collect()
    }
    assert len(out) == 6
    assert [out[(7, v)].state for v in (1, 2, 3)] == ["A", "B", "A"]
    assert out[(7, 1)].n_events == 2
    assert out[(7, 1)].valid_to == out[(7, 2)].valid_from
    assert out[(7, 2)].valid_to == out[(7, 3)].valid_from
    assert out[(7, 3)].valid_to == "9999-12-31 00:00:00"
    assert [out[(7, v)].is_current for v in (1, 2, 3)] == [0, 0, 1]
    assert out[(9, 1)].state == "Z" and out[(9, 1)].is_current == 1
    assert [out[(11, v)].state for v in (1, 2)] == ["C", "D"]


def test_cms_raw_estimate_guarantees(spark, sf_dir):
    """Beyond the registered booleans: recompute the raw CMS estimates
    and pin est >= exact for EVERY vocabulary token (not just top-k),
    plus the aggregate overestimate bound for the top-k."""
    from eeecs485_p4_mapreduce_spark.catalog import load_table
    from eeecs485_p4_mapreduce_spark.functions.text import tokens
    from eeecs485_p4_mapreduce_spark.operators.text_analysis import (
        CMS_D,
        CMS_W,
        ta_heavy_hitters_cms,
    )

    out = ta_heavy_hitters_cms(spark, sf_dir).collect()
    assert len(out) == 10
    assert all(r.cms_ge_exact and r.cms_within_bound for r in out)

    # raw estimates via the same hash family, checked in python
    toks = [
        r.token
        for r in load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens()).alias("token"))
        .collect()
    ]
    from collections import Counter

    exact = Counter(toks)
    cells = [Counter() for _ in range(CMS_D)]
    hashed = (
        spark.createDataFrame([(t,) for t in sorted(exact)], "token string")
        .select(
            "token",
            *[
                F.pmod(F.xxhash64("token", F.lit(s)), F.lit(CMS_W)).alias(
                    f"b{s}"
                )
                for s in range(CMS_D)
            ],
        )
        .collect()
    )
    buckets = {r.token: [r[f"b{s}"] for s in range(CMS_D)] for r in hashed}
    for t, n in exact.items():
        for s in range(CMS_D):
            cells[s][buckets[t][s]] += n
    for t, n in exact.items():
        est = min(cells[s][buckets[t][s]] for s in range(CMS_D))
        assert est >= n, (t, est, n)


def test_scalar_quantize_error_bound(spark, sf_dir):
    """Recompute in numpy: every code in [0, 255], and the per-dim
    reconstruction error never exceeds half a quantization step."""
    from eeecs485_p4_mapreduce_spark.catalog import load_table
    from eeecs485_p4_mapreduce_spark.operators.similarity import (
        sim_scalar_quantize,
    )

    emb = np.array(
        [
            r.embedding
            for r in load_table(spark, sf_dir, "embeddings")
            .orderBy("vec_id")
            .collect()
        ],
        dtype=np.float64,
    )
    mn, mx = emb.min(axis=0), emb.max(axis=0)
    span = np.where(mx > mn, mx - mn, 1.0)
    codes = np.floor(255.0 * (emb - mn) / span + 0.5)
    assert codes.min() >= 0 and codes.max() <= 255
    recon = mn + codes * span / 255.0
    err = np.abs(np.where(mx > mn, emb - recon, 0.0))
    step = span / 255.0
    assert (err <= step / 2 + 1e-12).all()

    out = {r.vec_id: r for r in sim_scalar_quantize(spark, sf_dir).collect()}
    sums = codes.astype(np.int64).sum(axis=1)
    for i, r in enumerate(
        sorted(out.values(), key=lambda r: r.vec_id)
    ):
        assert r.sum_code == sums[r.vec_id]
        assert r.n_dims == emb.shape[1]
        assert r.sq_err_e12 >= 0


def test_perplexity_buckets_are_language_local_thirds(spark, sf_dir):
    """Each language splits into exactly head/middle/tail, counts sum to
    the language's doc count, and head/tail sizes differ from n/3 only
    by tie-induced spill (bounded by the largest tied score group)."""
    from eeecs485_p4_mapreduce_spark.catalog import load_table
    from eeecs485_p4_mapreduce_spark.operators.pipeline import (
        curate_perplexity_buckets,
    )

    out = curate_perplexity_buckets(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    per_lang = {
        r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    by_lang: dict[str, dict[str, int]] = {}
    for r in out:
        by_lang.setdefault(r.lang, {})[r.bucket] = r.n_docs
        assert r.worst_logprob <= r.best_logprob
    for lang, buckets in by_lang.items():
        assert set(buckets) == {"head", "middle", "tail"}, (lang, buckets)
        assert sum(buckets.values()) == per_lang[lang]
        # head gets the BEST (highest) logprob scores
    # ordering: every head doc scores >= every tail doc within a language
    rows = {(r.lang, r.bucket): r for r in out}
    for lang in by_lang:
        assert (
            rows[(lang, "head")].worst_logprob
            >= rows[(lang, "middle")].best_logprob
        )
        assert (
            rows[(lang, "middle")].worst_logprob
            >= rows[(lang, "tail")].best_logprob
        )


def test_gif_animation_stats_matches_direct_compose(spark, sf_dir):
    """Cross-check the registered query's decoded sums against a direct
    numpy composition for a sample of ids — independent of both the
    oracle's closed form and the decoder's compositor."""
    from eeecs485_p4_mapreduce_spark.operators.multimodal import (
        _GIF_ANIM_PAL,
        mm_gif_animation_stats,
    )

    out = {r.media_id: r for r in mm_gif_animation_stats(spark, sf_dir).collect()}
    pal = np.array(_GIF_ANIM_PAL, dtype=np.int64)
    for d in list(out)[:25]:
        h, w = 4 + d % 3, 5 + d % 4
        a, b = 1 + d % 7, 1 + (d * 3 + 1) % 7
        canvas = np.zeros((h, w, 3), np.int64)
        canvas[:] = pal[a]            # frame 0 survives its disposal
        frame0_sum = canvas.sum()
        canvas[1:3, 1:3] = pal[b]     # frame 1 patch at (1, 1)
        r = out[d]
        assert r.n_frames == 2
        assert r.last_frame_sum == canvas.sum()
        assert r.all_frames_sum == frame0_sum + canvas.sum()
        assert (r.canvas_h, r.canvas_w) == (h, w)


def test_bloom_filter_sits_below_semi_join(spark, sf_dir):
    """Plan-shape pin for the q74 prefilter: the scalar-subquery probe
    must appear in a Filter on the lineitem scan side BELOW the
    LeftSemi join — the crossJoin(broadcast) formulation gets
    join-reordered to semi-join-first, which defeats the prefilter."""
    from eeecs485_p4_mapreduce_spark.operators.relational import (
        q74_bloom_semi_join,
    )
    from eeecs485_p4_mapreduce_spark.plans.explain import formatted_plan

    plan = formatted_plan(q74_bloom_semi_join(spark, sf_dir))
    semi_at = plan.index("LeftSemi")
    # the bloom probe is the only xxhash64(..) in the plan; its Filter
    # node must be on the probe (left/first) side: its tree line shows
    # deeper than the join and the Condition section references the scan
    assert "Subquery" in plan and "xxhash64" in plan
    # structural check: the Filter carrying the subquery probes scans
    # lineitem (l_orderkey), not the joined output
    import re

    cond = next(
        s for s in plan.split("\n\n")
        if s.startswith("(2) Filter") or "Subquery" in s and "Filter" in s
    )
    assert "l_orderkey" in cond
    tree = plan[: plan.index("(1) Scan")]
    filter_line = next(
        ln for ln in tree.splitlines() if re.search(r"\bFilter\b", ln)
    )
    join_line = next(ln for ln in tree.splitlines() if "LeftSemi" in ln)
    # deeper indentation = below in the plan tree
    assert len(filter_line) - len(filter_line.lstrip(" :+-")) > len(
        join_line
    ) - len(join_line.lstrip(" :+-"))
