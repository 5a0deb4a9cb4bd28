"""Queries STAGED for round-8 registration (implemented + oracle-proven
in round 7, registered next round).

Round 7 used its ~10-query registration budget on the staged_r7 batch
(the rotation-coverage cap set by the round-4 verdict: the driver's
50-slot window must keep cycling the proven block every ~4 rounds).
This module holds the next batch — built, pytest hash-checked against
DuckDB (tests/test_staged_r8.py), plan-gate compliant, and x10-probed
NOW, so the round-8 flip is ``register_staged()`` plus deleting this
staging note. Same contract as every registered query: identical
aliases both sides, round()-ed or integer-exact outputs, no nullable
hash-bearing columns.

Staged surface:

- ``q78_bom_explosion`` — recursive hierarchy roll-up (BOM explosion):
  parts form a synthetic 8-ary parent tree and per-path quantity
  products roll costs up to each root. Spark side is GENERIC pointer
  doubling over an edge table (O(log depth) self-joins, the transitive-
  closure technique dedup_cc_clusters uses for components), never the
  O(depth) naive loop; the oracle is DuckDB's native WITH RECURSIVE.
- ``q79_event_pattern`` — MATCH_RECOGNIZE-style sequence pattern
  counts: each user's ts-ordered event types become a character string
  (c/e/p/s/v) and three regex patterns (adjacent conversion, conversion
  with click/error noise, signup-to-first-purchase) are counted per
  user with non-overlapping leftmost matching — identical semantics in
  Java regex and RE2 for these backtrack-free patterns.
- ``q80_skyline_orders`` — 3-D skyline (Pareto frontier: maximize
  price, minimize date, minimize priority rank) over distinct
  (prio, date, cents) points. Both sides use the quadrant-running-max
  characterization (a deduped point is on the skyline iff it strictly
  tops every point in its dominance quadrant), which is O(n log n) —
  the NOT EXISTS all-pairs oracle was measured >180 s at sf0.01 and
  rejected. A constructed fixture pins the tie cases independently.
- ``q81_decayed_engagement`` — exponential time-decay scoring (the
  feature-store recency weight): score = sum(value_cents * 2^(-age/14d))
  with the decay factor rounded to integer micros per row BEFORE the
  sum, so aggregation is exact BIGINT and shuffle-order-proof.
- ``ta_textrank_keywords`` — TextRank (Mihalcea & Tarau 2004) over the
  corpus co-occurrence graph: damped power iteration, 3 rounds, in
  integer fixed-point (per-edge floor division) so both engines agree
  bit-for-bit with no float accumulation anywhere.
- ``curate_domain_temperature`` — temperature-scaled domain mixture
  (the multinomial sampling weights LLM data recipes use, tau = 0.7):
  per-source weight n_docs^tau normalized into integer ppm shares and
  an implied epochs-per-domain for a one-epoch token budget.
- ``mm_mp4_boxes`` — REAL ISO BMFF (MP4) container walk: each document
  synthesizes an ftyp/moov/trak/mdat box tree (including a 64-bit
  largesize mdat on every 5th doc) and the executors re-parse it with a
  strict recursive box walker; emitted columns come from the PARSE.
- ``mm_mp3_frames`` — REAL MPEG-1 Layer III frame-header walk: an
  ID3v2-tagged stream of variable-bitrate frames is built per document
  and parsed back (syncsafe tag skip, bitrate/padding tables, frame
  length arithmetic); duration and byte totals come from the walk.
- ``stream_quantile_histogram`` — streaming exact quantiles from
  mergeable state: foreachBatch merges per-(event_type, bucket) counts
  into a stored histogram snapshot (the mergeable-sketch pattern), and
  the final answer interpolates the exact bucket median from the
  merged histogram — order-insensitive, so replay-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eeecs485_p4_mapreduce_spark.catalog import load_table

# ---------------------------------------------------------------------------
# q78: BOM explosion / recursive hierarchy roll-up. TPC-H has no
# hierarchy column, so one is synthesized from arithmetic everyone can
# recompute: node = p_partkey, parent(node) = node div 8 for node >= 8,
# roots are partkeys 0..7; the edge into a node carries quantity
# 1 + node % 3 and each node costs round(p_retailprice * 100) cents.
# The REGISTERED computation never exploits the div-8 structure: it
# builds an (node, parent, qty) edge table and runs generic pointer
# doubling — after k rounds each node's pointer reaches its 2^k-th
# ancestor (saturating at the root, whose pointer self-loops), carrying
# the hop count and the exact product of edge quantities. 4 rounds
# cover depth <= 16 = 8^16 parts; each round is ONE self-join shuffle,
# so 100 TB cost is O(log depth) shuffles vs O(depth) for the naive
# loop the oracle runs. Products stay tiny (qty <= 3, depth <= 16).
# ---------------------------------------------------------------------------
Q78_ORACLE = """
    WITH RECURSIVE walk AS (
      SELECT p_partkey AS root, p_partkey AS node, 0 AS depth,
             CAST(1 AS BIGINT) AS prod
      FROM part WHERE p_partkey < 8
      UNION ALL
      SELECT w.root, p.p_partkey, w.depth + 1,
             w.prod * (1 + p.p_partkey % 3)
      FROM walk w
      JOIN part p ON p.p_partkey // 8 = w.node AND p.p_partkey >= 8
    )
    SELECT w.root,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(max(w.depth) AS BIGINT) AS max_depth,
           CAST(sum(w.prod) AS BIGINT) AS total_weight,
           CAST(sum(w.prod * CAST(round(p.p_retailprice * 100, 0)
                                  AS BIGINT)) AS BIGINT)
             AS rolled_cost_cents
    FROM walk w JOIN part p ON p.p_partkey = w.node
    GROUP BY w.root
"""


def q78_bom_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roll every part up to its root assembly (see section comment):
    generic pointer doubling over an (node, parent, qty) edge table.
    State rows are (node, ptr, depth, prod); each round joins the state
    to itself on ptr = node, composing pointer jumps; roots self-loop
    with (depth 0, prod 1) so saturated rows are fixpoints. 4 rounds =
    4 shuffles regardless of data size (depth grows with log8 of part
    count); localCheckpoint between rounds keeps the plan O(1) deep."""
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"),
        F.expr("cast(round(p_retailprice * 100, 0) as bigint)").alias(
            "cents"
        ),
    )
    state = part.select(
        "node",
        F.when(F.col("node") < 8, F.col("node"))
        .otherwise(F.expr("node div 8"))
        .alias("ptr"),
        F.when(F.col("node") < 8, F.lit(0)).otherwise(F.lit(1)).alias(
            "depth"
        ),
        F.when(F.col("node") < 8, F.lit(1))
        .otherwise(1 + F.col("node") % 3)
        .cast("long")
        .alias("prod"),
    )
    for _ in range(4):  # 2^4 = 16 >= any realistic tree depth (8^16 parts)
        jump = state.select(
            F.col("node").alias("j_node"),
            F.col("ptr").alias("j_ptr"),
            F.col("depth").alias("j_depth"),
            F.col("prod").alias("j_prod"),
        )
        state = (
            state.join(jump, state["ptr"] == jump["j_node"])
            .select(
                "node",
                F.col("j_ptr").alias("ptr"),
                (F.col("depth") + F.col("j_depth")).alias("depth"),
                (F.col("prod") * F.col("j_prod")).alias("prod"),
            )
            .localCheckpoint()
        )
    return (
        state.join(part, "node")
        .groupBy(F.col("ptr").alias("root"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.max("depth").cast("long").alias("max_depth"),
            F.sum("prod").alias("total_weight"),
            F.sum(F.col("prod") * F.col("cents")).alias(
                "rolled_cost_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q79: sequence pattern matching (the MATCH_RECOGNIZE workload). Each
# user's events, ordered by (ts, event_id), become one character per
# event — the FIRST LETTER of the event type, which is unique across
# the five types (click/error/purchase/signup/view -> c/e/p/s/v) and
# asserted so by a guard both sides share (a non-matching type would
# change the alphabet silently). Patterns are backtrack-free (no
# nested quantifiers, no alternation overlap), so Java regex (Spark)
# and RE2 (DuckDB) both produce the same non-overlapping leftmost-
# greedy match count. Per-user strings are bounded by per-user event
# counts (the q19-sessionize bound); at 100 TB the concat happens
# after one shuffle on user_id and each pattern pass is a map-side
# regexp over the per-user strings.
# ---------------------------------------------------------------------------
Q79_PATTERNS = (
    ("adjacent_conversion", "vp"),
    ("noisy_conversion", "v[ce]*p"),
    ("signup_to_purchase", "s[^p]*p"),
)

Q79_ORACLE = f"""
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS s
      FROM events GROUP BY user_id
    ), pats(pattern_name, pattern) AS (
      VALUES {", ".join(f"('{n}', '{p}')" for n, p in Q79_PATTERNS)}
    ), hits AS (
      SELECT pattern_name, pattern,
             len(regexp_extract_all(s, pattern)) AS m
      FROM seqs CROSS JOIN pats
    )
    SELECT pattern_name, pattern,
           CAST(sum(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_users_matched,
           CAST(sum(m) AS BIGINT) AS total_matches,
           CAST(max(m) AS BIGINT) AS max_matches_per_user
    FROM hits GROUP BY pattern_name, pattern
"""


def q79_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count non-overlapping regex pattern matches over each user's
    ts-ordered event-type string (see section comment). The per-user
    string is built once (sort_array over collected (ts, event_id,
    char) structs — deterministic total order) and checkpointed so the
    three pattern passes don't recompute the shuffle; Spark requires
    regex literals to be foldable, so each pattern is its own map-side
    pass unioned at the end (3 scans of the tiny per-user table, not 3
    shuffles)."""
    events = load_table(spark, sf_dir, "events")
    seqs = (
        events.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                "ts",
                                "event_id",
                                F.substring("event_type", 1, 1).alias(
                                    "ch"
                                ),
                            )
                        )
                    ),
                    lambda s: s["ch"],
                ),
                "",
            ).alias("s")
        )
        .localCheckpoint()
    )
    parts = []
    for name, pat in Q79_PATTERNS:
        m = F.size(F.regexp_extract_all(F.col("s"), F.lit(pat), F.lit(0)))
        parts.append(
            seqs.select(m.alias("m")).agg(
                F.lit(name).alias("pattern_name"),
                F.lit(pat).alias("pattern"),
                F.sum(F.when(F.col("m") > 0, 1).otherwise(0)).alias(
                    "n_users_matched"
                ),
                F.sum("m").cast("long").alias("total_matches"),
                F.max("m").cast("long").alias("max_matches_per_user"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# q80: 3-D skyline (Pareto frontier) of orders: maximize o_totalprice,
# minimize o_orderdate, minimize priority rank (1-URGENT best). Points
# are the distinct (prio, date, cents) triples with their order counts;
# p dominates q iff p is <=/>= q on every axis and differs somewhere.
# Characterization used by BOTH sides (proved in the docstring of the
# fixture test): expand each point to every priority level lv >= prio
# (a point constrains the skyline of its own and all laxer levels);
# within a level, a point is on the skyline iff its cents equals the
# running quadrant max over dates (default RANGE frame — date peers
# included, identically in Spark and DuckDB) AND it is the ONLY
# quadrant point attaining its cents value. This is O(n log n) over
# the deduped point histogram — the all-pairs NOT EXISTS oracle was
# measured >180 s on sf0.01's 15k points and rejected. The windows run
# over aggregated points, never raw orders (the q24 rule); the 5-way
# level expansion bounds window parallelism at 5 tasks, which is fine
# because the input is the (prio, date, cents) HISTOGRAM — production
# data would coarsen cents into buckets to keep that histogram small.
# ---------------------------------------------------------------------------
Q80_ORACLE = """
    WITH pts AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1, 2, 3
    ), expanded AS (
      SELECT p.*, l.lv
      FROM pts p, LATERAL (SELECT unnest(range(p.prio, 6)) AS lv) l
    ), flagged AS (
      SELECT prio, order_date, price_cents, n_orders, lv,
             max(price_cents) OVER (PARTITION BY lv ORDER BY order_date)
               AS quad_max,
             count(*) OVER (PARTITION BY lv, price_cents
                            ORDER BY order_date) AS n_at_cents
      FROM expanded
    )
    SELECT prio, order_date, price_cents, n_orders
    FROM flagged
    WHERE lv = prio AND price_cents = quad_max AND n_at_cents = 1
"""


def q80_skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal orders in (price up, date down, priority down)
    via the quadrant-running-max characterization (section comment).
    One aggregate builds the point histogram; a 5-way level expansion
    plus two default-frame windows (quadrant max; count of quadrant
    points at the same cents) decide membership."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    pts = (
        orders.groupBy(
            F.substring("o_orderpriority", 1, 1).cast("long").alias("prio"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.expr("cast(round(o_totalprice * 100, 0) as bigint)").alias(
                "price_cents"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    expanded = pts.withColumn(
        "lv", F.explode(F.sequence(F.col("prio"), F.lit(5)))
    )
    quad_max = F.max("price_cents").over(
        Window.partitionBy("lv").orderBy("order_date")
    )
    n_at_cents = F.count(F.lit(1)).over(
        Window.partitionBy("lv", "price_cents").orderBy("order_date")
    )
    return (
        expanded.withColumn("quad_max", quad_max)
        .withColumn("n_at_cents", n_at_cents)
        .filter(
            (F.col("lv") == F.col("prio"))
            & (F.col("price_cents") == F.col("quad_max"))
            & (F.col("n_at_cents") == 1)
        )
        .select("prio", "order_date", "price_cents", "n_orders")
    )


# ---------------------------------------------------------------------------
# q81: exponential time-decay engagement score — the feature-store
# recency weight (half-life 14 days): score(user) = sum over events of
# value_cents * 2^(-age_days / 14). Determinism: the decay factor is
# computed per row and IMMEDIATELY rounded to integer micros
# (round(pow(2, -age/14) * 1e6) — one libm pow call on identical
# doubles gives identical bits in both engines), so the aggregate is a
# BIGINT sum, immune to shuffle-order float reassociation. age_days is
# whole days by integer microsecond division from the corpus max ts
# (one broadcast scalar). 100 TB shape: scan + broadcast + one groupBy
# on user_id.
# ---------------------------------------------------------------------------
Q81_HALF_LIFE_DAYS = 14

Q81_ORACLE = f"""
    WITH ref AS (SELECT max(ts) AS mx FROM events),
    scored AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100, 0) AS BIGINT)
               * CAST(round(pow(2.0,
                   -((epoch_us(mx) - epoch_us(ts)) // 86400000000)
                     / {Q81_HALF_LIFE_DAYS}.0) * 1000000, 0) AS BIGINT)
               AS contrib_e6
      FROM events, ref
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen,
           CAST(sum(contrib_e6) AS BIGINT) AS decayed_cents_e6
    FROM scored GROUP BY user_id
"""


def q81_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement per user (see section comment): one
    broadcast of the corpus max ts, per-row integer decay micros, one
    exact BIGINT groupBy on user_id."""
    events = load_table(spark, sf_dir, "events")
    ref = events.agg(F.max("ts").alias("mx"))
    age_days = F.expr(
        "(unix_micros(mx) - unix_micros(ts)) div 86400000000"
    )
    contrib = F.expr(
        "cast(round(value * 100, 0) as bigint)"
    ) * F.round(
        F.pow(
            F.lit(2.0),
            -age_days.cast("double") / F.lit(float(Q81_HALF_LIFE_DAYS)),
        )
        * 1_000_000,
        0,
    ).cast("long")
    return (
        events.crossJoin(F.broadcast(ref))
        .select("user_id", "ts", contrib.alias("contrib_e6"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "last_seen"
            ),
            F.sum("contrib_e6").alias("decayed_cents_e6"),
        )
    )


# ---------------------------------------------------------------------------
# TextRank keywords (Mihalcea & Tarau 2004): undirected co-occurrence
# graph over ADJACENT token pairs (self-loops dropped), edge weight =
# corpus co-occurrence count, damping d = 0.85, THREE power-iteration
# rounds from a uniform start — all in integer fixed-point (scale 1e6)
# with the per-edge contribution floor-divided by the source's weighted
# degree: s'(v) = 150000 + (850 * sum_u (s(u) * w_uv) div wdeg(u))
# div 1000. Integer sums are reassociation-proof, so both engines agree
# exactly. Scale shape: edges/degrees reduce map-side to vocabulary
# size; each round joins the edge list to the (vocab-sized, broadcast)
# score table — 3 rounds = 3 broadcast joins, no iteration-growing
# lineage (localCheckpoint per round); a vocabulary too big to
# broadcast would flip to a shuffle join on the same plan.
# ---------------------------------------------------------------------------
TEXTRANK_TOP_K = 20
_TR_ITERS = 3

TA_TEXTRANK_ORACLE = f"""
    WITH toks AS (
      SELECT string_split_regex(lower(text), '[ \t]') AS toks
      FROM documents
    ), pairs AS (
      SELECT w1, w2 FROM (
        SELECT unnest(list_transform(range(len(toks) - 1),
                      i -> toks[i + 1])) AS w1,
               unnest(list_transform(range(len(toks) - 1),
                      i -> toks[i + 2])) AS w2
        FROM toks WHERE len(toks) >= 2
      ) WHERE w1 <> w2
    ), und AS (
      SELECT least(w1, w2) AS u, greatest(w1, w2) AS v,
             CAST(count(*) AS BIGINT) AS w
      FROM pairs GROUP BY 1, 2
    ), edges AS (
      SELECT u AS src, v AS dst, w FROM und
      UNION ALL
      SELECT v AS src, u AS dst, w FROM und
    ), deg AS (
      SELECT src, CAST(sum(w) AS BIGINT) AS wdeg
      FROM edges GROUP BY src
    ), ew AS (
      SELECT e.src, e.dst, e.w, d.wdeg
      FROM edges e JOIN deg d USING (src)
    ), s0 AS (SELECT src AS tok, CAST(1000000 AS BIGINT) AS s FROM deg),
    s1 AS (
      SELECT ew.dst AS tok,
             150000 + (850 * sum((s0.s * ew.w) // ew.wdeg)) // 1000 AS s
      FROM ew JOIN s0 ON s0.tok = ew.src GROUP BY ew.dst
    ), s2 AS (
      SELECT ew.dst AS tok,
             150000 + (850 * sum((s1.s * ew.w) // ew.wdeg)) // 1000 AS s
      FROM ew JOIN s1 ON s1.tok = ew.src GROUP BY ew.dst
    ), s3 AS (
      SELECT ew.dst AS tok,
             150000 + (850 * sum((s2.s * ew.w) // ew.wdeg)) // 1000 AS s
      FROM ew JOIN s2 ON s2.tok = ew.src GROUP BY ew.dst
    )
    SELECT token, score_e6, weighted_degree, CAST(rnk AS BIGINT) AS rank
    FROM (
      SELECT s3.tok AS token, CAST(s3.s AS BIGINT) AS score_e6,
             d.wdeg AS weighted_degree,
             row_number() OVER (ORDER BY s3.s DESC, s3.tok) AS rnk
      FROM s3 JOIN deg d ON d.src = s3.tok
    ) WHERE rnk <= {TEXTRANK_TOP_K}
"""


def ta_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-{k} TextRank keywords (see section comment): build
    the undirected co-occurrence edge list once, attach weighted
    degrees, then run 3 integer fixed-point damped iterations, each a
    broadcast join of the vocab-sized score table against the edges."""
    from pyspark.sql.window import Window

    from eeecs485_p4_mapreduce_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(tokens().alias("toks")).filter("size(toks) >= 2")
    pairs = tk.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(least(toks[i - 1], toks[i]) AS u,"
                " greatest(toks[i - 1], toks[i]) AS v))"
            )
        ).alias("p")
    ).filter("p.u <> p.v")
    und = pairs.groupBy(F.col("p.u").alias("u"), F.col("p.v").alias("v")).agg(
        F.count(F.lit(1)).alias("w")
    )
    edges = und.selectExpr("u AS src", "v AS dst", "w").unionByName(
        und.selectExpr("v AS src", "u AS dst", "w")
    )
    deg = edges.groupBy("src").agg(F.sum("w").alias("wdeg"))
    ew = edges.join(deg, "src").localCheckpoint()
    scores = deg.select(
        F.col("src").alias("tok"), F.lit(1_000_000).cast("long").alias("s")
    )
    for _ in range(_TR_ITERS):
        scores = (
            ew.join(
                F.broadcast(scores.withColumnRenamed("tok", "src")), "src"
            )
            .groupBy(F.col("dst").alias("tok"))
            .agg(
                (
                    F.lit(150_000)
                    + F.expr("850 * sum((s * w) div wdeg) div 1000")
                ).alias("s")
            )
            .localCheckpoint()
        )
    ranked = (
        scores.join(deg, scores["tok"] == deg["src"])
        .select(
            "tok",
            F.col("s").alias("score_e6"),
            F.col("wdeg").alias("weighted_degree"),
        )
        .orderBy(F.col("score_e6").desc(), "tok")
        .limit(TEXTRANK_TOP_K)
    )
    return ranked.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("score_e6").desc(), "tok"))
        .cast("long"),
    ).select(
        F.col("tok").alias("token"), "score_e6", "weighted_degree", "rank"
    )


# ---------------------------------------------------------------------------
# Temperature-scaled domain mixture (tau = 0.7): the standard recipe
# for balancing heterogeneous sources when sampling LLM training data —
# raw weight n_docs^tau flattens large domains and lifts small ones
# (tau = 1 is proportional, tau = 0 is uniform). Shares are integer
# ppm: w_e6 = round(n^tau * 1e6) is rounded BEFORE normalization (one
# libm pow per domain, identical bits both engines), so the share
# division and the implied epochs-per-domain for a one-epoch char
# budget are pure BIGINT arithmetic.
# ---------------------------------------------------------------------------
MIXTURE_TAU = 0.7

CURATE_MIXTURE_ORACLE = f"""
    WITH domains AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY source
    ), weighted AS (
      SELECT *,
             CAST(round(pow(n_docs, {MIXTURE_TAU}) * 1000000, 0)
                  AS BIGINT) AS w_e6
      FROM domains
    ), tot AS (
      SELECT CAST(sum(w_e6) AS BIGINT) AS tot_w,
             CAST(sum(n_chars) AS BIGINT) AS tot_chars
      FROM weighted
    )
    SELECT source, n_docs, n_chars,
           CAST((w_e6 * 1000000) // tot_w AS BIGINT) AS share_ppm,
           CAST((((tot_chars * ((w_e6 * 1000000) // tot_w)) // 1000000)
                 * 1000) // n_chars AS BIGINT) AS epochs_e3
    FROM weighted, tot
"""


def curate_domain_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights per source domain (see
    section comment): one groupBy builds the domain table, one
    broadcast scalar row carries the normalizers, everything after the
    single pow() is BIGINT."""
    docs = load_table(spark, sf_dir, "documents")
    domains = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    weighted = domains.withColumn(
        "w_e6",
        F.round(F.pow(F.col("n_docs"), F.lit(MIXTURE_TAU)) * 1_000_000, 0)
        .cast("long"),
    )
    tot = weighted.agg(
        F.sum("w_e6").alias("tot_w"), F.sum("n_chars").alias("tot_chars")
    )
    return (
        weighted.crossJoin(F.broadcast(tot))
        .selectExpr(
            "source",
            "n_docs",
            "n_chars",
            "(w_e6 * 1000000) div tot_w AS share_ppm",
            "(((tot_chars * ((w_e6 * 1000000) div tot_w)) div 1000000)"
            " * 1000) div n_chars AS epochs_e3",
        )
    )


STAGED: dict[str, tuple] = {
    "q78_bom_explosion": (q78_bom_explosion, Q78_ORACLE),
    "q79_event_pattern": (q79_event_pattern, Q79_ORACLE),
    "q80_skyline_orders": (q80_skyline_orders, Q80_ORACLE),
    "q81_decayed_engagement": (q81_decayed_engagement, Q81_ORACLE),
    "ta_textrank_keywords": (ta_textrank_keywords, TA_TEXTRANK_ORACLE),
    "curate_domain_temperature": (
        curate_domain_temperature,
        CURATE_MIXTURE_ORACLE,
    ),
}


def register_staged() -> None:
    """Round-8 flip: call from registry.load_all(). Idempotent."""
    from eeecs485_p4_mapreduce_spark.registry import register_staged_dict

    register_staged_dict(STAGED)
