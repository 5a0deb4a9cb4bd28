"""The composed training-data curation pipeline: the end-to-end job this
engine exists for, run as ONE declarative plan.

    documents
      → exact dedup        (keep min doc_id per content hash)
      → near-dup removal   (MinHash-LSH candidate pairs → connected
                            components → drop non-representatives)
      → quality gate       (Gopher/C4-style heuristics, exact int ratios)
      → corpus stats       (per language x source)

Each stage is an operator that also exists standalone (dedup.py,
text_analysis.py); this module proves they COMPOSE — one lineage, no
materialization barriers except the label-propagation loop, which is the
only inherently iterative step. The DuckDB oracle is the same composition
in one SQL statement (recursive CTE for the components).

At 100 TB: exact dedup shuffles (fp, doc_id); candidate pairs shuffle
signatures; quality scoring is pure map-side; the final agg is tiny. The
document BODIES are read once at the scan and never shuffled at all —
every inter-stage edge carries doc_ids or hashes only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eeecs485_p4_mapreduce_spark.catalog import load_table
from eeecs485_p4_mapreduce_spark.functions.text import (
    STOPWORDS,
    count_in_list,
    tokens,
)
from eeecs485_p4_mapreduce_spark.operators.dedup import (
    _DUCK_CLUSTER_CTES,
    _DUCK_SHINGLES,
    _propagate_min_labels,
    _symmetric_edges,
    minhash_candidate_pairs,
)
from eeecs485_p4_mapreduce_spark.registry import query

_DUCK_TOKS = "string_split_regex(lower(text), '[ \t]')"
_EN = ", ".join(f"'{w}'" for w in STOPWORDS["en"])


@query(
    "pipeline_curate",
    oracle=f"""
    WITH RECURSIVE {_DUCK_CLUSTER_CTES},
    keepers AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    survivors AS (
      SELECT d.doc_id, d.lang, d.source, d.text
      FROM documents d
      JOIN keepers k ON d.doc_id = k.doc_id
      WHERE NOT EXISTS (SELECT 1 FROM lbl
                        WHERE lbl.doc_id = d.doc_id
                          AND lbl.cluster_id <> d.doc_id)
    ),
    scored AS (
      SELECT lang, source,
             len(toks) AS n,
             len(list_filter(toks, t -> t IN ({_EN}))) AS stop_cnt,
             len(list_distinct(toks)) AS dist
      FROM (SELECT lang, source, {_DUCK_TOKS} AS toks FROM survivors)
    )
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           round(CAST(sum(stop_cnt) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 4)
             AS stopword_ratio
    FROM scored
    WHERE n BETWEEN 20 AND 2000
      AND stop_cnt * 1.0 / n < 0.5
      AND 1.0 - dist * 1.0 / n < 0.9
    GROUP BY lang, source
    """,
)
def pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup → near-dup removal → quality gate → per-(lang, source)
    corpus stats, composed as one plan. The corpus-level stopword ratio
    is sum(int)/sum(int) — one division, accumulation-order-proof."""
    docs = load_table(spark, sf_dir, "documents")

    keepers = (
        docs.select("doc_id", F.md5("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    pairs = minhash_candidate_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = _symmetric_edges(pairs)
    losers = (
        _propagate_min_labels(edges)
        .filter(F.col("lbl") != F.col("doc_id"))
        .select("doc_id")
    )
    survivors = docs.join(keepers, "doc_id", "left_semi").join(
        losers, "doc_id", "left_anti"
    )

    toks = "split(lower(text), '[ \t]')"
    scored = survivors.selectExpr(
        "lang",
        "source",
        f"size({toks}) AS n",
        f"{count_in_list(toks, STOPWORDS['en'])} AS stop_cnt",
        f"size(array_distinct({toks})) AS dist",
    )
    return (
        scored.filter(
            F.col("n").between(20, 2000)
            & (F.col("stop_cnt").cast("double") / F.col("n") < 0.5)
            & (1.0 - F.col("dist").cast("double") / F.col("n") < 0.9)
        )
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("n_tokens"),
            F.round(
                F.sum("stop_cnt").cast("double") / F.sum("n"), 4
            ).alias("stopword_ratio"),
        )
    )


# --- corpus curation primitives -------------------------------------------
# Deterministic hash sampling, token budgeting, and eval-set contamination
# screening: the selection passes that run between dedup and training.

# per-language keep rates in basis points (en downsampled: it dominates
# the corpus; everything else kept whole).
_SAMPLE_BP = {"en": 5000, "de": 10000, "fr": 10000, "es": 10000, "zh": 10000}

_SPARK_U = (
    "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)"
    " % 10000"
)
_DUCK_U = (
    "CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
    " AS UBIGINT) AS BIGINT) % 10000"
)
_RATE_CASE = " ".join(
    f"WHEN '{lang}' THEN {bp}" for lang, bp in sorted(_SAMPLE_BP.items())
)


@query(
    "curate_sample_stratified",
    oracle=f"""
    SELECT lang,
           count(*) AS n_total,
           CAST(sum(CASE WHEN {_DUCK_U} < CASE lang {_RATE_CASE} ELSE 10000 END
               THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           min(CASE WHEN {_DUCK_U} < CASE lang {_RATE_CASE} ELSE 10000 END
               THEN doc_id END) AS first_kept_doc
    FROM documents
    GROUP BY lang
    """,
)
def curate_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: keep a document iff
    md5(doc_id) mod 10000 falls under its language's keep-rate (en is
    halved, the rest kept). Hash-based so the sample is reproducible
    across runs, partitionings, and engines — `df.sample()` is not.
    Pure map-side; the per-language audit agg is the only shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    kept = F.expr(
        f"({_SPARK_U}) < (CASE lang {_RATE_CASE} ELSE 10000 END)"
    )
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(kept.cast("int")).alias("n_kept"),
        F.min(F.when(kept, F.col("doc_id"))).alias("first_kept_doc"),
    )


@query(
    "curate_token_budget",
    oracle="""
    SELECT doc_id, lang, n, CAST(cum AS BIGINT) AS cum
    FROM (
      SELECT doc_id, lang, n,
             sum(n) OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM (SELECT doc_id, lang,
                   len(string_split_regex(lower(text), '[ \t]')) AS n
            FROM documents)
    )
    WHERE cum - n < 5000
    """,
)
def curate_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-language token budgeting: take documents in doc_id
    order until 5000 whitespace-tokens are filled (the last doc may
    overflow). Integer arithmetic, so the cut is deterministic.

    A naive Window.partitionBy(lang) cumsum drags EVERY (lang, doc)
    tuple through one task per language, at any corpus size — the
    corpus-bounded window bottleneck. Instead: bucket doc_id ranges,
    window the tiny bucket-totals table for each bucket's preceding
    sum, and PRUNE — a bucket whose preceding sum already meets the
    budget cannot contribute (every doc has >= 1 token), so the
    per-doc cumsum window runs over the broadcast-joined survivors
    only: a handful of buckets per language regardless of corpus
    size. Same output, provably: for any doc in a dropped bucket,
    cum - n >= bucket_before >= budget."""
    from pyspark.sql.window import Window

    budget, bucket_w = 5000, 4096
    docs = load_table(spark, sf_dir, "documents")
    base = docs.selectExpr(
        "doc_id",
        "lang",
        "size(split(lower(text), '[ \t]')) AS n",
        f"doc_id div {bucket_w} AS bkt",
    )
    w_bkt = (
        Window.partitionBy("lang")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept_prefix = (
        base.groupBy("lang", "bkt")
        .agg(F.sum("n").alias("btot"))
        .select(
            "lang", "bkt", (F.sum("btot").over(w_bkt) - F.col("btot")).alias("before")
        )
        .filter(F.col("before") < budget)
    )
    w_doc = (
        Window.partitionBy("lang", "bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.join(F.broadcast(kept_prefix), ["lang", "bkt"])
        .withColumn("cum", F.col("before") + F.sum("n").over(w_doc))
        .filter(F.col("cum") - F.col("n") < budget)
        .select("doc_id", "lang", "n", "cum")
    )


@query(
    "curate_contamination",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, source, {_DUCK_SHINGLES} AS shingles
      FROM (SELECT doc_id, source, {_DUCK_TOKS} AS toks FROM documents)
    ),
    bench AS (
      SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE source = 'src0'
    ),
    train AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh WHERE source <> 'src0'
    )
    SELECT t.doc_id, count(DISTINCT t.s) AS n_shared_shingles
    FROM train t JOIN bench b ON t.s = b.s
    GROUP BY t.doc_id
    """,
)
def curate_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination screen: training docs (source <> src0)
    sharing any 3-word shingle with the benchmark slice (source = src0),
    with the shared-shingle count as the contamination score. The
    benchmark's distinct shingle set is the BROADCAST side of the join
    (eval sets are small; the corpus is not), so the corpus-side
    shingle stream never shuffles for the probe — only the per-doc
    count agg does."""
    from eeecs485_p4_mapreduce_spark.functions.text import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    toks = "split(lower(text), '[ \t]')"
    sh = docs.selectExpr(
        "doc_id", "source", f"{word_shingles(toks, 3)} AS shingles"
    )
    bench = (
        sh.filter(F.col("source") == "src0")
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    train = sh.filter(F.col("source") != "src0").select(
        "doc_id", F.explode("shingles").alias("s")
    )
    return (
        train.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count_distinct("s").alias("n_shared_shingles"))
    )


# 5-word shingles, DuckDB form (distinct per doc, 1-based indexing).
_DUCK_SHINGLES5 = (
    "list_distinct(CASE WHEN len(toks) >= 5 THEN "
    "list_transform(range(len(toks) - 4), "
    "i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]"
    " || ' ' || toks[i + 4] || ' ' || toks[i + 5]) "
    "ELSE [] END)"
)


@query(
    "curate_boilerplate",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest(shingles) AS s
      FROM (SELECT doc_id, {_DUCK_SHINGLES5} AS shingles
            FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents))
    ),
    wnd AS (
      SELECT doc_id, count(*) OVER (PARTITION BY s) AS nd FROM sh
    )
    SELECT doc_id,
           count(*) AS n_shingles,
           CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boilerplate,
           round(CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4)
             AS boilerplate_ratio
    FROM wnd
    GROUP BY doc_id
    """,
)
def curate_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection (C4/RefinedWeb-style): a document's
    boilerplate ratio is the fraction of its distinct 5-word phrases
    that recur in other documents. Single corpus scan: the phrase
    doc-frequency comes from a count window over the phrase key (one
    shuffle on the phrase — a join against a frequency table would
    rescan the shingle pipeline), then one per-doc aggregation. At
    100 TB both shuffles carry (doc_id, hash-sized phrase) pairs, never
    documents; exact int/int ratio."""
    from eeecs485_p4_mapreduce_spark.functions.text import word_shingles
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = "split(lower(text), '[ \t]')"
    sh = docs.selectExpr(
        "doc_id", f"{word_shingles(toks, 5)} AS shingles"
    ).select("doc_id", F.explode("shingles").alias("s"))
    wnd = sh.withColumn("nd", F.count(F.lit(1)).over(Window.partitionBy("s")))
    boiler = (F.col("nd") >= 2).cast("long")
    return wnd.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(boiler).alias("n_boilerplate"),
        F.round(F.sum(boiler) * 1.0 / F.count(F.lit(1)), 4).alias(
            "boilerplate_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Language rebalancing for the training mixture: per-language token shares
# and temperature-sampled mixture weights (share^alpha renormalized,
# alpha=0.3 — the multilingual up/down-sampling rule from the XLM-R /
# mC4 lineage). `boost` is the resulting up-sampling factor per language.
# Scale: one partial-agg shuffle keyed on language (bounded cardinality);
# the two normalization totals are unpartitioned windows over the already
# language-sized aggregate — a deliberate exception to this repo's
# no-empty-windows rule, correct here because the window input is the
# bounded language table (the corpus-sized side never sees a window), and
# it avoids the triple recompute of the aggregate that chained
# agg+crossJoin normalization would plan.
# ---------------------------------------------------------------------------
ALPHA = 0.3


@query(
    "curate_lang_balance",
    oracle=f"""
    WITH lang_stats AS (
      SELECT lang, count(*) AS n_docs,
             CAST(sum(len({_DUCK_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    shared AS (
      SELECT *,
             n_tokens * 1.0 / (SELECT sum(n_tokens) FROM lang_stats) AS share,
             pow(n_tokens * 1.0 / (SELECT sum(n_tokens) FROM lang_stats), {ALPHA})
               AS w_raw
      FROM lang_stats
    )
    SELECT lang, n_docs, n_tokens,
           round(share, 6) AS token_share,
           round(w_raw / (SELECT sum(w_raw) FROM shared), 6) AS mixture_weight,
           round(w_raw / (SELECT sum(w_raw) FROM shared) / share, 4) AS boost
    FROM shared
    """,
)
def curate_lang_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    lang_stats = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.lower("text"), "[ \t]")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    shared = (
        lang_stats.withColumn(
            "share", F.col("n_tokens") / F.sum("n_tokens").over(w_all)
        )
        .withColumn("w_raw", F.pow("share", F.lit(ALPHA)))
        .withColumn("w_sum", F.sum("w_raw").over(w_all))
    )
    return shared.select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round("share", 6).alias("token_share"),
        F.round(F.col("w_raw") / F.col("w_sum"), 6).alias("mixture_weight"),
        F.round(F.col("w_raw") / F.col("w_sum") / F.col("share"), 4).alias("boost"),
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split: assign each document to a split by
# md5(doc_id) mod 10000 — 90/5/5. Hash-based (not random) so the split is
# reproducible across runs, engines, partitionings, and cluster sizes, and
# any late-arriving shard of the corpus lands in the same split it would
# have originally. Scale: pure map-side expression + one bounded agg.
# ---------------------------------------------------------------------------
@query(
    "curate_train_val_test",
    oracle=f"""
    SELECT split, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM (
      SELECT doc_id, n_chars,
             CASE WHEN {_DUCK_U} < 9000 THEN 'train'
                  WHEN {_DUCK_U} < 9500 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    GROUP BY split
    """,
)
def curate_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.selectExpr(
            "doc_id",
            "n_chars",
            f"CASE WHEN {_SPARK_U} < 9000 THEN 'train'"
            f" WHEN {_SPARK_U} < 9500 THEN 'val'"
            f" ELSE 'test' END AS split",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@query(
    "curate_snapshot_diff",
    oracle="""
    WITH old AS (SELECT DISTINCT md5(text) AS h FROM documents
                 WHERE source = 'src0'),
         new AS (SELECT DISTINCT md5(text) AS h FROM documents
                 WHERE source <> 'src0')
    SELECT CASE WHEN o.h IS NULL THEN 'added'
                WHEN n.h IS NULL THEN 'removed'
                ELSE 'retained' END AS status,
           count(*) AS n_texts
    FROM old o FULL OUTER JOIN new n ON o.h = n.h
    GROUP BY 1
    """,
)
def curate_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus refresh audit: diff two snapshot slices by content hash
    (src0 as the old crawl, everything else as the new) into
    added / removed / retained counts — the report a pipeline emits
    before swapping a training corpus version.

    The full outer join runs on the 128-bit hashes alone: text bodies
    are reduced to md5 at the scan and never shuffle, and each side is
    hash-distinct first, so join input is bounded by distinct-content
    count, not corpus size. (When both snapshots live in ONE table, a
    single groupBy(hash) with per-side presence flags does this in one
    shuffle; the join form shown here is the general one — snapshots
    usually arrive as separate tables.)
    """
    docs = load_table(spark, sf_dir, "documents")
    old = (
        docs.filter(F.col("source") == "src0")
        .select(F.md5("text").alias("h_old"))
        .distinct()
    )
    new = (
        docs.filter(F.col("source") != "src0")
        .select(F.md5("text").alias("h_new"))
        .distinct()
    )
    return (
        old.join(new, old["h_old"] == new["h_new"], "full_outer")
        .select(
            F.when(F.col("h_old").isNull(), F.lit("added"))
            .when(F.col("h_new").isNull(), F.lit("removed"))
            .otherwise(F.lit("retained"))
            .alias("status")
        )
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_texts"))
    )


@query(
    "curate_sequence_packing",
    oracle="""
    SELECT doc_id, lang, n,
           CAST(floor((cum - n) / 2048.0) AS BIGINT) AS bin_id
    FROM (
      SELECT doc_id, lang, n,
             sum(n) OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM (SELECT doc_id, lang,
                   len(string_split_regex(lower(text), '[ \t]')) AS n
            FROM documents)
    )
    """,
)
def curate_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: assign every document (in doc_id order,
    per language) to the 2048-token training bin its start offset lands
    in — the step that turns a curated corpus into fixed-size training
    examples. bin_id = floor(preceding_tokens / 2048), so a document
    spanning a boundary stays in the bin it started in (greedy packing,
    deterministic, no fragmentation decisions).

    Unlike curate_token_budget this needs the cumsum for EVERY doc, so
    nothing can be pruned — but the same two-level decomposition holds:
    per-bucket totals windowed on the tiny (lang, bucket) table give
    each bucket's preceding sum, broadcast back, and the per-doc window
    runs partitioned by (lang, bucket) — task state is bucket-bounded
    at any corpus size, never corpus-bounded.
    """
    from pyspark.sql.window import Window

    bucket_w = 4096
    docs = load_table(spark, sf_dir, "documents")
    base = docs.selectExpr(
        "doc_id",
        "lang",
        "size(split(lower(text), '[ \t]')) AS n",
        f"doc_id div {bucket_w} AS bkt",
    )
    w_bkt = (
        Window.partitionBy("lang")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix = (
        base.groupBy("lang", "bkt")
        .agg(F.sum("n").alias("btot"))
        .select(
            "lang",
            "bkt",
            (F.sum("btot").over(w_bkt) - F.col("btot")).alias("before"),
        )
    )
    w_doc = (
        Window.partitionBy("lang", "bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.join(F.broadcast(prefix), ["lang", "bkt"])
        .withColumn("cum", F.col("before") + F.sum("n").over(w_doc))
        .select(
            "doc_id",
            "lang",
            "n",
            F.floor((F.col("cum") - F.col("n")) / 2048.0)
            .cast("bigint")
            .alias("bin_id"),
        )
    )


CHUNK_WIN, CHUNK_STRIDE = 64, 48  # 16-token overlap between neighbors


@query(
    "curate_chunk_split",
    oracle=f"""
    SELECT doc_id, c.i AS chunk_idx, c.i * {CHUNK_STRIDE} + 1 AS start_tok,
           len(toks[c.i * {CHUNK_STRIDE} + 1 :
                    c.i * {CHUNK_STRIDE} + {CHUNK_WIN}]) AS n_tokens,
           array_to_string(toks[c.i * {CHUNK_STRIDE} + 1 :
                                c.i * {CHUNK_STRIDE} + {CHUNK_WIN}], ' ')
             AS chunk_text
    FROM (SELECT doc_id, string_split_regex(lower(text), '[ \t]') AS toks
          FROM documents),
         LATERAL (SELECT unnest(generate_series(0,
                    CAST(ceil(len(toks) / {CHUNK_STRIDE}.0) AS INT) - 1))
                  AS i) c
    """,
)
def curate_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized document chunking — the RAG/pretraining stage that
    turns documents into overlapping token windows (64 tokens, stride
    48) with provenance (doc_id, chunk index, 1-based token offset).
    The reconstruction is exact on both engines (identical tokenizer,
    slice, and join), so the oracle pins chunk *text*, not just counts.

    Scale: pure map-side — tokenize, window, and re-join happen in one
    generate per document with zero shuffles; output size is corpus
    size times ~win/stride, the irreducible overlap cost.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"""
                transform(
                  sequence(0,
                    CAST(ceil(size(split(lower(text), '[ \t]'))
                              / {CHUNK_STRIDE}.0) AS INT) - 1),
                  i -> struct(
                    i AS chunk_idx,
                    i * {CHUNK_STRIDE} + 1 AS start_tok,
                    size(slice(split(lower(text), '[ \t]'),
                               i * {CHUNK_STRIDE} + 1, {CHUNK_WIN}))
                      AS n_tokens,
                    array_join(slice(split(lower(text), '[ \t]'),
                                     i * {CHUNK_STRIDE} + 1, {CHUNK_WIN}),
                               ' ') AS chunk_text))
                """
            )
        ).alias("c"),
    ).select("doc_id", "c.chunk_idx", "c.start_tok", "c.n_tokens", "c.chunk_text")


N_EXPORT_SHARDS = 8


@query(
    "curate_export_shards",
    oracle=f"""
    SELECT {_DUCK_U.replace('% 10000', f'% {N_EXPORT_SHARDS}')} AS shard_id,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM documents
    GROUP BY 1
    """,
)
def curate_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last mile of a curation pipeline: materialize the corpus as
    N_EXPORT_SHARDS JSONL training shards (deterministic md5(doc_id)
    shard assignment, one directory per shard via partitionBy) and
    return the shard MANIFEST (doc counts, char totals, id ranges) that
    a trainer's data loader consumes. Hash sharding is reproducible
    across runs/engines/cluster sizes and keeps shards balanced without
    a global sort; at 100 TB the write is the only full-data pass and it
    is shuffle-free (partitionBy on a map-side column). The demo writes
    to a temp dir (cleaned up) — production passes a real output path;
    the manifest is the oracle-checked output."""
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "shard_id", F.expr(_SPARK_U.replace("% 10000", f"% {N_EXPORT_SHARDS}"))
    )
    out_dir = tempfile.mkdtemp(prefix="p4spark_shards_")
    try:
        docs.write.mode("overwrite").partitionBy("shard_id").json(out_dir)
        manifest = (
            spark.read.json(out_dir)  # manifest from the WRITTEN shards
            .groupBy("shard_id")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("sum_chars"),
                F.min("doc_id").alias("min_doc"),
                F.max("doc_id").alias("max_doc"),
            )
            .select(
                F.col("shard_id").cast("bigint").alias("shard_id"),
                "n_docs",
                "sum_chars",
                "min_doc",
                "max_doc",
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return manifest


# Per-language replication factors for rare-class oversampling: integer
# part = guaranteed copies; fractional part = probability of one extra
# copy, decided by the SAME md5(doc_id) hash as the downsampler, so the
# expansion is deterministic and engine-portable.
_OVERSAMPLE_F = {"en": (1, 0), "de": (2, 5000), "fr": (2, 2500),
                 "es": (3, 0), "zh": (4, 5000)}
_OVER_INT_CASE = " ".join(
    f"WHEN '{lang}' THEN {i}" for lang, (i, _) in sorted(_OVERSAMPLE_F.items())
)
_OVER_FRAC_CASE = " ".join(
    f"WHEN '{lang}' THEN {fbp}"
    for lang, (_, fbp) in sorted(_OVERSAMPLE_F.items())
)


@query(
    "curate_oversample_rare",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, lang,
             (CASE lang {_OVER_INT_CASE} ELSE 1 END
              + CASE WHEN {_DUCK_U} < CASE lang {_OVER_FRAC_CASE} ELSE 0 END
                     THEN 1 ELSE 0 END) AS n_copies
      FROM documents
    )
    SELECT doc_id, lang, CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS copy
    FROM n
    """,
)
def curate_oversample_rare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-language OVERSAMPLING — the upsampling half of mixture
    rebalancing (curate_sample_stratified is the downsampling half):
    each document is replicated per-language, integer copies guaranteed
    plus one fractional copy decided by the deterministic md5(doc_id)
    hash. Reproducible across runs/engines/partitionings — replaying the
    pipeline yields byte-identical training corpora, which RNG-based
    upsampling cannot promise.

    Scale: a pure map-side sequence-explode (zero shuffles, zero joins);
    the expansion factor is bounded by max(f)=5, so output size is
    predictable and no task state grows with the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    n_copies = F.expr(
        f"CASE lang {_OVER_INT_CASE} ELSE 1 END"
        f" + CASE WHEN ({_SPARK_U}) < (CASE lang {_OVER_FRAC_CASE} ELSE 0 END)"
        f" THEN 1 ELSE 0 END"
    )
    return docs.withColumn("n_copies", n_copies).select(
        "doc_id",
        "lang",
        F.explode(F.expr("sequence(1L, cast(n_copies as long))")).alias("copy"),
    )


WEIGHTED_SAMPLE_K = 100


@query(
    "curate_weighted_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars, round(priority, 6) AS priority
    FROM (
      SELECT doc_id, lang, n_chars,
             pow(({_DUCK_U} + 0.5) / 10000.0, 1.0 / n_chars) AS priority,
             row_number() OVER (
               ORDER BY pow(({_DUCK_U} + 0.5) / 10000.0, 1.0 / n_chars) DESC,
                        doc_id
             ) AS rnk
      FROM documents WHERE n_chars > 0
    )
    WHERE rnk <= {WEIGHTED_SAMPLE_K}
    """,
)
def curate_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via order statistics
    (Efraimidis–Spirakis A-ES): priority = u^(1/w) with u the
    deterministic md5(doc_id) uniform and w = n_chars, keep the top-k
    priorities — longer documents are proportionally likelier, and the
    whole sample is reproducible (no RNG state, no sequential reservoir).

    Scale: priorities are map-side expressions; top-k by priority is a
    TakeOrdered (per-partition heap + driver merge of k rows), never a
    global sort — the distributed form of reservoir sampling that
    sequential algorithms can't parallelize. ``orderBy(...).limit(k)``
    plans as TakeOrderedAndProject, so no row ever crosses a shuffle
    except the k survivors."""
    docs = load_table(spark, sf_dir, "documents").where(
        # A-ES is defined for positive weights: a zero-length doc has
        # sampling probability zero, and 1/w must never divide by zero
        # (adversarial-corpus sweep, r12)
        F.col("n_chars") > 0
    )
    u = F.expr(f"(({_SPARK_U}) + 0.5) / 10000.0")
    priority = F.pow(u, 1.0 / F.col("n_chars"))
    return (
        docs.select(
            "doc_id", "lang", "n_chars", priority.alias("priority_raw")
        )
        .orderBy(F.col("priority_raw").desc(), "doc_id")
        .limit(WEIGHTED_SAMPLE_K)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round("priority_raw", 6).alias("priority"),
        )
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
# document with the corpus unigram LM (the same scoring ta_unigram_logprob
# registers standalone), then split each language into head/middle/tail
# thirds by score. CCNet's trick is that the thirds are defined by LANGUAGE-
# LOCAL score thresholds, so high-resource languages don't crowd out the
# rest. Scale shape: thresholds come from a (lang, rounded-score) COUNT
# histogram — the q24 two-phase trick — so the only windows run over
# histogram rows (bounded by distinct rounded scores), never doc-sized
# input, and the final report is a pure aggregate of the histogram itself
# (document bodies are read once for tokenization and nothing else).
# ---------------------------------------------------------------------------
@query(
    "curate_perplexity_buckets",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
    ),
    freq AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM freq),
    scored AS (
      SELECT d.lang, round(sum(ln(f.c / tot.t)) / count(*), 4) AS score
      FROM toks JOIN freq f USING (token)
           JOIN documents d USING (doc_id), tot
      GROUP BY doc_id, d.lang
    ),
    hist AS (
      SELECT lang, score, count(*) AS n FROM scored GROUP BY lang, score
    ),
    cum AS (
      SELECT lang, score, n,
             sum(n) OVER (PARTITION BY lang ORDER BY score DESC, n)
               - n AS cum_before,
             sum(n) OVER (PARTITION BY lang) AS total
      FROM hist
    )
    SELECT lang,
           CASE WHEN 3 * cum_before < total THEN 'head'
                WHEN 3 * cum_before < 2 * total THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(sum(n) AS BIGINT) AS n_docs,
           round(min(score), 4) + 0.0 AS worst_logprob,
           round(max(score), 4) + 0.0 AS best_logprob
    FROM cum
    GROUP BY 1, 2
    """,
)
def curate_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language head/middle/tail perplexity thirds over unigram-LM
    document scores (higher avg logprob = more fluent = head). Ties on
    the rounded score stay in one bucket — the boundary is drawn between
    distinct score values by each value's cumulative count BEFORE it —
    which keeps the bucketing deterministic on both engines."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", F.explode(tokens()).alias("token"))
    # vocabulary-sized; feeds the normalizer AND the scoring broadcast —
    # pinning it keeps the corpus tokenization to the two passes a
    # unigram-LM scorer actually needs (build LM, score docs)
    freq = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    tot = freq.agg(F.sum("c").cast("double").alias("t"))
    logp = F.log(F.col("c") / F.col("t"))
    scored = (
        toks.join(F.broadcast(freq), "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(F.round(F.sum(logp) / F.count(F.lit(1)), 4).alias("score"))
    )
    hist = scored.groupBy("lang", "score").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("score").desc(), "n")
    cum = hist.select(
        "lang",
        "score",
        "n",
        (
            F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
            - F.col("n")
        ).alias("cum_before"),
        F.sum("n").over(Window.partitionBy("lang")).alias("total"),
    )
    bucket = (
        F.when(3 * F.col("cum_before") < F.col("total"), "head")
        .when(3 * F.col("cum_before") < 2 * F.col("total"), "middle")
        .otherwise("tail")
    )
    return (
        cum.groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.sum("n").alias("n_docs"),
            (F.round(F.min("score"), 4) + F.lit(0.0)).alias("worst_logprob"),
            (F.round(F.max("score"), 4) + F.lit(0.0)).alias("best_logprob"),
        )
    )
