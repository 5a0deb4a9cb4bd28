"""Deduplication operators over `documents` / `embeddings`: exact
(hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine
near-dup — the standard LLM-training-data dedup toolkit.

Scale design (the whole point of these being in Spark):

- Exact dedup is a hash aggregation on md5(text) — one shuffle of
  (128-bit fp, doc_id), never the document bodies.
- MinHash+LSH: signatures are computed map-side (shingle explode → md5
  hash → min per (doc, seed) is a partial agg); candidate generation
  shuffles only (band_id, band_signature, doc_id) tuples, so the pairwise
  comparison that is O(n²) brute-force becomes O(candidates). At 100 TB
  the bucket join is the only n-to-n edge and it's keyed on band
  signatures, which are high-entropy → no skew.
- SimHash: 32-bit signatures map-side; near-dup candidates via identical
  16-bit prefix buckets (a 2-table Hamming LSH), then exact Hamming check.
- All hashes are md5-derived integers, so every operator here is
  bit-reproducible in ANSI SQL (DuckDB oracles below) and independent of
  partitioning / row order.

Reference note: the reference engine has no dedup at all (SURVEY.md §2.8);
these are the north-star extensions required by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eeecs485_p4_mapreduce_spark.catalog import (
    dump_plan_evidence,
    load_table,
    table_path,
)
from eeecs485_p4_mapreduce_spark.functions.text import word_shingles
from eeecs485_p4_mapreduce_spark.registry import query

_SPARK_TOKS = "split(lower(text), '[ \t]')"
_DUCK_TOKS = "string_split_regex(lower(text), '[ \t]')"

# DuckDB 3-word shingles of a token list (1-based indexing), distinct.
_DUCK_SHINGLES = (
    "list_distinct(CASE WHEN len(toks) >= 3 THEN "
    "list_transform(range(len(toks) - 2), "
    "i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]) "
    "ELSE [] END)"
)

N_HASHES = 16  # MinHash signature length
BAND_ROWS = 4  # rows per LSH band → 4 bands


@query(
    "dedup_exact",
    oracle="""
    SELECT fp, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
    FROM (SELECT doc_id, md5(text) AS fp FROM documents)
    GROUP BY fp
    HAVING count(*) >= 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group documents by content hash, keep the smallest
    doc_id. One shuffle of (fp, doc_id) pairs only."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5("text").alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "dedup_keep_first",
    oracle="""
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d
    JOIN (SELECT min(doc_id) AS keeper FROM documents GROUP BY md5(text)) k
      ON d.doc_id = k.keeper
    """,
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialization step of exact dedup: emit the surviving
    documents themselves (smallest doc_id per content hash), i.e. the
    deduplicated corpus a training pipeline would write back out. One
    agg shuffle on the 128-bit fingerprint + a semi-join on doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    keepers = (
        docs.select("doc_id", F.md5("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper"))
        .select("keeper")
    )
    return docs.join(
        keepers, docs.doc_id == keepers.keeper, "left_semi"
    ).select("doc_id", "lang", "n_chars")


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS shingles
      FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
    ),
    ex AS (SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS n_common,
             any_value(a.n) AS n_a, any_value(b.n) AS n_b
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 4) AS jaccard
    FROM pairs
    WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-word-shingle Jaccard >= 0.2.

    Candidates come from an inverted index on shingles, so only docs
    sharing at least one shingle are compared — never all pairs. Each
    shingle's posting list is aggregated once and pairs explode in-bucket
    (a self-join would scan + shingle the corpus twice; Spark plans no
    ReusedExchange for it). Jaccard is exact int/int arithmetic
    (engine-portable).
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.selectExpr("doc_id", f"{word_shingles(_SPARK_TOKS, 3)} AS shingles")
    ex = sh.select(
        "doc_id", F.explode("shingles").alias("s"), F.size("shingles").alias("n")
    )
    postings = ex.groupBy("s").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("ds")
    ).filter(F.size("ds") > 1)
    pairs = (
        postings.select(F.posexplode("ds").alias("i", "a"), "ds")
        .select("a", F.explode(F.expr("slice(ds, i + 2, size(ds))")).alias("b"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.first(F.col("a.n")).alias("n_a"),
            F.first(F.col("b.n")).alias("n_b"),
        )
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return pairs.filter(jac >= 0.2).select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )


# MinHash via universal hashing: hash each shingle ONCE (md5 → 32-bit base),
# then derive the N_HASHES signature values as (a_i * base + b_i) mod P.
# This is the textbook (a*x+b) mod p MinHash family — 16× fewer md5 calls
# than hashing (seed, shingle) pairs, and the per-doc aggregation becomes
# 16 min() columns (one shuffled row per doc) instead of a 16-way row
# explosion. a_i < 2^30 and base < 2^32, so a*base+b < 2^63: no overflow
# in either engine's BIGINT. Constants from random.Random(485).
_MH_P = 4294967311  # smallest prime > 2^32
_MH_A = [150268605, 159095909, 816186517, 168494821, 518856395, 926557925,
         366843193, 381244143, 416919317, 505540255, 1049679797, 635732141,
         889533789, 785300349, 802472119, 534290053]
_MH_B = [204742078, 714890015, 924184435, 503223453, 323304978, 722671194,
         519185490, 496142157, 547206507, 234227312, 419156886, 886418856,
         221189791, 178899616, 922099430, 1066782141]

_SPARK_BASE = "cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint)"
_DUCK_BASE = "CAST(CAST(concat('0x', substr(md5(s), 1, 8)) AS UBIGINT) AS BIGINT)"

_N_BANDS = N_HASHES // BAND_ROWS

_DUCK_MINS = ",\n             ".join(
    f"min(({_MH_A[i]} * base + {_MH_B[i]}) % {_MH_P}) AS h{i}"
    for i in range(N_HASHES)
)
_DUCK_BAND_SIG = " ".join(
    "WHEN {b} THEN {sig}".format(
        b=b,
        sig=" || '-' || ".join(
            f"CAST(h{BAND_ROWS * b + r} AS VARCHAR)" for r in range(BAND_ROWS)
        ),
    )
    for b in range(_N_BANDS)
)


# The shingle→signature→band→bucket→pair pipeline, shared verbatim (CTE
# text and DataFrame lineage) by dedup_minhash_lsh and the clustering /
# survivor queries built on top of its candidate pairs.
_DUCK_MINHASH_CTES = f"""sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS shingles
      FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
    ),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE len(shingles) > 0),
    hashes AS (
      SELECT doc_id,
             {_DUCK_MINS}
      FROM (SELECT doc_id, {_DUCK_BASE} AS base FROM ex)
      GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, bb.b AS band_id,
             CASE bb.b {_DUCK_BAND_SIG} END AS band_sig
      FROM hashes, (SELECT unnest(range({_N_BANDS})) AS b) bb
    ),
    mh_pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS n_shared_bands
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )"""


def _minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, h0..h{N_HASHES-1}) MinHash signatures — the banding-
    agnostic front half of _minhash_bands, exposed separately so
    banding-curve evaluations (staged_r22.dedup_lsh_band_curve) share
    THIS signature definition instead of drifting on a copy. One text
    scan: shingle explode -> md5 base -> N_HASHES min() aggregates
    (map-side combine)."""
    from eeecs485_p4_mapreduce_spark.catalog import spread_small_source

    docs = spread_small_source(docs)
    sh = docs.selectExpr(
        "doc_id", f"{word_shingles(_SPARK_TOKS, 3)} AS shingles"
    )
    ex = (
        sh.filter(F.size("shingles") > 0)
        .select("doc_id", F.explode("shingles").alias("s"))
        .selectExpr("doc_id", f"{_SPARK_BASE} AS base")
    )
    return ex.groupBy("doc_id").agg(
        *[
            F.min(
                F.expr(f"({_MH_A[i]} * base + {_MH_B[i]}) % {_MH_P}")
            ).alias(f"h{i}")
            for i in range(N_HASHES)
        ]
    )


def _minhash_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_sig) LSH band signatures for a document set
    — the MinHash front end shared by the batch dedup family and the
    incremental index. One text scan: shingle explode → md5 base → 16
    min() aggregates (map-side combine) → band concat explode. The
    source is spread to core width first IF under-split (a no-op on a
    properly-split warehouse table): the md5-per-shingle base hash is
    the family's dominant CPU and otherwise runs on one core when the
    bench corpus is a single parquet split."""
    hashes = _minhash_signatures(docs)
    band_structs = ", ".join(
        "struct({b} as band_id, concat_ws('-', {cols}) as band_sig)".format(
            b=b,
            cols=", ".join(f"h{BAND_ROWS * b + r}" for r in range(BAND_ROWS)),
        )
        for b in range(_N_BANDS)
    )
    return hashes.select(
        "doc_id", F.explode(F.expr(f"array({band_structs})")).alias("bs")
    ).select(
        "doc_id",
        F.col("bs.band_id").alias("band_id"),
        F.col("bs.band_sig").alias("band_sig"),
    )


def minhash_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs (doc_a < doc_b, n_shared_bands) from
    MinHash+LSH banding — the shared front end of the dedup family."""
    docs = load_table(spark, sf_dir, "documents")
    bands = _minhash_bands(docs)
    buckets = (
        bands.groupBy("band_id", "band_sig")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    pairs = buckets.select(
        F.posexplode("ds").alias("i", "doc_a"), "ds"
    ).select(
        "doc_a", F.explode(F.expr("slice(ds, i + 2, size(ds))")).alias("doc_b")
    )
    return pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_shared_bands")
    )


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_DUCK_MINHASH_CTES}
    SELECT doc_a, doc_b, n_shared_bands FROM mh_pairs
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (16 hashes, (a*x+b) mod p family) + LSH banding (4 bands x
    4 rows): candidate near-dup pairs are docs agreeing on >= 1 full band.

    Plan shape: shingle explode → one md5 per shingle → 16 min() partial
    aggs (map-side combine; exactly one shuffled row per doc) → band
    signatures as plain column concats → bucket agg on (band_id, band_sig)
    → in-bucket pair explode. Candidate pairs come from exploding each
    bucket's sorted doc list instead of a self-join, so the corpus is
    scanned and the signature pipeline runs exactly ONCE (a self-join
    would recompute both sides — Spark plans no ReusedExchange here).
    After the map side only (doc, 16 ints) then (sig, [docs]) cross the
    wire; band signatures are high-entropy so buckets stay tiny (a bucket
    = one near-dup cluster), which bounds the quadratic in-bucket explode.
    """
    return minhash_candidate_pairs(spark, sf_dir)


# Transitive closure over the candidate-pair graph, as a recursive CTE:
# DuckDB's UNION-dedup recursion terminates on cycles, and min-over-
# reachable-set is exactly the label the Spark propagation loop converges
# to. `lbl` has one row per doc that appears in any candidate pair.
_DUCK_CLUSTER_CTES = f"""{_DUCK_MINHASH_CTES},
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM mh_pairs
      UNION ALL
      SELECT doc_b, doc_a FROM mh_pairs
    ),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    lbl AS (
      SELECT a AS doc_id, least(a, min(b)) AS cluster_id
      FROM reach GROUP BY a
    )"""


def _symmetric_edges(pairs: DataFrame) -> DataFrame:
    """(src, dst) edges in BOTH directions from (doc_a, doc_b) pairs, via
    one explode of a 2-element array. A union of two selects reads the
    same result but its branches each re-run the candidate-pair
    aggregation's reduce side (ReusedExchange only shares the shuffle
    write) — the recurring N-consumer re-execution cost; the explode
    form consumes pairs exactly once."""
    return pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                ),
                F.struct(
                    F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")


def _propagate_min_labels(edges: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components by iterative min-label propagation.

    Each round every node takes the min label over itself and its
    neighbors; convergence needs O(component diameter) rounds, and
    near-dup components are dense near-cliques (diameter 2-3), so this
    beats the O(log n)-round large-star/small-star scheme in practice
    while staying a pure DataFrame loop. Lineage is cut per round with
    localCheckpoint so the plan stays O(1) deep; convergence is detected
    by the label-sum invariant — min-propagation only ever lowers labels,
    so sum(lbl) is strictly decreasing until the fixpoint — which costs
    one scalar aggregate per round instead of a labels-to-labels join.

    Round structure (r14, guide §1.2 "the distributed algorithm"): ONE
    Spark job per round. The convergence sum is the action that
    materializes each round's lazy localCheckpoint, so the old
    checkpoint-job + sum-job pair collapses into one; round 1 is fused
    into the first shuffle (labels₁(v) = least(v, min over neighbors)
    is groupBy(src).min(dst) on the symmetric edge list — identical to
    propagating over identity labels, without the identity-labels
    distinct or its materialization). Per-round WORK is unchanged — only
    the job/synchronization count drops (3+2R jobs → 1+R), which is
    scheduler latency at bench scale and driver round-trips at 100 TB.
    """
    edges = edges.localCheckpoint(eager=False)
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("m"))
        .select(
            F.col("src").alias("doc_id"),
            F.least(F.col("src"), F.col("m")).alias("lbl"),
        )
        .localCheckpoint(eager=False)
    )
    # one job: materializes the edges checkpoint + round-1 labels + sum
    prev_sum = labels.agg(F.sum("lbl")).first()[0]
    for _ in range(max_iters - 1):
        msgs = edges.join(labels, edges.src == labels.doc_id).select(
            F.col("dst").alias("doc_id"), "lbl"
        )
        labels = (
            labels.union(msgs)
            .groupBy("doc_id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
        new_sum = labels.agg(F.sum("lbl")).first()[0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


@query(
    "dedup_cc_clusters",
    oracle=f"""
    WITH RECURSIVE {_DUCK_CLUSTER_CTES}
    SELECT l.doc_id, l.cluster_id, s.cluster_size
    FROM lbl l
    JOIN (SELECT cluster_id, count(*) AS cluster_size
          FROM lbl GROUP BY cluster_id) s USING (cluster_id)
    """,
)
def dedup_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the MinHash-LSH
    candidate-pair graph (cluster_id = min doc_id in the component).

    This is the step that turns pairwise candidates into dedup decisions
    — pairs alone can't tell you which docs to drop when A~B and B~C but
    not A~C. Iterative distributed algorithm (see _propagate_min_labels);
    the oracle is the same closure as a recursive CTE. Scale: each round
    shuffles (node, label) tuples only — never documents — and the edge
    list is LSH-sparse, not O(n²)."""
    pairs = minhash_candidate_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = _symmetric_edges(pairs)
    labels = _propagate_min_labels(edges)
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "lbl").select(
        "doc_id", F.col("lbl").alias("cluster_id"), "cluster_size"
    )


@query(
    "dedup_near_survivors",
    oracle=f"""
    WITH RECURSIVE {_DUCK_CLUSTER_CTES}
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM lbl
                      WHERE lbl.doc_id = d.doc_id
                        AND lbl.cluster_id <> d.doc_id)
    """,
)
def dedup_near_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus AFTER near-dup removal: keep the min-doc_id
    representative of every near-dup cluster plus all unclustered docs —
    i.e. what a training pipeline writes back out. One anti-join of
    documents against the non-representative cluster members."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = _symmetric_edges(pairs)
    losers = _propagate_min_labels(edges).filter(
        F.col("lbl") != F.col("doc_id")
    ).select("doc_id")
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "n_chars"
    )


@query(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, t, count(*) AS cnt
      FROM (SELECT doc_id, unnest({_DUCK_TOKS}) AS t FROM documents)
      GROUP BY doc_id, t
    ),
    bits AS (
      SELECT doc_id, b.b AS b,
             sum(CASE WHEN (CAST(CAST(concat('0x', substr(md5(t), 1, 8)) AS UBIGINT)
                            AS BIGINT) >> b.b) & 1 = 1
                      THEN cnt ELSE -cnt END) AS w
      FROM tok, (SELECT unnest(range(32)) AS b) b
      GROUP BY doc_id, b.b
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM bits
    GROUP BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signatures: per-token md5-derived hash, bitwise
    weighted vote by token frequency. The 32 bit votes are 32 conditional
    sum() columns in ONE aggregation (map-side combinable, one shuffled
    row per doc) — a per-bit row explosion would push 32x the rows
    through an extra shuffle for the same answer."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.explode(F.expr(_SPARK_TOKS)).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "doc_id",
            "cnt",
            F.expr("cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint)").alias("h"),
        )
    )
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(h >> {b}) & 1 = 1"), F.col("cnt")).otherwise(
                    -F.col("cnt")
                )
            ).alias(f"w{b}")
            for b in range(32)
        ]
    )
    sig = " + ".join(
        f"(case when w{b} > 0 then {1 << b}L else 0L end)" for b in range(32)
    )
    return votes.selectExpr("doc_id", f"({sig}) AS simhash")


@query(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, t, count(*) AS cnt
      FROM (SELECT doc_id, unnest({_DUCK_TOKS}) AS t FROM documents)
      GROUP BY doc_id, t
    ),
    bits AS (
      SELECT doc_id, b.b AS b,
             sum(CASE WHEN (CAST(CAST(concat('0x', substr(md5(t), 1, 8)) AS UBIGINT)
                            AS BIGINT) >> b.b) & 1 = 1
                      THEN cnt ELSE -cnt END) AS w
      FROM tok, (SELECT unnest(range(32)) AS b) b
      GROUP BY doc_id, b.b
    ),
    sigs AS (
      SELECT doc_id,
             sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS simhash
      FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sigs a JOIN sigs b
      ON (a.simhash >> 16) = (b.simhash >> 16) AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: candidates bucketed by the high 16 bits
    (one table of a Hamming-LSH scheme), verified by exact Hamming
    distance <= 6. Buckets are aggregated once and pairs explode
    in-bucket — a self-join would run the whole signature pipeline twice
    — and the prefix bucketing avoids the O(n²) signature compare."""
    sigs = dedup_simhash(spark, sf_dir)
    buckets = (
        sigs.groupBy(F.expr("simhash >> 16").alias("prefix"))
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    ham = F.expr("bit_count(a.simhash ^ b.simhash)")
    return (
        buckets.select(F.posexplode("ds").alias("i", "a"), "ds")
        .select("a", F.explode(F.expr("slice(ds, i + 2, size(ds))")).alias("b"))
        .filter(ham <= 6)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
    )


# Hard bound for the brute-force path: above this, the driver-side matrix
# materialization stops being an acceptable oracle and the caller must use
# the bucketed ANN operators instead.
MAX_BRUTEFORCE_VECS = 100_000


@query(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                 4) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
             * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
          >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs by cosine >= 0.4, brute-force O(n²) —
    the small-corpus baseline. The scale path is sim_ann_lsh (bucketed);
    this exact variant is the oracle for its recall.

    Kernel: the candidate matrix is materialized once and broadcast (the
    build side of a broadcast join, done by hand), then each partition's
    rows compute a vectorized numpy block product — dense all-pairs math
    belongs in BLAS-shaped code, not per-pair JVM array folds (27s → ~1s
    at sf0.1). Accumulation runs SEQUENTIALLY over dimensions (one
    vectorized add per dim), so every dot/norm is bit-identical to
    DuckDB's sequential list_dot_product — numpy's pairwise-summing
    np.dot would drift in the last ulp and flip rounded values.
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # One pass instead of count()+toPandas(): fetch at most BOUND+1 rows
    # and refuse on overflow — the driver now never *holds* more than the
    # bound either (the old count() ran a whole extra scan job just to
    # decide, then pulled the unbounded table). Row order from limit() is
    # arbitrary, which is fine: the all-pairs output is a set keyed
    # vec_a < vec_b, independent of matrix row order.
    side = emb.limit(MAX_BRUTEFORCE_VECS + 1).toPandas()
    if len(side) > MAX_BRUTEFORCE_VECS:
        raise ValueError(
            f"dedup_embedding_cosine is the O(n^2) small-corpus recall "
            f"oracle: >{MAX_BRUTEFORCE_VECS} vectors exceed the "
            f"driver-side bound. Use sim_ann_lsh / sim_ann_multiprobe "
            f"(operators/similarity.py) — the bucketed scale path."
        )
    all_ids = side["vec_id"].to_numpy()
    all_m = np.array([np.asarray(v, dtype=np.float64) for v in side["embedding"]])
    dim = all_m.shape[1]
    acc = np.zeros(len(all_ids))
    for i in range(dim):  # sequential over dims == the SQL fold
        acc += all_m[:, i] * all_m[:, i]
    all_norms = np.sqrt(acc)
    bc = spark.sparkContext.broadcast((all_ids, all_m, all_norms))

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("vec_a", LongType()),
            StructField("vec_b", LongType()),
            StructField("cosine_raw", DoubleType()),
        ]
    )

    def run(batches):
        ids_b, m_b, norms_b = bc.value
        for pdf in batches:
            a_ids = pdf["vec_id"].to_numpy()
            a_m = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            for lo in range(0, len(a_ids), 512):  # bound block memory
                hi = lo + 512
                blk, blk_ids = a_m[lo:hi], a_ids[lo:hi]
                dots = np.zeros((len(blk_ids), len(ids_b)))
                for i in range(dim):
                    dots += np.outer(blk[:, i], m_b[:, i])
                blk_acc = np.zeros(len(blk_ids))
                for i in range(dim):
                    blk_acc += blk[:, i] * blk[:, i]
                cos = dots / (np.sqrt(blk_acc)[:, None] * norms_b[None, :])
                keep = (blk_ids[:, None] < ids_b[None, :]) & (cos >= 0.4)
                ai, bi = np.nonzero(keep)
                yield pd.DataFrame(
                    {
                        "vec_a": blk_ids[ai],
                        "vec_b": ids_b[bi],
                        "cosine_raw": cos[ai, bi],
                    }
                )

    return emb.mapInPandas(run, schema=out_schema).select(
        "vec_a", "vec_b", F.round("cosine_raw", 4).alias("cosine")
    )


# ---------------------------------------------------------------------------
# Sub-document (chunk-level) dedup: hash every 32-token window-aligned chunk
# and surface chunks shared by more than one document. This is the
# training-pipeline pass that catches copied passages inside otherwise
# distinct documents (exact dedup misses them; MinHash dilutes them).
# Scale: chunking is a map-side array transform — the shuffle carries only
# (md5, doc_id) pairs keyed on a high-entropy hash, so there is exactly one
# skew-free exchange regardless of document size.
# ---------------------------------------------------------------------------
CHUNK_TOKENS = 32


@query(
    "dedup_chunk_shared",
    oracle=f"""
    SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
    FROM (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(0, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS INT) - 1),
               i -> md5(array_to_string(
                      toks[i * {CHUNK_TOKENS} + 1 : (i + 1) * {CHUNK_TOKENS}], ' '))
             )) AS chunk_hash
      FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
    )
    GROUP BY chunk_hash
    HAVING count(DISTINCT doc_id) > 1
    """,
)
def dedup_chunk_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunks of CHUNK_TOKENS tokens, md5-hashed map-side; chunks appearing
    in >1 document are flagged. The final partial chunk of a document is
    hashed as-is (both engines clamp the slice), so short documents form a
    single chunk."""
    docs = load_table(spark, sf_dir, "documents")
    k = CHUNK_TOKENS
    # Tokenizer let-binding (the word_shingles rule): the bare form
    # inlined the regex split into the chunk lambda, re-splitting the
    # document once per chunk. Same chunk strings → same hashes.
    chunks = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(array({_SPARK_TOKS}), __t ->"
                f" transform(sequence(0, greatest(cast(ceil(size(__t) / {k}.0)"
                f" as int), 1) - 1),"
                f" i -> md5(concat_ws(' ', slice(__t, i * {k} + 1, {k})))))[0]"
            )
        ).alias("chunk_hash"),
    )
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# Fuzzy string matching via q-gram blocking: candidate pairs share at least
# one character bigram (the blocking join), then the exact Levenshtein
# distance filters. This is the entity-resolution sibling of MinHash —
# blocking turns the O(n²) all-pairs edit-distance scan into per-bucket
# joins keyed on bigrams. At scale the one refinement needed is dropping
# stop-grams (grams hit by a large fraction of all strings create the only
# big buckets); the shape below is otherwise production-sized: the join
# carries (gram, name) pairs, names are deduplicated first, and the
# Levenshtein check runs once per candidate pair, not per gram hit.
# ---------------------------------------------------------------------------
FUZZY_MAX_DIST = 3


@query(
    "dedup_fuzzy_names",
    oracle=f"""
    WITH names AS (SELECT DISTINCT p_name AS name FROM part),
    grams AS (
      SELECT name, unnest(list_distinct(list_transform(
               range(len(name) - 1), i -> substr(name, i + 1, 2)))) AS g
      FROM names
    ),
    cand AS (
      SELECT a.name AS name_a, b.name AS name_b, count(*) AS shared_grams
      FROM grams a JOIN grams b ON a.g = b.g AND a.name < b.name
      GROUP BY 1, 2
    )
    SELECT name_a, name_b, shared_grams,
           levenshtein(name_a, name_b) AS dist
    FROM cand
    WHERE levenshtein(name_a, name_b) <= {FUZZY_MAX_DIST}
    """,
)
def dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("name")).distinct()
    grams = names.select(
        "name",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, length(name) - 1),"
                    " i -> substring(name, i, 2))"
                )
            )
        ).alias("g"),
    )
    a = grams.select(F.col("name").alias("name_a"), "g")
    b = grams.select(F.col("name").alias("name_b"), "g")
    cand = (
        a.join(b, ["g"])
        .filter(F.col("name_a") < F.col("name_b"))
        .groupBy("name_a", "name_b")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
    return cand.filter(
        F.levenshtein("name_a", "name_b") <= FUZZY_MAX_DIST
    ).select(
        "name_a",
        "name_b",
        "shared_grams",
        F.levenshtein("name_a", "name_b").alias("dist"),
    )


@query(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_DUCK_CLUSTER_CTES},
    cl AS (
      SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster,
             d.lang, d.n_chars
      FROM documents d LEFT JOIN lbl l ON l.doc_id = d.doc_id
    )
    SELECT doc_id, lang, n_chars
    FROM (SELECT *, row_number() OVER (PARTITION BY cluster
                                       ORDER BY n_chars DESC, doc_id) AS rn
          FROM cl)
    WHERE rn = 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup materialization: per near-dup cluster keep
    the BEST document (longest, doc_id as the deterministic tie-break)
    instead of keep-first's smallest-id representative — the policy real
    curation pipelines want, since near-dup clusters usually hold one
    full document plus truncated/boilerplate-wrapped copies.

    Scale shape mirrors dedup_near_survivors: only the clustered docs
    (a small fraction of the corpus) are arbitrated — per-cluster
    arg-max via max_by over a struct, then everyone else survives by an
    anti-join on the loser set. Document bodies never shuffle; the
    arbitration tables carry (doc_id, cluster, n_chars) only.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = _symmetric_edges(pairs)
    labels = _propagate_min_labels(edges)
    members = docs.select("doc_id", "n_chars").join(labels, "doc_id")
    keepers = members.groupBy("lbl").agg(
        F.max_by(
            "doc_id",
            F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("nd")),
        ).alias("keeper")
    )
    losers = (
        members.join(keepers, "lbl")
        .filter(F.col("doc_id") != F.col("keeper"))
        .select("doc_id")
    )
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "n_chars"
    )


@query(
    "dedup_incremental",
    oracle=f"""
    WITH {_DUCK_MINHASH_CTES},
    split AS (SELECT max(doc_id) * 3 // 5 AS s FROM documents),
    idx AS (SELECT b.* FROM bands b, split WHERE b.doc_id <= split.s),
    delta AS (SELECT b.* FROM bands b, split WHERE b.doc_id > split.s),
    hi AS (
      SELECT d.doc_id, count(DISTINCT i.doc_id) AS n_hits_index
      FROM delta d JOIN idx i
        ON d.band_id = i.band_id AND d.band_sig = i.band_sig
      GROUP BY 1
    ),
    hd AS (
      SELECT d.doc_id, count(DISTINCT e.doc_id) AS n_hits_delta
      FROM delta d JOIN delta e
        ON d.band_id = e.band_id AND d.band_sig = e.band_sig
       AND e.doc_id < d.doc_id
      GROUP BY 1
    )
    SELECT doc.doc_id,
           coalesce(hi.n_hits_index, 0) AS n_hits_index,
           coalesce(hd.n_hits_delta, 0) AS n_hits_delta,
           (coalesce(hi.n_hits_index, 0) = 0
            AND coalesce(hd.n_hits_delta, 0) = 0) AS keep
    FROM (SELECT doc_id FROM documents, split WHERE doc_id > split.s) doc
    LEFT JOIN hi USING (doc_id)
    LEFT JOIN hd USING (doc_id)
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup: a DELTA batch of new documents is screened
    against a STORED MinHash band index of the already-ingested corpus —
    the production shape, where yesterday's 100 TB is an indexed parquet
    table of (band_id, band_sig, doc_id) and only the new data's text is
    ever shingled. A new doc is kept iff it collides with no indexed doc
    and no earlier doc inside its own batch (first-wins within the delta,
    matching dedup_keep_first's policy).

    Scale shape: the index join is keyed on the band signature — the
    shuffle carries signatures, never text; the index side would be
    bucketed by (band_id, band_sig) on disk so the probe is a co-located
    join. The delta's bands are computed once (localCheckpoint) and feed
    both the index probe and the in-batch self-join. The demo materializes
    the index to parquet first so the probe genuinely reads stored
    signatures (doc_id <= 60% of max simulates yesterday's corpus).

    r14 plan shape (guide §2.4 "remove shuffles outright"): the index
    probe and the in-batch self-join share identical band keys, so they
    run as ONE join — stored index rows and earlier-delta rows union into
    a single tagged probe side, and the two count_distinct aggregates
    become conditional aggregates of one groupBy (6 exchanges → 3, two
    probe passes over the delta bands → one). The residual
    `is_idx OR e_doc < doc_id` filter reproduces the original pair
    exactly: index collisions count unconditionally, in-batch collisions
    only first-wins."""
    import shutil
    import tempfile

    from eeecs485_p4_mapreduce_spark.operators.relational import (
        _parquet_col_minmax,
    )

    docs = load_table(spark, sf_dir, "documents")
    # Split boundary from parquet FOOTER statistics (r15, the q28
    # pattern): numeric footer max IS the exact max(doc_id), and Python
    # integer max*3//5 equals the old (max*3/5).cast(bigint) for any
    # non-negative max below 2^53 — and matches the oracle's own
    # integer `max(doc_id) * 3 // 5` exactly at ANY magnitude, where
    # the double-division form could drift. Removes the one full
    # driver-barrier aggregate job the query paid before any real work.
    mm = _parquet_col_minmax(table_path(sf_dir, "documents"), "doc_id")
    if mm is not None:
        split = int(mm[1]) * 3 // 5
    else:  # pragma: no cover — driver-generated tables always carry stats
        split = docs.agg((F.max("doc_id") * 3 / 5).cast("bigint")).first()[0]
    idx_dir = tempfile.mkdtemp(prefix="p4spark_mhidx_")
    try:
        # ONE shingle+hash pass over the corpus: bands for all docs are
        # computed once (lazy checkpoint), and the index write and the
        # delta probe each filter their half of the SAME materialized
        # rows — band values are per-doc, so filter-before vs
        # filter-after is identical, and the two separate minhash
        # pipelines (two spread shuffles, two agg stages over disjoint
        # halves) collapse into one.
        all_bands = _minhash_bands(docs).localCheckpoint(eager=False)
        idx_bands = all_bands.filter(F.col("doc_id") <= split)
        idx_bands.write.mode("overwrite").parquet(idx_dir)
        # schema from the writer side: a fresh inference job on the temp
        # path would re-read the footer we just wrote
        index = spark.read.schema(idx_bands.schema).parquet(idx_dir)
        delta_docs = docs.filter(F.col("doc_id") > split)
        delta_bands = all_bands.filter(F.col("doc_id") > split)
        probe = index.select(
            "band_id",
            "band_sig",
            F.col("doc_id").alias("o_doc"),
            F.lit(True).alias("is_idx"),
        ).unionByName(
            delta_bands.select(
                "band_id",
                "band_sig",
                F.col("doc_id").alias("o_doc"),
                F.lit(False).alias("is_idx"),
            )
        )
        hits = (
            delta_bands.join(probe, ["band_id", "band_sig"])
            .filter(F.col("is_idx") | (F.col("o_doc") < F.col("doc_id")))
            .groupBy("doc_id")
            .agg(
                F.count_distinct(
                    F.when(F.col("is_idx"), F.col("o_doc"))
                ).alias("n_hits_index"),
                F.count_distinct(
                    F.when(~F.col("is_idx"), F.col("o_doc"))
                ).alias("n_hits_delta"),
            )
        )
        out = (
            delta_docs.select("doc_id")
            .join(hits, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_hits_index", F.lit(0)).alias("n_hits_index"),
                F.coalesce("n_hits_delta", F.lit(0)).alias("n_hits_delta"),
                (
                    (F.coalesce("n_hits_index", F.lit(0)) == 0)
                    & (F.coalesce("n_hits_delta", F.lit(0)) == 0)
                ).alias("keep"),
            )
            # pre-checkpoint plan evidence (no-op unless the env hook
            # is set): the returned plan is a Scan ExistingRDD, which
            # hides the fused probe join structure from explain dumps
            .transform(
                lambda d: dump_plan_evidence(d, "dedup_incremental_prepin")
            )
            .localCheckpoint()  # materialize before the index dir vanishes
        )
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
    return out


EDGE_TOKENS = 16  # tokens hashed at each document edge


@query(
    "dedup_suffix_prefix",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ),
    edges AS (
      SELECT doc_id,
             md5(array_to_string(toks[1:{EDGE_TOKENS}], ' ')) AS prefix_fp,
             md5(array_to_string(toks[-{EDGE_TOKENS}:], ' ')) AS suffix_fp
      FROM t WHERE len(toks) >= {EDGE_TOKENS}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM edges a JOIN edges b
      ON a.suffix_fp = b.prefix_fp AND a.doc_id <> b.doc_id
    """,
)
def dedup_suffix_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenation-artifact detection: doc A's trailing EDGE_TOKENS
    tokens equal doc B's leading tokens — the signature of crawl
    pipelines that glue page fragments (A|B splits of one original
    document). One scan computes both edge fingerprints map-side; the
    join is keyed on the 128-bit fingerprint, so the shuffle carries
    (fp, doc_id) pairs and candidates collide only on exact edge
    matches — never an all-pairs or substring comparison."""
    docs = load_table(spark, sf_dir, "documents")
    edges = (
        docs.selectExpr("doc_id", f"{_SPARK_TOKS} AS toks")
        .filter(F.size("toks") >= EDGE_TOKENS)
        .select(
            "doc_id",
            F.md5(
                F.expr(f"array_join(slice(toks, 1, {EDGE_TOKENS}), ' ')")
            ).alias("prefix_fp"),
            F.md5(
                F.expr(f"array_join(slice(toks, -{EDGE_TOKENS}, {EDGE_TOKENS}), ' ')")
            ).alias("suffix_fp"),
        )
    )
    a = edges.select(F.col("doc_id").alias("doc_a"), "suffix_fp")
    b = edges.select(F.col("doc_id").alias("doc_b"), "prefix_fp")
    return a.join(
        b, (F.col("suffix_fp") == F.col("prefix_fp")) & (F.col("doc_a") != F.col("doc_b"))
    ).select("doc_a", "doc_b")


# Containment threshold: doc A "appears inside" doc B when at least 60%
# of A's shingles are also B's. Asymmetric by definition — a quote, a
# boilerplate inclusion, or a superset rewrite scores high A-in-B while
# Jaccard (which divides by the union) stays low for size-mismatched
# pairs, which is exactly why training-data dedup pipelines run
# containment alongside Jaccard.
CONTAINMENT_MIN = 0.6


@query(
    "dedup_containment",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS shingles
      FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
    ),
    ex AS (SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS n_common,
             any_value(a.n) AS n_a, any_value(b.n) AS n_b
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(n_common AS DOUBLE) / n_a, 4) AS cont_a_in_b,
           round(CAST(n_common AS DOUBLE) / n_b, 4) AS cont_b_in_a
    FROM pairs
    WHERE CAST(n_common AS DOUBLE) / least(n_a, n_b) >= {CONTAINMENT_MIN}
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection by shingle CONTAINMENT: for each
    candidate pair, |A∩B|/|A| and |A∩B|/|B| over distinct 3-word
    shingles, kept when the smaller document is >= 60% contained in the
    larger. Catches quotes/boilerplate inclusions/superset rewrites that
    Jaccard misses on size-mismatched pairs (|A∩B|/|A∪B| stays low when
    |B| >> |A|).

    Scale: identical candidate generation to dedup_ngram_jaccard — an
    inverted shingle index whose posting lists pair up in-bucket (only
    docs sharing a shingle are ever compared; bodies never join) — and
    the containment arithmetic is exact int/int on the counted
    intersections, engine-portable."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.selectExpr("doc_id", f"{word_shingles(_SPARK_TOKS, 3)} AS shingles")
    ex = sh.select(
        "doc_id", F.explode("shingles").alias("s"), F.size("shingles").alias("n")
    )
    postings = ex.groupBy("s").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("ds")
    ).filter(F.size("ds") > 1)
    pairs = (
        postings.select(F.posexplode("ds").alias("i", "a"), "ds")
        .select("a", F.explode(F.expr("slice(ds, i + 2, size(ds))")).alias("b"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.first(F.col("a.n")).alias("n_a"),
            F.first(F.col("b.n")).alias("n_b"),
        )
    )
    cont_small = F.col("n_common").cast("double") / F.least("n_a", "n_b")
    return pairs.filter(cont_small >= CONTAINMENT_MIN).select(
        "doc_a",
        "doc_b",
        F.round(F.col("n_common").cast("double") / F.col("n_a"), 4).alias(
            "cont_a_in_b"
        ),
        F.round(F.col("n_common").cast("double") / F.col("n_b"), 4).alias(
            "cont_b_in_a"
        ),
    )
