"""Similarity search over the `embeddings` table (array<float> column):

- brute-force cosine top-k (the exactness baseline),
- random-hyperplane LSH bucketed search (the scale path),
- IVF-style partitioned search using the precomputed cluster label.

Scale design: the query set is always the broadcast side — the big
embedding table never shuffles for the join. Cosine math is expressed as
JVM higher-order array folds (zip_with + aggregate) over doubles in array
order, which is bit-identical to DuckDB's sequential list_dot_product —
so even floating-point outputs hash-match the oracle. No Python UDFs.

At 100 TB (billions of vectors) the brute-force variant is the per-bucket
kernel, not the global plan: LSH/IVF restrict candidates first, and the
top-k per query is a window row_number over (bucket-restricted)
candidates, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eeecs485_p4_mapreduce_spark.catalog import load_table, table_path, pin_disk
from eeecs485_p4_mapreduce_spark.registry import query


def _parquet_row_count(path: str) -> int:
    """Row count from parquet footers only (no Spark job); handles a
    single file, a flat directory of part files, and a partitioned /
    nested layout (rglob). Raises instead of returning 0 when the glob
    finds nothing — a silent 0 would flip every footer-based size check
    (e.g. the HNSW adjacency broadcast gate) to "small" at any scale."""
    from pathlib import Path

    import pyarrow.parquet as pq

    p = Path(path)
    files = sorted(p.rglob("*.parquet")) if p.is_dir() else [p]
    if not files:
        raise FileNotFoundError(
            f"no *.parquet files under {path!r}; cannot size the table"
        )
    return sum(pq.read_metadata(str(f)).num_rows for f in files)

N_QUERIES = 5  # vec_id < 5 are the demo query vectors
TOP_K = 10
# 6 hyperplanes → 64 buckets: coarse enough that buckets hold real
# candidate sets at the test scale; at billion-vector scale you'd raise
# this (and/or multi-probe neighboring buckets) to keep buckets bounded.
N_PLANES = 6
DIM = 64


def _emb_with_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The whole sim family funnels through here, and every consumer does
    # per-row HOF work (folds, per-dim transforms) — spread the
    # under-split bench source to core width once (no-op on a
    # properly-split table) so none of it serializes on one core.
    from eeecs485_p4_mapreduce_spark.catalog import spread_small_source

    emb = spread_small_source(
        load_table(spark, sf_dir, "embeddings"), "vec_id"
    ).select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    return emb.withColumn(
        "norm",
        F.sqrt(
            F.expr(
                "aggregate(zip_with(v, v, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x)"
            )
        ),
    )


_DUCK_COS = (
    "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
    " / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))"
    "    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
)


@query(
    "sim_topk_bruteforce",
    oracle=f"""
    SELECT query_id, neighbor_id, rank, round(cosine, 4) AS cosine
    FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_DUCK_COS} AS cosine,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY {_DUCK_COS} DESC, b.vec_id) AS rank
      FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    )
    WHERE rank <= {TOP_K}
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for each query vector, via broadcast join of the
    (tiny) query set against all candidates + per-query window top-k."""
    emb = _emb_with_norm(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    cand = emb.select(
        F.col("vec_id").alias("neighbor_id"), "v", "norm"
    )
    dot = F.expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x)")
    cos = (dot / (F.col("qnorm") * F.col("norm"))).alias("cosine_raw")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_raw").desc(), F.col("neighbor_id")
    )
    return (
        cand.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("cosine_raw", 4).alias("cosine"),
        )
    )


# --- LSH: deterministic md5-derived random hyperplanes ---------------------
# sign(plane j, dim i) = +1 if low bit of hash32(j:i) else -1; the
# projection is a sequential left-associated sum over dims so both engines
# compute the identical double. The signs are compile-time constants
# (md5 of fixed strings), so the Spark side inlines them as ±1 literals:
# the projection becomes a straight-line codegen'd FP sum instead of
# re-hashing 6x64 constant strings per row (measured 3x faster at sf0.1).
# The DuckDB oracle recomputes the same signs from md5 in SQL, proving
# the constants right.
_DUCK_SIGN = (
    "CAST(CAST(concat('0x', substr(md5(CAST(j AS VARCHAR) || ':' ||"
    " CAST(i AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT) & 1"
)


def _sign(j: int, i: int) -> float:
    import hashlib

    h = int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:8], 16)
    return 1.0 if (h & 1) == 1 else -1.0


_SIGNS = [[_sign(j, i) for i in range(1, DIM + 1)] for j in range(N_PLANES)]


def _spark_bucket_expr(n_planes: int = N_PLANES) -> str:
    """LSH bucket of double-array column v, signs inlined as literals in
    dim order (left-associated: bit-matches the oracle's sequential
    list_sum). ``n_planes`` truncates to the first planes — the HNSW
    layers use coarser PREFIX buckets (fewer planes) at higher levels."""
    planes = []
    for j in range(n_planes):
        # zip_with against a literal sign array, not a flat 64-term sum:
        # the flat form's 384 interpreted terms cost ~2x the HOF's tight
        # fold AND ~3x its codegen compile (r10 A/B: 0.58 s -> 0.33 s
        # warm, 1.43 s -> 0.45 s cold on the bench table). Accumulation
        # stays sequential i=1..DIM, so buckets are bit-identical to the
        # oracle's list_sum.
        signs = ", ".join(f"{_SIGNS[j][i]}d" for i in range(DIM))
        dot = (
            f"aggregate(zip_with(v, array({signs}), (x, s) -> x * s),"
            f" 0.0d, (acc, x) -> acc + x)"
        )
        planes.append(
            f"(case when ({dot}) > 0.0d then {1 << j}L else 0L end)"
        )
    return " + ".join(planes)


# DuckDB cannot correlate a column into a lambda inside a scalar subquery,
# so the bucket computation is a flat cross-join (vector x plane) + group-by.
_DUCK_BUCKETED = f"""
      SELECT e.vec_id,
             any_value(e.label) AS label,
             any_value(e.embedding) AS embedding,
             CAST(sum(CASE WHEN
                   list_sum(list_transform(range(1, {DIM + 1}),
                     i -> (CASE WHEN {_DUCK_SIGN} = 1 THEN 1.0 ELSE -1.0 END)
                          * (e.embedding::DOUBLE[])[i])) > 0.0
                 THEN (CAST(1 AS BIGINT) << j.j) ELSE 0 END) AS BIGINT)
               AS bucket
      FROM embeddings e, (SELECT unnest(range({N_PLANES})) AS j) j
      GROUP BY e.vec_id
"""


@query(
    "sim_lsh_buckets",
    oracle=f"""
    SELECT vec_id, label, bucket FROM ({_DUCK_BUCKETED})
    """,
)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector 16-bit LSH bucket signatures (random-hyperplane /
    SimHash-for-vectors). Pure map-side; this is the index-build step."""
    emb = _emb_with_norm(spark, sf_dir)
    return emb.selectExpr("vec_id", "label", f"{_spark_bucket_expr()} AS bucket")


@query(
    "sim_ann_lsh",
    oracle=f"""
    WITH bucketed AS (
      {_DUCK_BUCKETED}
    )
    SELECT query_id, neighbor_id, rank, round(cosine, 4) AS cosine
    FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_DUCK_COS} AS cosine,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY {_DUCK_COS} DESC, b.vec_id) AS rank
      FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    )
    WHERE rank <= {TOP_K}
    """,
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN: candidates restricted to the query's LSH bucket,
    then exact cosine top-k within the bucket. The join is keyed on the
    bucket signature — at scale this is the only shuffle and it touches
    candidates, not the full corpus."""
    emb = _emb_with_norm(spark, sf_dir).withColumn(
        "bucket", F.expr(_spark_bucket_expr())
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    dot = F.expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x)")
    cos = (dot / (F.col("qnorm") * F.col("norm"))).alias("cosine_raw")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_raw").desc(), F.col("vec_id")
    )
    return (
        emb.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos, F.col("vec_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("cosine_raw", 4).alias("cosine"),
        )
    )


@query(
    "sim_ivf_label",
    oracle=f"""
    SELECT query_id, neighbor_id, rank, round(cosine, 4) AS cosine
    FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_DUCK_COS} AS cosine,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY {_DUCK_COS} DESC, b.vec_id) AS rank
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    )
    WHERE rank <= {TOP_K}
    """,
)
def sim_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style search: probe only the query's own partition (here the
    precomputed cluster `label` stands in for the nearest-centroid list).
    At scale the table is partitioned/bucketed by label on disk, so this
    probes one partition per query instead of the full corpus."""
    emb = _emb_with_norm(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("label").alias("qlabel"),
    )
    dot = F.expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x)")
    cos = (dot / (F.col("qnorm") * F.col("norm"))).alias("cosine_raw")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_raw").desc(), F.col("vec_id")
    )
    return (
        emb.join(
            F.broadcast(queries),
            (F.col("label") == F.col("qlabel"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos, "vec_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("cosine_raw", 4).alias("cosine"),
        )
    )


def _centroids(emb: DataFrame, extra_keys: tuple = ()) -> DataFrame:
    """Per-label centroids: element-wise mean via posexplode + (label, dim)
    partial agg, reassembled in dim order. Output: (c_label, cv, cnorm),
    plus any ``extra_keys`` columns carried through the grouping —
    dedup_semdedup_scaledk re-seeds centroids per replica shard by
    passing ("rep",), so the probe variant shares THIS definition
    instead of drifting on a copy."""
    keys = list(extra_keys)
    ex = emb.select(*keys, "label", F.posexplode("v").alias("i", "x"))
    return (
        ex.groupBy(*keys, "label", "i")
        .agg(F.avg("x").alias("m"))
        .groupBy(*keys, F.col("label").alias("c_label"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i, m))), s -> s.m)"
            ).alias("cv")
        )
        .withColumn(
            "cnorm",
            F.sqrt(
                F.expr(
                    "aggregate(zip_with(cv, cv, (x, y) -> x * y),"
                    " 0.0d, (acc, x) -> acc + x)"
                )
            ),
        )
    )


def _centroids_packed(emb: DataFrame) -> DataFrame:
    """All centroids folded into ONE row: array<struct<c_label, cv, cnorm>>.
    The centroid table is index metadata (k rows), so packing it lets the
    nearest-centroid assignment run as a row-local array_sort instead of a
    crossJoin + per-vector window — the window's shuffle is k x corpus at
    scale, while this costs nothing beyond the broadcast."""
    return _centroids(emb).agg(
        F.collect_list(F.struct("c_label", "cv", "cnorm")).alias("cens")
    )


# Row-local nearest-centroid ranking: score every centroid against the
# row's vector (same sequential fold as the oracle's list_dot_product) and
# sort by (cosine desc, c_label asc) — bit-identical tie-breaking to the
# row_number() window it replaces. collect_list order is immaterial: the
# comparator imposes the total order.
_ASSIGN_SORTED = """
array_sort(
  transform(cens, c -> named_struct(
    'cos_c', aggregate(zip_with(v, c.cv, (x, y) -> x * y), 0.0d,
                       (acc, x) -> acc + x) / (norm * c.cnorm),
    'c_label', c.c_label)),
  (a, b) -> CASE WHEN a.cos_c > b.cos_c THEN -1
                 WHEN a.cos_c < b.cos_c THEN 1
                 WHEN a.c_label < b.c_label THEN -1
                 WHEN a.c_label > b.c_label THEN 1
                 ELSE 0 END)
"""


@query(
    "sim_ivf_build",
    oracle="""
    WITH ex AS (
      SELECT label, ii.i AS i, v[ii.i] AS x
      FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
           (SELECT unnest(range(1, 65)) AS i) ii
    ),
    cen AS (
      SELECT label AS c_label, list(m ORDER BY i) AS cv
      FROM (SELECT label, i, avg(x) AS m FROM ex GROUP BY label, i)
      GROUP BY label
    ),
    scored AS (
      SELECT e.vec_id, e.label, c.c_label,
             list_dot_product(e.embedding::DOUBLE[], c.cv)
             / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                * sqrt(list_dot_product(c.cv, c.cv))) AS cos,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cv)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                 c.c_label) AS rnk
      FROM embeddings e CROSS JOIN cen c
    )
    SELECT vec_id, label, c_label AS assigned_label,
           round(cos, 4) AS cosine,
           CASE WHEN c_label = label THEN 1 ELSE 0 END AS is_match
    FROM scored WHERE rnk = 1
    """,
)
def sim_ivf_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index BUILD: per-label centroids (element-wise mean via
    posexplode + (label, dim) partial agg) and nearest-centroid
    assignment for every vector — the quantization step that turns the
    label partitioning of sim_ivf_label into a real learned inverted
    file (one k-means iteration seeded from labels).

    Scale: centroid build shuffles (label, dim, partial-sum) — n_vectors
    x dim rows map-side-combined down to k x dim — and the assignment
    broadcasts the packed centroid row and ranks centroids INSIDE each
    vector's row (array_sort over k scores), so the embedding table
    never shuffles and there is no per-vector window. is_match rides
    along as the recall-vs-truth measure."""
    emb = _emb_with_norm(spark, sf_dir)
    return (
        emb.crossJoin(F.broadcast(_centroids_packed(emb)))
        .selectExpr(
            "vec_id", "label", f"element_at({_ASSIGN_SORTED}, 1) AS best"
        )
        .select(
            "vec_id",
            "label",
            F.col("best.c_label").alias("assigned_label"),
            F.round("best.cos_c", 4).alias("cosine"),
            F.when(F.col("best.c_label") == F.col("label"), 1)
            .otherwise(0)
            .alias("is_match"),
        )
    )


_PROBE_FLIPS = [0] + [1 << j for j in range(N_PLANES)]


@query(
    "sim_ann_multiprobe",
    oracle=f"""
    WITH bucketed AS (
      {_DUCK_BUCKETED}
    ),
    probes AS (
      SELECT vec_id, embedding, xor(bucket, f.f) AS probe
      FROM bucketed, (SELECT unnest({_PROBE_FLIPS}) AS f) f
      WHERE vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, rank, round(cosine, 4) AS cosine
    FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_DUCK_COS} AS cosine,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY {_DUCK_COS} DESC, b.vec_id) AS rank
      FROM probes a JOIN bucketed b
        ON b.bucket = a.probe AND b.vec_id <> a.vec_id
    )
    WHERE rank <= {TOP_K}
    """,
)
def sim_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: each query searches its own bucket PLUS the
    {N_PLANES} buckets at Hamming distance 1 (one hyperplane flip) —
    the standard recall repair for vectors near a boundary, at 7x probe
    cost instead of 2x index size (vs adding hash tables). Every vector
    lives in exactly one bucket and probes are distinct, so no pair
    dedup is needed. The probe set explodes on the broadcast (query)
    side — the corpus side still shuffles nothing."""
    emb = _emb_with_norm(spark, sf_dir).withColumn(
        "bucket", F.expr(_spark_bucket_expr())
    )
    flips = ", ".join(f"cast({f} as bigint)" for f in _PROBE_FLIPS)
    queries = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
            F.explode(
                F.expr(f"transform(array({flips}), f -> bucket ^ f)")
            ).alias("probe"),
        )
    )
    dot = F.expr(
        "aggregate(zip_with(qv, v, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x)"
    )
    cos = (dot / (F.col("qnorm") * F.col("norm"))).alias("cosine_raw")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_raw").desc(), F.col("vec_id")
    )
    return (
        emb.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("probe"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos, "vec_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("cosine_raw", 4).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# IVF SEARCH with the learned index: assign every vector to its nearest
# learned centroid (the cells built by sim_ivf_build), then answer each
# query by probing its NPROBE nearest cells and brute-forcing only the
# candidates inside them. This closes the IVF story: build (centroids) →
# label (single-cell probe on the given labels) → search (multi-cell probe
# on the LEARNED cells, the production read path).
# Scale: centroids and the (query, probe-cell) list are broadcast; the big
# side flows scan → assignment → candidate filter with its only shuffles
# being the per-vector argmin window (same cost as the build itself) and
# the final per-query top-k — never an all-pairs join. The centroid build
# appears twice in this self-contained plan (once under cells, once under
# probes — Catalyst rightly pushes the query-id filter below the probe
# window, which forks the subtrees); in production the search path reads
# the centroids and cell assignments persisted by sim_ivf_build instead of
# recomputing them inline, leaving one scan + one broadcast + one top-k.
# ---------------------------------------------------------------------------
NPROBE = 2

_DUCK_IVF_CELLS = """
    ex AS (
      SELECT label, ii.i AS i, v[ii.i] AS x
      FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
           (SELECT unnest(range(1, 65)) AS i) ii
    ),
    cen AS (
      SELECT label AS c_label, list(m ORDER BY i) AS cv
      FROM (SELECT label, i, avg(x) AS m FROM ex GROUP BY label, i)
      GROUP BY label
    ),
    scored AS (
      SELECT e.vec_id, e.embedding, c.c_label,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cv)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                 c.c_label) AS rnk
      FROM embeddings e CROSS JOIN cen c
    )
"""


@query(
    "sim_ivf_search",
    oracle=f"""
    WITH {_DUCK_IVF_CELLS},
    cells AS (
      SELECT vec_id, embedding, c_label AS cell FROM scored WHERE rnk = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, embedding AS qemb, c_label AS cell
      FROM scored WHERE vec_id < {N_QUERIES} AND rnk <= {NPROBE}
    ),
    cand AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             list_dot_product(p.qemb::DOUBLE[], c.embedding::DOUBLE[])
             / (sqrt(list_dot_product(p.qemb::DOUBLE[], p.qemb::DOUBLE[]))
                * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])))
               AS cos
      FROM probes p JOIN cells c ON c.cell = p.cell AND c.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, rank, round(cos, 4) AS cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS rank
          FROM cand)
    WHERE rank <= {TOP_K}
    """,
)
def sim_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nprobe-cell IVF search over the learned centroid cells (see module
    banner; reference has no similarity ops — SURVEY.md §2.8 north-star)."""
    emb = _emb_with_norm(spark, sf_dir)
    # Row-local nprobe assignment: rank the k broadcast centroids inside
    # each row, keep the top NPROBE — zero shuffles where the old plan
    # paid a k x corpus crossJoin + per-vector window. The packed
    # centroid row is pinned (persist, r15 — a lazy localCheckpoint
    # still ran its 4 upstream AQE stages as plan-build jobs; the
    # persist pin is genuinely lazy and in-run cache reuse still
    # guarantees ONE centroid aggregate — a corpus scan at 100 TB —
    # however many branches read it).
    packed = _centroids_packed(emb).transform(pin_disk)
    scored = emb.crossJoin(F.broadcast(packed)).selectExpr(
        "vec_id",
        "v",
        "norm",
        f"slice({_ASSIGN_SORTED}, 1, {NPROBE}) AS top_cells",
    )
    cells = scored.selectExpr(
        "vec_id", "v", "norm", "element_at(top_cells, 1).c_label AS cell"
    )
    probes = (
        scored.filter(F.col("vec_id") < N_QUERIES)
        .selectExpr(
            "vec_id AS query_id",
            "v AS qv",
            "norm AS qnorm",
            "explode(top_cells) AS tc",
        )
        .select("query_id", "qv", "qnorm", F.col("tc.c_label").alias("cell"))
    )
    dotq = F.expr(
        "aggregate(zip_with(qv, v, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x)"
    )
    w_topk = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        cells.join(
            F.broadcast(probes),
            (cells["cell"] == probes["cell"])
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dotq / (F.col("qnorm") * F.col("norm"))).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w_topk))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cosine"))
    )


@query(
    "sim_embedding_covariance",
    oracle="""
    WITH ex AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    )
    SELECT a.i AS i, b.i AS j,
           -- + 0.0 collapses IEEE negative zero (round(-1e-9, 5) is -0.0 in
           -- DuckDB but 0.0 in Spark; they stringify differently)
           round(avg(a.x * b.x) - avg(a.x) * avg(b.x), 5) + 0.0 AS cov
    FROM ex a JOIN ex b USING (vec_id)
    WHERE a.i <= b.i
    GROUP BY 1, 2
    """,
)
def sim_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass covariance matrix of the embedding table (the input to
    PCA / whitening / dimensionality audits): upper triangle of
    E[x_i x_j] - E[x_i]E[x_j] as (i, j, cov) rows, 1-based indices.

    Scale: each vector generates its d(d+1)/2 upper-triangle products in
    a single JVM flatten/transform (no self-join of the exploded table —
    that would shuffle d rows per vector twice), and the partial
    aggregate collapses the fanout map-side, so the one exchange carries
    at most d(d+1)/2 rows per task regardless of corpus size. The oracle
    states the same math relationally (self-join on vec_id) — fine at
    oracle scale, wrong at 100 TB; the generate form is the scale path.
    The under-split bench source is spread to core width first (the
    d(d+1)/2 struct fanout per row is the whole cost; no-op on a
    properly-split table)."""
    from eeecs485_p4_mapreduce_spark.catalog import spread_small_source

    emb = spread_small_source(
        load_table(spark, sf_dir, "embeddings"), "vec_id"
    )
    tri = emb.select(
        F.explode(
            F.expr(
                """
                flatten(transform(sequence(1, size(embedding)), i ->
                  transform(sequence(i, size(embedding)), j -> struct(
                    i AS i, j AS j,
                    CAST(element_at(embedding, i) AS DOUBLE) AS xi,
                    CAST(element_at(embedding, j) AS DOUBLE) AS xj))))
                """
            )
        ).alias("t")
    ).select("t.i", "t.j", "t.xi", "t.xj")
    return tri.groupBy("i", "j").agg(
        (
            F.round(
                F.avg(F.col("xi") * F.col("xj")) - F.avg("xi") * F.avg("xj"),
                5,
            )
            + F.lit(0.0)  # collapse IEEE -0.0, mirroring the oracle
        ).alias("cov")
    )


RP_OUT_DIM = 16
RP_IN_DIM = 64


def _rp_signs() -> list[list[float]]:
    """Deterministic +-1 Rademacher projection matrix, seeded by md5 so
    both engines can embed the identical literal (a JL projection is
    shipped as a fixed seed matrix in practice — regenerating it per row
    would cost d*k hashes per vector for no benefit)."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"rp{k}_{i}".encode()).hexdigest()[0], 16) % 2
            == 0
            else -1.0
            for i in range(1, RP_IN_DIM + 1)
        ]
        for k in range(1, RP_OUT_DIM + 1)
    ]


_RP_SPARK = (
    "array("
    + ", ".join(
        "array(" + ", ".join(f"{v}D" for v in row) + ")"
        for row in _rp_signs()
    )
    + ")"
)
# Oracle form: one UNION ALL branch per output dim, each a native
# list_dot_product against that dim's literal sign row — a per-row list
# comprehension over the full 16x64 literal is ~100x slower in DuckDB.
_RP_DUCK_BRANCHES = "\n    UNION ALL\n".join(
    f"""
    SELECT vec_id, {k + 1} AS k,
           round(list_dot_product(CAST(embedding AS DOUBLE[]),
                 [{", ".join(str(v) for v in row)}]) / 8, 5) + 0.0 AS v
    FROM embeddings"""
    for k, row in enumerate(_rp_signs())
)


@query("sim_random_projection", oracle=_RP_DUCK_BRANCHES)
def sim_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project each
    64-d embedding to 16 dims with a fixed Rademacher (+-1) matrix,
    scaled by 1/sqrt(d) — the standard cheap preprocessing before ANN
    indexing or clustering when the native dimension is wasteful.

    Scale: completely row-local — zero shuffles, zero joins; the
    projection matrix is a compile-time literal folded into the
    whole-stage-codegen expression, and the per-row cost is exactly
    d*k fused multiply-adds. The fold runs in array-index order on
    both engines, so floating-point results hash-match exactly.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id",
            F.explode(F.expr(f"sequence(1, {RP_OUT_DIM})")).alias("k"),
            "embedding",
        )
        .select(
            "vec_id",
            "k",
            F.expr(
                f"""
                round(aggregate(sequence(1, {RP_IN_DIM}), 0D,
                  (acc, i) -> acc
                    + CAST(element_at(embedding, i) AS DOUBLE)
                      * element_at(element_at({_RP_SPARK}, k), i)) / 8,
                  5) + 0.0d AS v
                -- + 0.0 collapses IEEE -0.0 (engines render it differently)
                """
            ),
        )
    )


_RP_DUCK_LIST = (
    "["
    + ", ".join(
        "list_dot_product(CAST(embedding AS DOUBLE[]), ["
        + ", ".join(str(v) for v in row)
        + "]) / 8"
        for row in _rp_signs()
    )
    + "]"
)
_RP_SPARK_PROJ = (
    f"transform(sequence(1, {RP_OUT_DIM}), k -> "
    f"aggregate(sequence(1, {RP_IN_DIM}), 0D, (acc, i) -> acc"
    f" + CAST(element_at(embedding, i) AS DOUBLE)"
    f" * element_at(element_at({_RP_SPARK}, k), i)) / 8)"
)
_DUCK_PCOS = "list_dot_product(a.p, b.p) / (a.norm * b.norm)"


@query(
    "sim_topk_projected",
    oracle=f"""
    WITH pr AS (SELECT vec_id, {_RP_DUCK_LIST} AS p FROM embeddings),
    n AS (SELECT vec_id, p, sqrt(list_dot_product(p, p)) AS norm FROM pr)
    SELECT query_id, neighbor_id, rank, round(cosine, 4) AS cosine
    FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_DUCK_PCOS} AS cosine,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY {_DUCK_PCOS} DESC, b.vec_id) AS rank
      FROM n a JOIN n b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    )
    WHERE rank <= {TOP_K}
    """,
)
def sim_topk_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-k in the Johnson-Lindenstrauss projected space: the
    composition that makes sim_random_projection load-bearing — project
    64-d vectors to 16-d row-locally, then run the brute-force kernel
    on the short vectors (4x less arithmetic and broadcast bytes per
    comparison; at billion-vector scale this is the standard trick to
    shrink ANN candidate-scoring cost). Recall vs sim_topk_bruteforce
    is data-dependent: on THESE near-isotropic synthetic embeddings the
    exact top-10 cosine margins are smaller than the JL distortion, so
    overlap is low (measured ~0.2 recall@10 at sf0.01; 32 dims buys
    ~0.26) — on real clustered embeddings the distortion bound applies
    to meaningful margins. The oracle proves transform + kernel
    exactness, not retrieval quality.

    Same shape as sim_topk_bruteforce: tiny query set broadcast, one
    window top-k per query — the projection adds NO shuffle.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_RP_SPARK_PROJ).alias("p")
    )
    emb = emb.withColumn(
        "norm",
        F.sqrt(
            F.expr(
                "aggregate(zip_with(p, p, (x, y) -> x * y), 0.0d,"
                " (acc, x) -> acc + x)"
            )
        ),
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("p").alias("qp"),
        F.col("norm").alias("qnorm"),
    )
    cand = emb.select(F.col("vec_id").alias("neighbor_id"), "p", "norm")
    dot = F.expr(
        "aggregate(zip_with(qp, p, (x, y) -> x * y), 0.0d,"
        " (acc, x) -> acc + x)"
    )
    cos = (dot / (F.col("qnorm") * F.col("norm"))).alias("cosine_raw")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_raw").desc(), F.col("neighbor_id")
    )
    return (
        cand.join(
            F.broadcast(queries), F.col("neighbor_id") != F.col("query_id")
        )
        .select("query_id", "neighbor_id", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("cosine_raw", 4).alias("cosine"),
        )
    )


# --- Product quantization (PQ) + asymmetric distance computation (ADC) ----
# The billion-vector ANN memory story: each vector is compressed to M
# sub-space codes (here 4 codes over 16-dim sub-vectors, codebook size 8),
# so the searchable index holds M small ints per vector instead of DIM
# floats; queries score candidates via a per-query distance TABLE (query →
# every centroid, M*K entries) and sum M table lookups per candidate
# (Jégou et al., "Product Quantization for Nearest Neighbor Search",
# TPAMI 2011 — public). Codebook = the first PQ_K corpus vectors
# (deterministic k-means-sample init), so both engines derive it from the
# data itself and every distance is a bit-identical sequential fold.

PQ_M = 4                 # sub-spaces
PQ_SUB = DIM // PQ_M     # dims per sub-space (16)
PQ_K = 8                 # centroids per sub-space


def _pq_dist_expr(vcol: str, ccol: str, s: int) -> str:
    """Squared L2 between the s-th sub-vectors of two double arrays, as a
    left-associated JVM fold (bit-identical to the oracle's list_sum)."""
    off = s * PQ_SUB + 1
    return (
        f"aggregate(zip_with(slice({vcol}, {off}, {PQ_SUB}),"
        f" slice({ccol}, {off}, {PQ_SUB}),"
        " (x, y) -> (x - y) * (x - y)), 0.0d, (acc, x) -> acc + x)"
    )


def _pq_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )


def _pq_codebook(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("code"), F.col("v").alias("cv")
    )


def _pq_packed_codebook(emb: DataFrame) -> DataFrame:
    """The PQ_K codebook vectors folded into ONE broadcastable row —
    the same packed-metadata trick as _centroids_packed."""
    return _pq_codebook(emb).agg(
        F.collect_list(F.struct("code", "cv")).alias("cbs")
    )


def _pq_assignments(emb: DataFrame) -> DataFrame:
    """(vec_id, subspace, code, qerr): nearest centroid per sub-space.

    ROW-LOCAL (r15): the codebook is PQ_K rows of index metadata, so it
    packs into one broadcast row and each vector ranks all PQ_K
    centroids per sub-space inside its own row — ZERO shuffles, where
    the old form exploded PQ_K * PQ_M distance rows per vector and ran
    an argmin window keyed (vec_id, subspace) (a corpus-id exchange at
    100 TB; 64k windowed rows and one exchange at sf0.1). The
    array_sort on struct(qerr, code) is lexicographic — exactly the old
    window's ORDER BY qerr, code — and the qerr doubles come from the
    identical _pq_dist_expr fold, so the selected codes and errors are
    bit-identical (oracle-verified)."""
    picks = ", ".join(
        f"named_struct('subspace', {s}, 'pick', element_at(array_sort("
        f"transform(cbs, c -> struct({_pq_dist_expr('v', 'c.cv', s)}"
        f" AS qerr, c.code AS code))), 1))"
        for s in range(PQ_M)
    )
    return (
        emb.crossJoin(F.broadcast(_pq_packed_codebook(emb)))
        .select("vec_id", F.explode(F.expr(f"array({picks})")).alias("sp"))
        .select(
            "vec_id",
            F.col("sp.subspace").alias("subspace"),
            F.col("sp.pick.code").alias("code"),
            F.col("sp.pick.qerr").alias("qerr"),
        )
    )


def _pq_codes_wide(emb: DataFrame) -> DataFrame:
    """(vec_id, c0..c{PQ_M-1}): every sub-space's assigned code in one
    row, computed ROW-LOCALLY against the packed codebook — replaces
    the explode + groupBy(vec_id) pivot the search paths ran over
    _pq_assignments (one corpus-keyed exchange each) with a zero-shuffle
    projection. Code values equal _pq_assignments' (same argmin, same
    tie-break)."""
    cols = [
        F.expr(
            f"element_at(array_sort(transform(cbs, c -> "
            f"struct({_pq_dist_expr('v', 'c.cv', s)} AS qerr,"
            f" c.code AS code))), 1).code"
        ).alias(f"c{s}")
        for s in range(PQ_M)
    ]
    return emb.crossJoin(F.broadcast(_pq_packed_codebook(emb))).select(
        "vec_id", *cols
    )


_DUCK_PQ_CTES = f"""
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (SELECT vec_id AS code, embedding::DOUBLE[] AS cv
           FROM embeddings WHERE vec_id < {PQ_K}),
    pqd AS (
      SELECT e.vec_id, s.s AS subspace, cb.code,
             list_sum(list_transform(range(1, {PQ_SUB + 1}), i ->
               (e.v[s.s * {PQ_SUB} + i] - cb.cv[s.s * {PQ_SUB} + i])
               * (e.v[s.s * {PQ_SUB} + i] - cb.cv[s.s * {PQ_SUB} + i])))
               AS qerr
      FROM e, (SELECT unnest(range({PQ_M})) AS s) s, cb
    ),
    pqa AS (
      SELECT vec_id, subspace, code, qerr FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
                                     ORDER BY qerr, code) AS rn
        FROM pqd
      ) WHERE rn = 1
    )"""


@query(
    "sim_pq_encode",
    oracle=f"""
    WITH {_DUCK_PQ_CTES}
    SELECT vec_id, subspace, code, round(qerr, 4) AS qerr FROM pqa
    """,
)
def sim_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ index build: compress every vector to PQ_M nearest-centroid
    codes (+ per-sub-space quantization error). See module PQ comment for
    the scale argument; the oracle recomputes the identical assignment
    relationally."""
    emb = _pq_emb(spark, sf_dir)
    a = _pq_assignments(emb)
    return a.select(
        "vec_id", "subspace", "code", F.round("qerr", 4).alias("qerr")
    )


@query(
    "sim_pq_search",
    oracle=f"""
    WITH {_DUCK_PQ_CTES},
    wide AS (
      SELECT vec_id,
             max(CASE WHEN subspace = 0 THEN code END) AS c0,
             max(CASE WHEN subspace = 1 THEN code END) AS c1,
             max(CASE WHEN subspace = 2 THEN code END) AS c2,
             max(CASE WHEN subspace = 3 THEN code END) AS c3
      FROM pqa GROUP BY vec_id
    ),
    qd AS (SELECT * FROM pqd WHERE vec_id < {N_QUERIES})
    SELECT query_id, neighbor_id, rank, round(adc, 4) AS adc_dist
    FROM (
      SELECT q0.vec_id AS query_id, w.vec_id AS neighbor_id,
             q0.qerr + q1.qerr + q2.qerr + q3.qerr AS adc,
             row_number() OVER (
               PARTITION BY q0.vec_id
               ORDER BY q0.qerr + q1.qerr + q2.qerr + q3.qerr, w.vec_id
             ) AS rank
      FROM wide w
      JOIN qd q0 ON q0.subspace = 0 AND q0.code = w.c0
      JOIN qd q1 ON q1.subspace = 1 AND q1.code = w.c1
                AND q1.vec_id = q0.vec_id
      JOIN qd q2 ON q2.subspace = 2 AND q2.code = w.c2
                AND q2.vec_id = q0.vec_id
      JOIN qd q3 ON q3.subspace = 3 AND q3.code = w.c3
                AND q3.vec_id = q0.vec_id
      WHERE w.vec_id <> q0.vec_id
    )
    WHERE rank <= {TOP_K}
    """,
)
def sim_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k: approximate L2 of query→candidate as the sum of the M
    table lookups dist(query sub-vector, candidate's assigned centroid).

    Scale shape: the distance table (N_QUERIES * PQ_M * PQ_K rows) and
    the query list are broadcast; candidates carry only their M codes, so
    the scored relation is |corpus| * N_QUERIES rows of pure column
    arithmetic with NO vector math — the whole point of PQ. The adc sum
    is written d0+d1+d2+d3 (left-associated) on both engines so the
    doubles are bit-identical."""
    # emb feeds the code build, the query list, AND the codebook — pin
    # it so the embedding load runs once (was 11 repeated scans).
    # Full-embedding-table sized: DISK_ONLY persist keeps lineage
    # (recoverable on executor loss) — see SCALE.md.
    emb = _pq_emb(spark, sf_dir).transform(pin_disk)
    # row-local wide codes (r15): no explode + groupBy(vec_id) pivot —
    # see _pq_codes_wide
    wide = _pq_codes_wide(emb)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    structs = ", ".join(
        f"struct({s} as subspace, {_pq_dist_expr('qv', 'cv', s)} as qdist)"
        for s in range(PQ_M)
    )
    # The whole distance table packs to one |queries|-row broadcast
    # (PQ_M x PQ_K doubles per query at position subspace*PQ_K + code),
    # so ADC is a map-side array lookup per candidate — one broadcast
    # join where the per-subspace formulation scheduled 4 sequential
    # broadcast materializations (r10 A/B on the rerank twin: 4.9 s ->
    # 3.4 s warm). qdist values and the d0+d1+d2+d3 association are
    # unchanged, so the doubles stay bit-identical to the oracle.
    dpacked = (
        queries.crossJoin(F.broadcast(_pq_codebook(emb)))
        .select(
            "query_id",
            F.explode(F.expr(f"array({structs})")).alias("sd"),
            "code",
        )
        .groupBy("query_id")
        .agg(
            F.expr(
                f"transform(array_sort(collect_list(struct("
                f"sd.subspace * {PQ_K} + code AS pos, sd.qdist AS qd))),"
                f" s -> s.qd)"
            ).alias("dt")
        )
    )
    res = wide.crossJoin(F.broadcast(dpacked))
    for s in range(PQ_M):
        res = res.withColumn(
            f"d{s}",
            F.expr(f"element_at(dt, cast({s} * {PQ_K} + c{s} + 1 as int))"),
        )
    adc = (
        ((F.col("d0") + F.col("d1")) + F.col("d2")) + F.col("d3")
    ).alias("adc_raw")
    w = Window.partitionBy("query_id").orderBy(F.col("adc_raw"), F.col("vec_id"))
    return (
        res.filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), adc, F.col("vec_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("adc_raw", 4).alias("adc_dist"),
        )
    )


# Recall evaluation: the ANN operators are useless at 100 TB unless their
# quality is measured continuously — this promotes the eval harness itself
# to an oracle-checked operator. The oracle composes the two existing
# oracles as CTEs, so the SQL proves the same recall the Spark side
# reports.
from eeecs485_p4_mapreduce_spark.registry import ORACLES as _ORACLES  # noqa: E402


@query(
    "sim_ann_recall",
    oracle=f"""
    WITH bf AS ({_ORACLES["sim_topk_bruteforce"]}),
    ann AS ({_ORACLES["sim_ann_lsh"]}),
    hits AS (
      SELECT bf.query_id,
             count(*) AS n_bruteforce,
             count(a.neighbor_id) AS n_overlap
      FROM bf LEFT JOIN ann a
        ON bf.query_id = a.query_id AND bf.neighbor_id = a.neighbor_id
      GROUP BY 1
    ),
    annc AS (SELECT query_id, count(*) AS n_ann FROM ann GROUP BY 1)
    SELECT h.query_id, h.n_bruteforce,
           coalesce(annc.n_ann, 0) AS n_ann,
           h.n_overlap,
           round(CAST(h.n_overlap AS DOUBLE)
                 / CAST(h.n_bruteforce AS DOUBLE), 4) AS recall
    FROM hits h LEFT JOIN annc USING (query_id)
    """,
)
def sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@k of the LSH ANN path against the exact
    brute-force top-k — the index-quality metric a production pipeline
    tracks per corpus snapshot. Scale: both sides are per-query top-k
    tables (N_QUERIES * TOP_K rows), so the comparison is driver-trivial
    regardless of corpus size; the cost is the two searches themselves,
    and the brute-force side would run over a fixed eval sample, not the
    full corpus."""
    bf = sim_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    ann = (
        sim_ann_lsh(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
        # N_QUERIES x TOP_K rows; feeds the overlap join AND the count —
        # pinned (persist, not checkpoint — r15, zero build-time jobs)
        # so the ANN search executes once
        .transform(pin_disk)
    )
    hits = (
        bf.join(ann, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_bruteforce"),
            F.count("hit").alias("n_overlap"),
        )
    )
    annc = ann.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_ann"))
    return (
        hits.join(annc, "query_id", "left")
        .select(
            "query_id",
            "n_bruteforce",
            F.coalesce("n_ann", F.lit(0)).alias("n_ann"),
            "n_overlap",
            F.round(
                F.col("n_overlap").cast("double")
                / F.col("n_bruteforce").cast("double"),
                4,
            ).alias("recall"),
        )
    )


@query(
    "sim_label_centroids",
    oracle=f"""
    SELECT label, i,
           round(sum(x) / count(*), 5) + 0.0 AS mean_x,
           count(*) AS n_vecs
    FROM (
      SELECT label, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    )
    GROUP BY 1, 2
    """,
)
def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (class prototypes / cluster centroid
    refinement — the M-step of k-means and the pooling step behind
    label-conditioned retrieval), in long (label, dim, mean) form.

    Scale: the explode fans out d rows per vector but the avg collapses
    map-side (partial sums per (label, i)), so the one shuffle carries at
    most |labels| * d rows per task regardless of corpus size. Division
    is written sum/count identically on both engines so the doubles are
    bit-identical; + 0.0 collapses IEEE -0.0."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        F.posexplode(F.expr("transform(embedding, x -> cast(x as double))")).alias(
            "i0", "x"
        ),
    ).select("label", (F.col("i0") + 1).alias("i"), "x")
    return ex.groupBy("label", "i").agg(
        (F.round(F.sum("x") / F.count(F.lit(1)), 5) + F.lit(0.0)).alias(
            "mean_x"
        ),
        F.count(F.lit(1)).alias("n_vecs"),
    )


@query(
    "sim_kmeans_step",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (SELECT vec_id AS cluster, embedding::DOUBLE[] AS cv
           FROM embeddings WHERE vec_id < {PQ_K}),
    d AS (
      SELECT e.vec_id, e.v, cb.cluster,
             list_sum(list_transform(range(1, {DIM + 1}), i ->
               (e.v[i] - cb.cv[i]) * (e.v[i] - cb.cv[i]))) AS dist
      FROM e, cb
    ),
    assigned AS (
      SELECT vec_id, v, cluster FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cluster) AS rn
        FROM d
      ) WHERE rn = 1
    )
    SELECT cluster, i,
           round(sum(x) / count(*), 5) + 0.0 AS mean_x,
           count(*) AS n_members
    FROM (
      SELECT cluster, generate_subscripts(v, 1) AS i, unnest(v) AS x
      FROM assigned
    )
    GROUP BY 1, 2
    """,
)
def sim_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of distributed k-means over the embedding
    corpus: E-step assigns every vector to its nearest of the PQ_K
    deterministic sample-init centroids (full-dimension L2, broadcast
    centroids, argmin window per vector); M-step emits the re-centered
    means in long (cluster, dim, mean) form. Iterating = feeding the
    output back as the next codebook; one step is the oracle-checkable
    unit because the loop is just this plan repeated.

    Scale: centroids broadcast (k rows), assignment is map-side k
    distance folds per vector + a per-vector argmin, and the M-step's
    explode collapses map-side — the shuffle carries at most k*d partial
    sums per task. This is exactly how MLlib's k-means schedules Lloyd
    steps."""
    emb = _pq_emb(spark, sf_dir)
    cb = emb.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("cluster"), F.col("v").alias("cv")
    )
    dist = F.expr(
        "aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), 0.0d,"
        " (acc, x) -> acc + x)"
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cluster")
    assigned = (
        emb.crossJoin(F.broadcast(cb))
        .select("vec_id", "v", "cluster", dist.alias("dist"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    ex = assigned.select(
        "cluster", F.posexplode("v").alias("i0", "x")
    ).select("cluster", (F.col("i0") + 1).alias("i"), "x")
    return ex.groupBy("cluster", "i").agg(
        (F.round(F.sum("x") / F.count(F.lit(1)), 5) + F.lit(0.0)).alias(
            "mean_x"
        ),
        F.count(F.lit(1)).alias("n_members"),
    )


@query(
    "sim_cluster_quality",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    c AS (
      SELECT label, i, round(sum(x) / count(*), 5) + 0.0 AS m
      FROM ex GROUP BY 1, 2
    ),
    d AS (
      SELECT e.vec_id, e.label AS vlabel, c.label AS clabel,
             sum((e.x - c.m) * (e.x - c.m)) AS d2
      FROM ex e JOIN c ON e.i = c.i
      GROUP BY 1, 2, 3
    ),
    ab AS (
      SELECT vec_id, vlabel,
             min(CASE WHEN clabel = vlabel THEN d2 END) AS a,
             min(CASE WHEN clabel <> vlabel THEN d2 END) AS b
      FROM d GROUP BY 1, 2
    )
    SELECT vlabel AS label, count(*) AS n_vecs,
           round(avg(CASE WHEN greatest(a, b) = 0 THEN 0.0
                          ELSE (b - a) / greatest(a, b) END), 5) + 0.0
             AS avg_silhouette,
           round(avg(a), 5) + 0.0 AS avg_intra_d2,
           round(avg(b), 5) + 0.0 AS avg_nearest_other_d2
    FROM ab GROUP BY 1
    """,
)
def sim_cluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-based silhouette per label cluster — the clustering
    quality gate a pipeline runs after (re)assigning clusters: a = L2²
    to the own-label centroid, b = L2² to the nearest OTHER centroid,
    silhouette = (b-a)/max(a,b) averaged per label. Centroid components
    are rounded to 5 places BEFORE distances on both engines so all
    downstream doubles are bit-identical.

    Scale: centroids reduce map-side (label-domain * d rows); the
    distance join fans each vector's d dims across |labels| centroids —
    a broadcastable centroid table and partial-agg collapse keep the
    one shuffle keyed on (vec, centroid). No pairwise vector math
    anywhere (true silhouette is O(n²); the centroid form is the
    standard scalable proxy)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode(
            F.expr("transform(embedding, x -> cast(x as double))")
        ).alias("i0", "x"),
    ).select("vec_id", "label", (F.col("i0") + 1).alias("i"), "x")
    c = ex.groupBy(F.col("label").alias("clabel"), "i").agg(
        (F.round(F.sum("x") / F.count(F.lit(1)), 5) + F.lit(0.0)).alias("m")
    )
    d = (
        ex.join(F.broadcast(c), "i")
        .groupBy("vec_id", F.col("label").alias("vlabel"), "clabel")
        .agg(F.sum((F.col("x") - F.col("m")) * (F.col("x") - F.col("m"))).alias("d2"))
    )
    ab = d.groupBy("vec_id", "vlabel").agg(
        F.min(F.when(F.col("clabel") == F.col("vlabel"), F.col("d2"))).alias("a"),
        F.min(F.when(F.col("clabel") != F.col("vlabel"), F.col("d2"))).alias("b"),
    )
    sil = F.when(F.greatest("a", "b") == 0, F.lit(0.0)).otherwise(
        (F.col("b") - F.col("a")) / F.greatest("a", "b")
    )
    return ab.groupBy(F.col("vlabel").alias("label")).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (F.round(F.avg(sil), 5) + F.lit(0.0)).alias("avg_silhouette"),
        (F.round(F.avg("a"), 5) + F.lit(0.0)).alias("avg_intra_d2"),
        (F.round(F.avg("b"), 5) + F.lit(0.0)).alias("avg_nearest_other_d2"),
    )


@query(
    "sim_ivf_recall",
    oracle=f"""
    WITH bf AS ({_ORACLES["sim_topk_bruteforce"]}),
    ann AS ({_ORACLES["sim_ivf_search"]}),
    hits AS (
      SELECT bf.query_id,
             count(*) AS n_bruteforce,
             count(a.neighbor_id) AS n_overlap
      FROM bf LEFT JOIN ann a
        ON bf.query_id = a.query_id AND bf.neighbor_id = a.neighbor_id
      GROUP BY 1
    ),
    annc AS (SELECT query_id, count(*) AS n_ann FROM ann GROUP BY 1)
    SELECT h.query_id, h.n_bruteforce,
           coalesce(annc.n_ann, 0) AS n_ann,
           h.n_overlap,
           round(CAST(h.n_overlap AS DOUBLE)
                 / CAST(h.n_bruteforce AS DOUBLE), 4) AS recall
    FROM hits h LEFT JOIN annc USING (query_id)
    """,
)
def sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the nprobe IVF path against exact brute force — the
    IVF twin of sim_ann_recall, so BOTH index families carry a graded
    quality metric (at scale you tune nprobe/bucket width against
    exactly this number)."""
    bf = sim_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    ann = (
        sim_ivf_search(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
        # same pin as sim_ann_recall: one IVF search, not two
        .transform(pin_disk)
    )
    hits = (
        bf.join(ann, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_bruteforce"),
            F.count("hit").alias("n_overlap"),
        )
    )
    annc = ann.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_ann"))
    return (
        hits.join(annc, "query_id", "left")
        .select(
            "query_id",
            "n_bruteforce",
            F.coalesce("n_ann", F.lit(0)).alias("n_ann"),
            "n_overlap",
            F.round(
                F.col("n_overlap").cast("double")
                / F.col("n_bruteforce").cast("double"),
                4,
            ).alias("recall"),
        )
    )


K_JOIN = 3  # neighbors kept per query in the knn JOIN


@query(
    "sim_knn_join",
    oracle=f"""
    SELECT query_id, neighbor_id, rank, round(cosine, 4) AS cosine
    FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_DUCK_COS} AS cosine,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY {_DUCK_COS} DESC, b.vec_id) AS rank
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND b.vec_id % 10 <> 0
      WHERE a.vec_id % 10 = 0
    )
    WHERE rank <= {K_JOIN}
    """,
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN JOIN between two LARGE vector sets — every 10th vector (a
    "new batch" snapshot) against the rest of the corpus, top-{k} by
    cosine within the query's IVF cell. Unlike sim_topk_bruteforce /
    sim_ivf_label, neither side NEEDS broadcasting: the join is keyed on
    the cell label, so at scale both sides shuffle once and meet in a
    co-partitioned join (at test scale Catalyst broadcasts the tiny
    query side instead — the optimizer's correct call under the 64 MB
    threshold, and exactly what stops applying at snapshot scale), then
    the per-query top-k is a window over in-cell candidates only. This
    is the shape
    for joining two billion-vector snapshots (dedup across crawls,
    nearest-neighbor labeling of a new batch) where the query set is
    itself too big to broadcast; the cell count (here the precomputed
    10-cluster label; nlist ~ sqrt(N) in a real IVF build) is what keeps
    per-task candidate sets bounded, and in-cell probing is the standard
    IVF recall trade, measured for this corpus by sim_ivf_recall.
    Scale caveat, measured: with the cell count held FIXED while both
    snapshots grow (the replica probe's shape — it can't re-cluster),
    in-cell pairs grow quadratically (x10 ratio 4.3; x100 is
    prohibitive), which is exactly why production IVF re-builds nlist ~
    sqrt(N) as the corpus grows; the probe exempts this query with that
    rationale rather than pretending fixed-nlist kNN-join scales.
    Cosine is the module's JVM array-fold kernel — bit-identical to
    DuckDB's sequential list_dot_product, so even the float column
    hash-matches."""
    emb = _emb_with_norm(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("label").alias("qlabel"),
    )
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    dot = F.expr(
        "aggregate(zip_with(qv, v, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x)"
    )
    cos = (dot / (F.col("qnorm") * F.col("norm"))).alias("cosine_raw")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_raw").desc(), F.col("vec_id")
    )
    return (
        corpus.join(queries, F.col("label") == F.col("qlabel"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos, "vec_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K_JOIN)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("cosine_raw", 4).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# HNSW-style layered ANN graph (Malkov & Yashunin 2016), re-expressed as a
# BATCH Spark construction: the paper's sequential insert loop doesn't
# distribute, so each layer's adjacency is built as a bucketed kNN-graph
# instead (the standard batch formulation — an NN-descent-style one-shot
# kNN graph per layer). Layer membership is the paper's geometric level
# rule made deterministic: level(v) counts factors of 4 in a md5-derived
# 32-bit hash (P[level >= l] = 4^-l). Candidate generation per layer
# reuses the module's random-hyperplane LSH with a PREFIX of the planes —
# 6-2l planes at level l, so expected bucket occupancy is constant across
# layers (N/4^l nodes over 4^(3-l) buckets); at billion-vector scale the
# plane count grows with log4(N) to keep buckets bounded, exactly like
# N_PLANES for the flat LSH index. Each node keeps its top-M neighbors
# among MULTIPROBE candidates (own bucket + every Hamming-1 bucket, the
# sim_ann_multiprobe trick): probing neighbors is what gives the graph
# cross-bucket edges — with exact-bucket candidates only, every layer is
# partitioned by bucket and greedy search can never leave the entry
# point's hyperplane cell (measured recall@5 = 0.04, the flat-LSH
# baseline; multiprobe + beam takes it to 0.96 at sf0.01 / 0.64 at
# sf0.1 — re-measured 2026-08-14 with the registered M=16/EF=32/6-hop
# configuration; the test floor is 0.6). One bucket-keyed shuffle per
# layer (probe keys fan the left
# side out x(planes+1)), no all-pairs anywhere.
# ---------------------------------------------------------------------------
HNSW_M = 16  # out-degree per node per layer
HNSW_MAX_LEVEL = 3
HNSW_EF = 32  # beam width at layer 0
HNSW_HOPS0 = 6  # bounded greedy hops at layer 0
HNSW_KEEP_UPPER = 4  # beam width during the layer 3→1 descent
HNSW_K = 5  # final neighbors returned per query

_DUCK_H32 = (
    "CAST(CAST(concat('0x', substr(md5(CAST({col} AS VARCHAR)), 1, 8))"
    " AS UBIGINT) AS BIGINT)"
)


def _duck_level(col: str) -> str:
    h = _DUCK_H32.format(col=col)
    return (
        f"(CASE WHEN {h} % 4 = 0 THEN 1 ELSE 0 END"
        f" + CASE WHEN {h} % 16 = 0 THEN 1 ELSE 0 END"
        f" + CASE WHEN {h} % 64 = 0 THEN 1 ELSE 0 END)"
    )


def _spark_level_expr() -> str:
    return _spark_level_expr_for("vec_id")


def _spark_level_expr_for(id_expr: str) -> str:
    """Level rule over an arbitrary id expression — the registered
    queries pass ``vec_id``; the scaled-planes probe passes the
    shard-local id so every replica shard reproduces the base level
    distribution exactly (any stable id works for the geometric rule;
    shard-local ids make the probe per-shard-faithful and therefore
    testable 1:1 against the production build)."""
    h = (
        f"cast(conv(substring(md5(cast({id_expr} as string)), 1, 8),"
        " 16, 10) as bigint)"
    )
    return (
        f"(cast(({h}) % 4 = 0 as int) + cast(({h}) % 16 = 0 as int)"
        f" + cast(({h}) % 64 = 0 as int))"
    )


def _duck_cos_v(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}.v, {b}.v)"
        f" / (sqrt(list_dot_product({a}.v, {a}.v))"
        f"    * sqrt(list_dot_product({b}.v, {b}.v)))"
    )


def _duck_hnsw_prefix() -> str:
    """Shared CTE chain: per-node layer buckets + levels + layered edges."""
    b_cols = []
    for lvl in range(HNSW_MAX_LEVEL):
        planes = N_PLANES - 2 * lvl
        b_cols.append(
            f"""CAST(sum(CASE WHEN j.j < {planes} AND
               list_sum(list_transform(range(1, {DIM + 1}),
                 i -> (CASE WHEN {_DUCK_SIGN} = 1 THEN 1.0 ELSE -1.0 END)
                      * (e.embedding::DOUBLE[])[i])) > 0.0
             THEN (CAST(1 AS BIGINT) << j.j) ELSE 0 END) AS BIGINT) AS b{lvl}"""
        )
    per_level = []
    cos = _duck_cos_v("a", "b")
    for lvl in range(HNSW_MAX_LEVEL + 1):
        planes = max(0, N_PLANES - 2 * lvl)
        probes = ", ".join(
            [f"a.b{lvl}"]
            + [f"xor(a.b{lvl}, {1 << j})" for j in range(planes)]
        )
        per_level.append(
            f"""SELECT {lvl} AS level, src, dst, rank, cosine FROM (
      SELECT a.vec_id AS src, b.vec_id AS dst, {cos} AS cosine,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY {cos} DESC, b.vec_id) AS rank
      FROM hnsw_lv a JOIN hnsw_lv b
        ON b.b{lvl} IN ({probes}) AND a.vec_id <> b.vec_id
      WHERE a.lvl >= {lvl} AND b.lvl >= {lvl}
    ) WHERE rank <= {HNSW_M}"""
        )
    union = "\n    UNION ALL\n    ".join(per_level)
    return f"""hnsw_nodes AS MATERIALIZED (
      SELECT e.vec_id,
             any_value(e.embedding::DOUBLE[]) AS v,
             {", ".join(b_cols)}
      FROM embeddings e, (SELECT unnest(range({N_PLANES})) AS j) j
      GROUP BY e.vec_id
    ),
    hnsw_lv AS MATERIALIZED (
      SELECT vec_id, v, {", ".join(f"b{i}" for i in range(HNSW_MAX_LEVEL))},
             CAST(0 AS BIGINT) AS b{HNSW_MAX_LEVEL},
             {_duck_level("vec_id")} AS lvl
      FROM hnsw_nodes
    ),
    hnsw_edges AS MATERIALIZED (
    {union}
    )"""


def _duck_hnsw_search_sql() -> str:
    """Greedy descent + bounded beam, as an explicit CTE chain mirroring
    the Spark loop step for step (fixed iteration counts make the
    data-dependent convergence loop SQL-expressible)."""
    cos_qn = _duck_cos_v("qe", "ne")
    steps = []
    state = "hnsw_s3"
    steps.append(
        f"""hnsw_q AS (SELECT vec_id AS query_id FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    hnsw_ml AS (SELECT max(lvl) AS ml FROM hnsw_lv),
    hnsw_entry AS (SELECT min(vec_id) AS node FROM hnsw_lv, hnsw_ml
                   WHERE lvl = ml),
    {state} AS (SELECT q.query_id, hnsw_entry.node FROM hnsw_q q, hnsw_entry)"""
    )

    def hop(prev: str, cand: str, nxt: str, level: int, keep: int) -> str:
        return f"""{cand} AS MATERIALIZED (
      SELECT query_id, node FROM {prev}
      UNION
      SELECT s.query_id, e.dst AS node
      FROM {prev} s JOIN hnsw_edges e ON e.level = {level} AND e.src = s.node
    ),
    {nxt} AS MATERIALIZED (
      SELECT query_id, node FROM (
        SELECT c.query_id, c.node,
               row_number() OVER (PARTITION BY c.query_id
                                  ORDER BY {cos_qn} DESC, c.node) AS rn
        FROM {cand} c
        JOIN hnsw_lv qe ON qe.vec_id = c.query_id
        JOIN hnsw_lv ne ON ne.vec_id = c.node
      ) WHERE rn <= {keep}
    )"""

    for lvl in range(HNSW_MAX_LEVEL, 0, -1):
        nxt = f"hnsw_s{lvl - 1}"
        steps.append(hop(state, f"hnsw_c{lvl}", nxt, lvl, HNSW_KEEP_UPPER))
        state = nxt
    for h in range(1, HNSW_HOPS0 + 1):
        nxt = f"hnsw_h{h}"
        steps.append(hop(state, f"hnsw_hc{h}", nxt, 0, HNSW_EF))
        state = nxt
    return f"""WITH {_duck_hnsw_prefix()},
    {",".join(steps)}
    SELECT query_id, neighbor_id, rank, round(cosine, 4) AS cosine FROM (
      SELECT c.query_id, c.node AS neighbor_id, {cos_qn} AS cosine,
             row_number() OVER (PARTITION BY c.query_id
                                ORDER BY {cos_qn} DESC, c.node) AS rank
      FROM {state} c
      JOIN hnsw_lv qe ON qe.vec_id = c.query_id
      JOIN hnsw_lv ne ON ne.vec_id = c.node
      WHERE c.node <> c.query_id
    ) WHERE rank <= {HNSW_K}"""


def _hnsw_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v, norm, lvl, b0..b3): layer level + per-layer prefix
    LSH buckets, all md5-deterministic compile-time constants. The
    projection is ~12 interpreted 64-dim lambda folds per row (4 bucket
    prefixes + level + norm); _emb_with_norm already spreads an
    under-split source to core width (r09 A/B: 1.9 s -> 0.2 s on the
    node checkpoint), so no extra repartition is needed here."""
    emb = _emb_with_norm(spark, sf_dir)
    # b0 carries all N_PLANES sign bits; the coarser upper-layer PREFIX
    # buckets are exactly its low (N_PLANES - 2*lvl) bits, so derive
    # them with a mask instead of re-evaluating the plane projections —
    # one 6x64-term projection per row instead of three (6+4+2 planes),
    # and a third of the codegen source to compile.
    base = emb.select(
        F.col("vec_id"),
        F.col("v"),
        F.col("norm"),
        F.expr(_spark_level_expr()).alias("lvl"),
        F.expr(_spark_bucket_expr(N_PLANES)).alias("b0"),
    )
    cols = [F.col("vec_id"), F.col("v"), F.col("norm"), F.col("lvl"), F.col("b0")]
    for lvl in range(1, HNSW_MAX_LEVEL):
        mask = (1 << max(0, N_PLANES - 2 * lvl)) - 1
        cols.append(F.col("b0").bitwiseAND(F.lit(mask)).alias(f"b{lvl}"))
    cols.append(F.lit(0).cast("bigint").alias(f"b{HNSW_MAX_LEVEL}"))
    return base.select(*cols)


_HNSW_DOT = (
    "aggregate(zip_with(qv, v, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x)"
)


@query(
    "sim_hnsw_build",
    oracle=f"""
    WITH {_duck_hnsw_prefix()}
    SELECT level, src, dst, rank, round(cosine, 4) AS cosine
    FROM hnsw_edges
    """,
)
def sim_hnsw_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layered HNSW adjacency: per layer l, nodes with level >= l keep
    their top-{HNSW_M} cosine neighbors among multiprobe candidates —
    their own prefix-LSH bucket plus every bucket one plane-flip away
    (the probe fan-out is what gives the graph cross-bucket edges; see
    the section comment for the measured recall cliff without it). The
    probe side explodes into planes+1 bucket keys and the self-join is
    keyed on (probe bucket = candidate bucket) — one equi-join shuffle
    per layer; layer populations shrink 4x per level so the union is
    dominated by layer 0. The top layer's single bucket is an equi-join
    on a constant key over the ~N/64 top-layer survivors, not a
    CartesianProduct."""
    nodes = _hnsw_nodes(spark, sf_dir).localCheckpoint(eager=False)
    return _hnsw_edges_from(nodes)


def _hnsw_edges_from(nodes: DataFrame) -> DataFrame:
    """Layered edge build over an (ideally checkpointed) node table —
    shared by sim_hnsw_build and sim_hnsw_search so the bucket/level
    projection (4 inlined 64-dim sign folds per row) is computed ONCE.

    All four layers run through ONE self-join keyed on (level, bucket)
    instead of four unioned per-level joins: each node explodes into a
    (level, probe-bucket) row per layer it belongs to (probe side: own
    bucket + every Hamming-1 bucket; candidate side: own bucket only),
    and the top-M ranking is one window over (level, src). Same pair
    set, same ranks — but 2 shuffles + 1 join + 1 window total where
    the per-level form scheduled 4 of each (r09 A/B: the unioned build
    materialized ~16 AQE stages for ~2 s of overhead on 42k edges;
    this form is ~4 stages). The explicit repartition width ahead of
    the window keeps the ~537k candidate pairs (~13 MB — under AQE's
    one-partition coalesce threshold) sorting on all cores."""
    a_structs = []
    b_structs = []
    for lvl in range(HNSW_MAX_LEVEL + 1):
        planes = max(0, N_PLANES - 2 * lvl)
        for pk in [f"b{lvl}"] + [
            f"b{lvl} ^ {1 << j}L" for j in range(planes)
        ]:
            a_structs.append(
                f"if(lvl >= {lvl},"
                f" named_struct('level', {lvl}, 'bkt', {pk}), null)"
            )
        b_structs.append(
            f"if(lvl >= {lvl},"
            f" named_struct('level', {lvl}, 'bkt', b{lvl}), null)"
        )

    def _side(structs: list[str]) -> str:
        arr = ", ".join(structs)
        return f"filter(array({arr}), x -> x is not null)"

    a = nodes.select(
        F.col("vec_id").alias("src"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.explode(F.expr(_side(a_structs))).alias("p"),
    ).select(
        "src",
        "qv",
        "qnorm",
        F.col("p.level").alias("al"),
        F.col("p.bkt").alias("ab"),
    )
    b = nodes.select(
        F.col("vec_id").alias("dst"),
        "v",
        "norm",
        F.explode(F.expr(_side(b_structs))).alias("p"),
    ).select(
        "dst",
        "v",
        "norm",
        F.col("p.level").alias("bl"),
        F.col("p.bkt").alias("bb"),
    )
    cos = (F.expr(_HNSW_DOT) / (F.col("qnorm") * F.col("norm"))).alias(
        "cos_raw"
    )
    # Top-M per (level, src) as ONE aggregation (r15, guide §2.3
    # "aggregate before you shuffle"): collect the (cos, dst) candidates
    # per group, sort with the same (cos desc, dst asc) comparator the
    # old row_number() window used, slice M. Replaces the explicit
    # core-width repartition + full partition sort (two AQE stages) with
    # a single partially-aggregated exchange; rank/tie-breaking are
    # bit-identical (doubles compare exactly; (src, dst) pairs are
    # unique per level since a candidate owns one bucket per layer).
    # Per-group state is bucket-population-bounded — the same bound the
    # window partition had (production scales plane count with log N,
    # see the sim_hnsw_scaledplanes probe).
    top_expr = f"""
        slice(array_sort(collect_list(struct(cos_raw, dst)),
                (x, y) -> CASE WHEN x.cos_raw > y.cos_raw THEN -1
                               WHEN x.cos_raw < y.cos_raw THEN 1
                               WHEN x.dst < y.dst THEN -1
                               WHEN x.dst > y.dst THEN 1
                               ELSE 0 END),
              1, {HNSW_M})"""
    return (
        a.join(
            b,
            (F.col("al") == F.col("bl"))
            & (F.col("ab") == F.col("bb"))
            & (F.col("src") != F.col("dst")),
        )
        .select(F.col("al").alias("level"), "src", "dst", cos)
        .groupBy("level", "src")
        .agg(F.expr(top_expr).alias("top"))
        .select("level", "src", F.posexplode("top").alias("i", "t"))
        .select(
            "level",
            "src",
            F.col("t.dst").alias("dst"),
            (F.col("i") + 1).alias("rank"),
            F.round("t.cos_raw", 4).alias("cosine"),
        )
    )


def sim_hnsw_scaledplanes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBE-ONLY variant of sim_hnsw_build running the PRODUCTION
    plane-count policy (planes ~ log4(N), the section comment's
    billion-vector rule) on the scale-probe replica corpus — never
    registered, never oracle-graded; it exists so the fixed-plane
    exemption on the HNSW family (SCALING.md) is a measurement, not a
    docstring, the same disposition dedup_semdedup_scaledk gave the
    fixed-k exemption.

    With the corpus replicated R-fold, log4(R) extra planes multiply
    the bucket count by ~R. The replica layout gives us that scaled
    index honestly: each shard (vec_id div REPLICA_KEY_OFFSET) is a
    key-shifted copy of the base corpus, so embedding the shard id
    ABOVE the base plane bits (bkt' = rep * 2^N_PLANES + bkt) yields
    exactly the bucket population the scaled index would have — every
    bucket holds the same nodes as the corresponding base-run bucket.
    Levels come from the shard-LOCAL id (vec_id % REPLICA_KEY_OFFSET)
    so the per-shard level distribution replicates the base run 1:1,
    making the probe per-shard-faithful and pytest-checkable. Hamming-1
    multiprobe flips only the low base-plane bits, so probes stay
    within a shard — the production simplification of probing only the
    nearest planes (flipping one of the log4(R) coarse planes would
    probe a far cell; real multiprobe orders flips by plane confidence
    and those rank last). Same single (level, bucket)-keyed shuffle as
    sim_hnsw_build, R*64 reducers instead of 64. On the base corpus
    (one shard, rep = 0) every bucket and level equals production's,
    so base-vs-replica is apples-to-apples."""
    from eeecs485_p4_mapreduce_spark.catalog import REPLICA_KEY_OFFSET

    emb = _emb_with_norm(spark, sf_dir)
    rep = f"int(vec_id div {REPLICA_KEY_OFFSET}L)"
    shard_id = f"(vec_id % {REPLICA_KEY_OFFSET}L)"
    base = emb.select(
        F.col("vec_id"),
        F.col("v"),
        F.col("norm"),
        F.expr(_spark_level_expr_for(shard_id)).alias("lvl"),
        F.expr(_spark_bucket_expr(N_PLANES)).alias("raw0"),
        F.expr(f"cast({rep} as bigint) * {1 << N_PLANES}L").alias("hi"),
    )
    cols = [
        F.col("vec_id"),
        F.col("v"),
        F.col("norm"),
        F.col("lvl"),
        (F.col("raw0") + F.col("hi")).alias("b0"),
    ]
    for lvl in range(1, HNSW_MAX_LEVEL):
        mask = (1 << max(0, N_PLANES - 2 * lvl)) - 1
        cols.append(
            (F.col("raw0").bitwiseAND(F.lit(mask)) + F.col("hi")).alias(
                f"b{lvl}"
            )
        )
    cols.append(F.col("hi").alias(f"b{HNSW_MAX_LEVEL}"))
    nodes = base.select(*cols).localCheckpoint(eager=False)
    return _hnsw_edges_from(nodes)


@query("sim_hnsw_search", oracle=_duck_hnsw_search_sql())
def sim_hnsw_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{HNSW_K} ANN via the layered graph: beam descent from the
    global entry point (one step per layer 3→1, keeping the best
    {HNSW_KEEP_UPPER}), then a {HNSW_HOPS0}-hop beam of width {HNSW_EF}
    on layer 0. The paper's
    while-better loop is replaced by FIXED hop counts so the whole search
    is a static dataflow (and SQL-expressible for the oracle).

    Measured residual floor (r10, sf0.1 warm): the UI stage audit shows
    the run is ~18 short AQE-materialized jobs — parquet scan, edge
    build + checkpoint, 4 distinct broadcast materializations (edges,
    queries, entry point; reuse already collapses the 9 hops' edge
    broadcasts to 1), then the fused hop pipeline — each with a
    0.1–0.3 s scheduling floor that dominates at bench scale (executor
    compute is milliseconds on 2k vectors). After the r10 cuts (HOF
    bucket folds, mask-derived prefix buckets, node checkpoint
    removed: 6.0 s -> 4.4 s warm) the remaining time IS that job-floor
    sum; at 100 TB the same floors are fixed-cost noise against
    minutes-long stages, and the structure (zero corpus shuffles
    during search, one edges broadcast or src-partitioned shuffle
    join) is the part that scales — the q74-style argument.

    The 9 hops run as ONE linear-lineage job, not 9 checkpoint-barrier
    jobs (the r08 census measured ~0.7 s of scheduling floor per
    barrier, 10.5 s total; this form is the same dataflow with the
    floors removed): the frontier is referenced exactly ONCE per hop —
    a left-join against the adjacency plus explode([self, neighbor])
    replaces the union-then-join shape — so lineage grows linearly and
    no per-hop pin is needed. Candidate vectors travel ON the edges
    (the co-located adjacency layout graph-ANN stores use), so search
    never rejoins the corpus table; query vectors are broadcast once
    and every hop reuses the exchange. The frontier is the provably
    tiny side at any corpus scale (≤ {HNSW_EF} rows/query), so the
    scale plan shuffle-joins it per hop against the src-partitioned
    adjacency checkpoint; when the adjacency itself fits a broadcast
    (size-checked, the same decision AQE makes from runtime stats) the
    hops become map-side joins that preserve the frontier's query_id
    partitioning and all 18 dedupe/beam windows run sort-only with no
    per-hop exchange at all. The corpus is never shuffled during
    search. Recall trade vs the flat-LSH path is measured the same way
    as sim_ann_recall (per-query overlap with sim_topk_bruteforce's
    exact top-k)."""
    # No node-table checkpoint here (unlike sim_hnsw_build): the edges
    # checkpoint below is the only materialization this query needs.
    # The downstream consumers prune the node projection to what they
    # use (queries/entry_v never evaluate the bucket columns), and the
    # zip_with bucket fold is cheap enough to recompute on the edge
    # build's two join sides — while the checkpoint cost two extra
    # sequential materialization jobs per run (r10 A/B: warm census
    # 6.0 s -> 4.4 s from deleting it).
    nodes = _hnsw_nodes(spark, sf_dir)
    # Join-side choice, decided from data size the way AQE would: the
    # frontier is the provably tiny side at ANY corpus scale (≤ EF
    # rows/query), so the scale plan shuffle-joins it against the
    # src-partitioned adjacency checkpoint. But when the adjacency
    # itself fits a broadcast (O(N·(M+1)) vectors — true at bench
    # scale: ~42k edges, ~23 MB), broadcasting IT once instead removes
    # every per-hop stage: the map-side joins preserve the frontier's
    # query_id partitioning, all 18 windows run sort-only, and the
    # single whole-table broadcast subplan is reused by all 9 hops.
    # Corpus size from the parquet FOOTER (pyarrow metadata read, no
    # Spark job) — the same statistic the planner's own size estimation
    # uses; a count() here cost a full job barrier before the search.
    # Per-node edge count is the LAYERED sum, not M+1: level-l nodes
    # keep up to M edges per layer they belong to, and populations
    # shrink 4x per level, so E[edges/node] = M * (1 + 1/4 + 1/16 +
    # 1/64) ~= 4M/3 ~= 21.3 — the first cut used M+1 = 17 and
    # underestimated the broadcast by ~25% right at the boundary the
    # check protects.
    edges_per_node = (HNSW_M * 4 + 2) // 3  # = 22, ceil of the series
    adj_bytes = _parquet_row_count(table_path(sf_dir, "embeddings")) * (
        edges_per_node * (8 * DIM + 24)
    )
    adj_small = adj_bytes < (64 << 20)
    # Co-located adjacency: attach each edge's dst vector AFTER the
    # top-M ranking (so the build's window shuffles (src,dst,cos) rows,
    # never 64-dim payloads). Pre-partitioning by src only pays in
    # shuffle-join mode, where it lets every hop reuse the checkpoint's
    # partitioning; in broadcast mode it would be a dead shuffle.
    edges = (
        _hnsw_edges_from(nodes)
        .select("level", "src", "dst")
        .join(
            nodes.select(
                F.col("vec_id").alias("dst"),
                F.col("v").alias("dv"),
                F.col("norm").alias("dn"),
            ),
            "dst",
        )
    )
    if not adj_small:
        # Shuffle-join mode: partition by src so every hop's sort-merge
        # join reuses the layout.
        edges = edges.repartition("src")
    # Checkpoint in BOTH modes: in broadcast mode the checkpoint leaf is
    # what makes the 9 hops' broadcast subplans canonically identical so
    # exchange reuse materializes ONE broadcast (r09 A/B: dropping the
    # checkpoint re-ran the build inside the broadcasts, +1.1 s).
    # KEEP the checkpoint, don't convert to a persist pin (r15 A/B): the
    # lazy checkpoint does materialize the edge build's 4 AQE stages at
    # plan-build time, but its LogicalRDD leaf also truncates the plan
    # the 9 hops re-reference — with a persist pin every hop's analysis
    # re-walks the full edge-build subplan and the run measured 7.1 s
    # warm (0 build jobs, 29 exec jobs) vs 5.1 s with the checkpoint
    # (4 build jobs, 11 exec jobs). Plan truncation wins for deep
    # re-referencing pipelines; persist pins win for flat fan-outs
    # (sim_ivfpq_rerank_recall, the inverse A/B).
    edges = edges.localCheckpoint(eager=False)
    queries = nodes.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    # Entry point (min vec_id among max-level nodes) in ONE aggregate:
    # vec_id is unique so the (-lvl, vec_id) ordering has no ties for
    # min_by to break arbitrarily. Replaces a 3-stage agg->join->agg
    # chain — each tiny stage was a sequential scheduling floor.
    entry_v = nodes.agg(
        F.min_by(
            F.struct(
                F.col("vec_id").alias("node"),
                F.col("v").alias("nv"),
                F.col("norm").alias("nn"),
            ),
            F.struct(-F.col("lvl"), F.col("vec_id")),
        ).alias("e")
    ).select("e.node", "e.nv", "e.nn")
    state = queries.select("query_id").crossJoin(F.broadcast(entry_v))

    cos_expr = (
        F.expr(
            "aggregate(zip_with(qv, nv, (x, y) -> x * y), 0.0d,"
            " (acc, x) -> acc + x)"
        )
        / (F.col("qnorm") * F.col("nn"))
    )

    def hop(prev: DataFrame, level: int, keep: int) -> DataFrame:
        if adj_small:
            # Level selection INSIDE the join condition, not a filter on
            # the broadcast side: keeps the broadcast subplan identical
            # across all 9 hops so exchange reuse materializes it once.
            e = F.broadcast(edges)
            cond = (prev["node"] == e["src"]) & (e["level"] == level)
        else:
            e = edges.filter(F.col("level") == level).select(
                "src", "dst", "dv", "dn"
            )
            cond = prev["node"] == e["src"]
        cand = (
            prev.join(e, cond, "left")
            .select(
                "query_id",
                F.explode(
                    F.array(
                        F.struct(
                            F.col("node").alias("cn"),
                            F.col("nv").alias("cv"),
                            F.col("nn").alias("cd"),
                        ),
                        F.struct(
                            F.col("dst").alias("cn"),
                            F.col("dv").alias("cv"),
                            F.col("dn").alias("cd"),
                        ),
                    )
                ).alias("c"),
            )
            .select(
                "query_id",
                F.col("c.cn").alias("node"),
                F.col("c.cv").alias("nv"),
                F.col("c.cd").alias("nn"),
            )
            .filter(F.col("node").isNotNull())
        )
        # Exchanges are left to EnsureRequirements: HashPartitioning
        # (query_id) satisfies the dedupe window's ClusteredDistribution
        # (query_id, node) (subset rule) and the beam window's
        # (query_id), so in broadcast mode — where the map-side join
        # preserves the frontier's partitioning — no per-hop exchange is
        # inserted at all; in shuffle-join mode one tiny frontier
        # exchange per hop appears exactly where needed.
        dedup_w = Window.partitionBy("query_id", "node").orderBy("node")
        beam_w = Window.partitionBy("query_id").orderBy(
            F.col("cos_raw").desc(), F.col("node")
        )
        return (
            cand.withColumn("dup", F.row_number().over(dedup_w))
            .filter(F.col("dup") == 1)
            .join(F.broadcast(queries), "query_id")
            .withColumn("cos_raw", cos_expr)
            .withColumn("rn", F.row_number().over(beam_w))
            .filter(F.col("rn") <= keep)
            .select("query_id", "node", "nv", "nn")
        )

    for lvl in range(HNSW_MAX_LEVEL, 0, -1):
        state = hop(state, lvl, HNSW_KEEP_UPPER)
    for _ in range(HNSW_HOPS0):
        state = hop(state, 0, HNSW_EF)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("node")
    )
    return (
        state.join(F.broadcast(queries), "query_id")
        .withColumn("cos_raw", cos_expr)
        .filter(F.col("node") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HNSW_K)
        .select(
            "query_id",
            F.col("node").alias("neighbor_id"),
            "rank",
            F.round("cos_raw", 4).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# Scalar (int8-style) quantization — the third member of the module's
# compression family (PQ: sim_pq_encode/search; JL: sim_random_projection).
# Per-dimension min/max over the corpus -> 8-bit code per dimension ->
# reconstruction error. SQ is the cheap, fully-vectorizable baseline every
# vector store ships (FAISS SQ8, Lucene scalar quantization): 4x smaller
# than float32 with one broadcast of 2*DIM doubles, no codebook training.
# ---------------------------------------------------------------------------
SQ_LEVELS = 255


@query(
    "sim_scalar_quantize",
    oracle=f"""
    WITH px AS (
      SELECT vec_id, i, embedding[i]::DOUBLE AS x
      FROM embeddings, range(1, {DIM + 1}) t(i)
    ), stats AS (
      SELECT i, min(x) AS mn, max(x) AS mx FROM px GROUP BY i
    ), codes AS (
      SELECT vec_id, x, mn, mx,
             CASE WHEN mx > mn
                  THEN CAST(floor({SQ_LEVELS}.0 * (x - mn) / (mx - mn)
                                  + 0.5) AS BIGINT)
                  ELSE 0 END AS c
      FROM px JOIN stats USING (i)
    )
    SELECT vec_id,
           CAST(count(*) AS BIGINT) AS n_dims,
           CAST(sum(c) AS BIGINT) AS sum_code,
           CAST(sum(c * c) AS BIGINT) AS sum_code_sq,
           CAST(sum(CAST(floor(CASE WHEN mx > mn
                 THEN pow(x - (mn + c * (mx - mn) / {SQ_LEVELS}.0), 2)
                 ELSE 0.0 END * 1e12) AS BIGINT)) AS BIGINT) AS sq_err_e12
    FROM codes GROUP BY vec_id
    """,
)
def sim_scalar_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantize every embedding to 8-bit codes against per-dim
    corpus min/max, and emit exact integer summaries of the codes plus
    the reconstruction error (floor-scaled to integers so the hash is
    independent of float accumulation order). Plan shape: one
    posexplode -> groupBy(pos) pass computes the 2*DIM stats (partial
    aggregation, DIM-bounded result), which are packed into a single
    broadcast row; quantization itself is a zero-shuffle index-aware
    array transform inside whole-stage codegen. At 100 TB the corpus is
    read twice (stats pass + encode pass) and nothing else moves."""
    emb = _emb_with_norm(spark, sf_dir).select("vec_id", "v")
    stats = (
        emb.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    packed = stats.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, mn))), s -> s.mn)"
        ).alias("mn"),
        F.expr(
            "transform(array_sort(collect_list(struct(pos, mx))), s -> s.mx)"
        ).alias("mx"),
    )
    lv = float(SQ_LEVELS)
    codes = (
        f"transform(v, (x, i) -> CASE WHEN mx[i] > mn[i]"
        f" THEN cast(floor({lv}d * (x - mn[i]) / (mx[i] - mn[i]) + 0.5d)"
        f" as bigint) ELSE 0L END)"
    )
    errs = (
        f"transform(v, (x, i) -> CASE WHEN mx[i] > mn[i]"
        f" THEN cast(floor(pow(x - (mn[i] + cast(codes[i] as double)"
        f" * (mx[i] - mn[i]) / {lv}d), 2.0d) * 1e12) as bigint)"
        f" ELSE 0L END)"
    )
    return (
        emb.crossJoin(F.broadcast(packed))
        .withColumn("codes", F.expr(codes))
        .select(
            "vec_id",
            F.expr("cast(size(codes) as bigint)").alias("n_dims"),
            F.expr("aggregate(codes, 0L, (a, c) -> a + c)").alias("sum_code"),
            F.expr("aggregate(codes, 0L, (a, c) -> a + c * c)").alias(
                "sum_code_sq"
            ),
            F.expr(f"aggregate({errs}, 0L, (a, e) -> a + e)").alias(
                "sq_err_e12"
            ),
        )
    )
