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
from eeecs485_p4_mapreduce_spark.functions.text import STOPWORDS, count_in_list
from eeecs485_p4_mapreduce_spark.operators.dedup import (
    _DUCK_CLUSTER_CTES,
    _propagate_min_labels,
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
           sum(n) AS n_tokens,
           round(sum(stop_cnt) * 1.0 / sum(n), 4) AS stopword_ratio
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
    edges = pairs.union(
        pairs.select(F.col("doc_b"), F.col("doc_a"))
    ).toDF("src", "dst")
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
