"""The reference's two workloads (word count, distributed grep —
SURVEY.md §2.7) as registered queries over the `documents` table, in two
forms each where meaningful:

- idiomatic DataFrame form (explode/split/filter — Catalyst-optimized,
  whole-stage codegen, the 100 TB path);
- the full mrlite parity pipeline (text files → map → md5 shuffle →
  sorted reduce → part files), driven end-to-end under the same DuckDB
  oracle, proving the parity engine computes the same answer as SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eeecs485_p4_mapreduce_spark.catalog import load_table
from eeecs485_p4_mapreduce_spark.registry import query

# Reference tokenization: split on space/tab, lowercase
# (reference: tests/testdata/exec/wc_map.sh:13).
_WC_ORACLE = """
    SELECT token, count(*) AS cnt
    FROM (
      SELECT unnest(string_split_regex(lower(text), '[ \t]')) AS token
      FROM documents
    )
    GROUP BY token
"""


@query("mr_wordcount", oracle=_WC_ORACLE)
def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count, idiomatic form: tokenize → groupBy → count.

    Scale: explode is pipelined inside the scan stage; the count is a
    partial hash agg, so only (token, partial_count) pairs shuffle —
    the classic combiner optimization the reference leaves to its
    reducer executable.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(F.lower("text"), "[ \t]")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query("mr_wordcount_pipeline", oracle=_WC_ORACLE)
def mr_wordcount_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through the ACTUAL mrlite parity engine: documents.text
    is written out as a directory of text files, a real MapReduce job runs
    (map → md5 shuffle → sorted reduce → part-%05d files), and the part
    files are read back and parsed. Hash-matching the same SQL oracle as
    the idiomatic form proves the parity pipeline end-to-end.
    """
    import tempfile
    from pathlib import Path

    from eeecs485_p4_mapreduce_spark.mrlite import MREngine
    from eeecs485_p4_mapreduce_spark.mrlite import builtins as b

    docs = load_table(spark, sf_dir, "documents")
    workdir = Path(tempfile.mkdtemp(prefix="mr-wc-"))
    in_dir, out_dir = workdir / "input", workdir / "output"
    # Distributed text export (no driver collect); 4 input files so the
    # round-robin file split actually exercises multiple map tasks.
    docs.select("text").coalesce(4).write.mode("overwrite").text(str(in_dir))
    for extra in in_dir.glob("_*"):
        extra.unlink()  # drop _SUCCESS so only data files are inputs

    engine = MREngine(spark)
    result = engine.submit_job(
        input_directory=str(in_dir),
        output_directory=str(out_dir),
        mapper_executable=b.wc_map,
        reducer_executable=b.wc_reduce,
        num_mappers=4,
        num_reducers=2,
    )
    out = spark.read.text(result.output_paths)
    return out.select(
        F.substring_index("value", "\t", 1).alias("token"),
        F.substring_index("value", "\t", -1).cast("bigint").alias("cnt"),
    )


@query(
    "mr_grep",
    oracle="""
    SELECT doc_id, text
    FROM documents
    WHERE contains(lower(text), 'window')
    """,
)
def mr_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed grep, idiomatic form: a pushed-down filter + projection.

    The reference's grep keys every match on the constant "1" and funnels
    all output through one reducer (SURVEY.md §2.7) — a scalability
    anti-pattern; the DataFrame form has no such single-partition funnel.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.lower(F.col("text")).contains("window")).select(
        "doc_id", "text"
    )


@query(
    "mr_grep_sorted",
    oracle="""
    SELECT text
    FROM documents
    WHERE contains(lower(text), 'window')
    ORDER BY text
    """,
)
def mr_grep_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grep with the reference's output ordering guarantee (global sort —
    its single reducer sees lines sorted; SURVEY.md §2.4 R3)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.lower(F.col("text")).contains("window"))
        .select("text")
        .orderBy("text")
    )
