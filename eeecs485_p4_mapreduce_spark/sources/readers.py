"""Source/sink connectors.

The reference's only source is "directory of UTF-8 text files" and its only
sink is "directory of part-%05d text files" (SURVEY.md §2.1/§2.5); those
live in mrlite. This module is the generalized connector surface: schema'd
readers for text/CSV/JSON/Parquet and partitioned/bucketed writers.

Scale notes:
- Always pass an explicit schema in production paths: schema inference is
  a full extra pass over the data (unbounded at 100 TB).
- ``write_partitioned`` lays data out hive-style so downstream queries get
  partition pruning; ``write_bucketed`` pre-shuffles by key so later joins
  and aggs on that key are exchange-free.
- ``maxPartitionBytes`` governs scan split sizing; we keep the session
  default (128 MB) and don't fight it per-reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_text_dir(spark: SparkSession, path: str, whole_file: bool = False) -> DataFrame:
    """Directory of text files → DataFrame[value: string] (one row per
    line), or per-file rows when whole_file=True (the reference's
    file-granular unit, SURVEY.md §1.1)."""
    if whole_file:
        return spark.read.text(path, wholetext=True)
    return spark.read.text(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.options(**options).csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).json(path)


def read_parquet(
    spark: SparkSession, path: str, merge_schema: bool = False
) -> DataFrame:
    """merge_schema=True unions the schemas of all footers (schema
    evolution: files written before a column was added read as null) at
    the cost of reading every footer — keep it off for fixed-schema
    tables; at 100 TB footer-merging a million files is its own job."""
    return spark.read.option("mergeSchema", str(merge_schema).lower()).parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned layout → partition pruning for readers that
    filter on the partition columns."""
    df.write.mode(mode).partitionBy(*partition_by).format(fmt).save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffled on ``bucket_by`` so joins and
    aggregations on those keys skip the exchange entirely."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same pushdown/pruning behavior as parquet (Spark's ORC
    reader is vectorized and filter-pushing by default)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_csv_permissive(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
) -> DataFrame:
    """Fault-tolerant CSV ingest: rows that don't parse against the
    schema land intact in ``_corrupt_record`` instead of failing the job
    (or being silently dropped) — the quarantine pattern for untrusted
    feeds. Callers split on ``_corrupt_record IS NULL`` and route the
    rejects to a dead-letter sink."""
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    from pyspark.sql.types import StringType, StructField

    if "_corrupt_record" not in schema.fieldNames():
        schema = StructType(
            list(schema.fields) + [StructField("_corrupt_record", StringType())]
        )
    return (
        spark.read.option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema)
        .csv(path)
    )
