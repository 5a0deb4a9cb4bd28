"""Write-path layout optimization: Z-order (Morton) clustering for
multi-dimensional data skipping.

Parquet row-group min/max stats prune scans only when values are
clustered; range-partitioning on ONE key leaves every other dimension's
min/max spanning the full domain. Interleaving the bits of two keys into
a Morton code and range-partitioning + sorting on it bounds BOTH
dimensions per file — each partition covers a small rectangle of the
(k1, k2) plane, so predicates on either key skip most files. This is the
same layout idea Delta/Iceberg expose as OPTIMIZE ZORDER BY; here it is
a page of column expressions over vanilla repartitionByRange.

Domains must be normalized to a common bit width before interleaving:
with raw values, the wider key's unopposed high bits dominate the code
and the "z-order" silently degenerates to a single-key sort (measured:
the narrow key's per-partition span stays at ~100% of its domain).
zorder_by therefore min/max-scales both keys to ``bits`` bits first —
one tiny agg job for the bounds.

The bit math is plain integer ops, identical text in Spark SQL and ANSI
SQL (disjoint bit positions make `+` equal `|`), so the z-value has an
exact DuckDB oracle (q46).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def zvalue_expr(
    c1: str,
    c2: str,
    bits: int = 16,
    bounds: tuple[int, int, int, int] | None = None,
) -> str:
    """SQL text computing the Morton interleave of two non-negative
    integer columns (c1 takes even bit positions). With ``bounds``
    (lo1, hi1, lo2, hi2), each key is first min/max-scaled to ``bits``
    bits so both contribute equally to the code. Valid in both Spark SQL
    and ANSI SQL."""
    m = (1 << bits) - 1
    if bounds is not None:
        lo1, hi1, lo2, hi2 = bounds
        c1 = (
            f"cast(floor(((({c1}) - {lo1}) * {m})"
            f" / {max(1, hi1 - lo1)}) as bigint)"
        )
        c2 = (
            f"cast(floor(((({c2}) - {lo2}) * {m})"
            f" / {max(1, hi2 - lo2)}) as bigint)"
        )
    terms = []
    for i in range(bits):
        # BIGINT casts are load-bearing: INT32 inputs overflow at shift
        # position 31 in both engines' strict modes.
        terms.append(
            f"(cast((({c1} >> {i}) & 1) as bigint) << {2 * i})"
        )
        terms.append(
            f"(cast((({c2} >> {i}) & 1) as bigint) << {2 * i + 1})"
        )
    return " + ".join(terms)


def zorder_by(
    df: DataFrame, c1: str, c2: str, n_partitions: int, bits: int = 10
) -> DataFrame:
    """Cluster ``df`` for 2-D data skipping: min/max-normalize both keys,
    range-partition and sort by their Morton code. Write the result with
    any file sink; each output file then covers a bounded rectangle of
    the key plane. repartitionByRange samples the z-values to build
    balanced range bounds — no skew even when key domains are dense at
    one end. The bounds agg is one extra scan of two columns (cheap,
    column-pruned); pass precomputed stats instead if the table has them."""
    lo1, hi1, lo2, hi2 = df.agg(
        F.min(c1), F.max(c1), F.min(c2), F.max(c2)
    ).first()
    z = F.expr(zvalue_expr(c1, c2, bits, (lo1, hi1, lo2, hi2)))
    return (
        df.withColumn("_zval", z)
        .repartitionByRange(n_partitions, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
    )


# ---------------------------------------------------------------------------
# Small-files compaction: the standing maintenance job of any long-lived
# 100 TB table. Streaming sinks, dynamic-partition upserts, and hourly
# ingest each leave thousands of KB-sized parquet files behind; every
# downstream scan then pays one footer read + one task per file, and the
# NameNode/object-store listing itself becomes the bottleneck. Compaction
# rewrites a directory into ceil(total_bytes / target_file_bytes) files —
# sized from the REAL on-disk bytes (post-encoding, post-compression), not
# row counts, so the output hits the target regardless of schema width.
# ---------------------------------------------------------------------------
def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every data file under ``path``, recursively, via
    the Hadoop FileSystem API — works unchanged on local, HDFS, and S3A.
    Metadata-only; nothing is read."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out: list[tuple[str, int]] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not name.startswith(("_", ".")):  # skip _SUCCESS, hidden, CRCs
            out.append((st.getPath().toString(), st.getLen()))
    return out


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> dict[str, int]:
    """Rewrite the parquet directory at ``in_path`` into
    ``ceil(total_bytes / target_file_bytes)`` files at ``out_path``.

    With ``sort_by``, output files are range-partitioned and sorted on
    those keys, so compaction doubles as a clustering pass (row-group
    min/max stats become selective — the 1-D cousin of zorder_by); range
    bounds come from sampling, which also breaks up any pathological
    file-to-key correlation in the input. Without it, a round-robin
    repartition gives uniformly sized files with no shuffle skew risk.
    Returns an audit dict (files/bytes in, files out). The rewrite is a
    single Spark job: scan → one exchange → write; never merges through
    the driver."""
    files = list_data_files(spark, in_path)
    total = sum(sz for _, sz in files)
    n_out = max(1, -(-total // max(1, target_file_bytes)))
    df = spark.read.parquet(in_path)
    if sort_by:
        df = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.repartition(n_out)
    df.write.mode("overwrite").parquet(out_path)
    return {
        "files_in": len(files),
        "bytes_in": total,
        "files_out": len(list_data_files(spark, out_path)),
        "target_file_bytes": target_file_bytes,
    }
