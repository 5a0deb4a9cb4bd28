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

from pyspark.sql import DataFrame
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
