"""The replica-probe corpus must preserve join/cardinality structure.

The whole point of `tools/scale_probe.py` is that a factor-R replica
measures the SAME plan the engine would run on R-times-larger real data.
That only holds if (a) row counts scale exactly R-fold, (b) join
multiplicities stay constant (naive duplication without key offsets makes
a key match R copies and the join output grow R^2-fold), and (c) document
texts stay near-dup-comparable within a replica but never across replicas
(else MinHash candidate pairs grow R^2-fold on the exact-dup clusters).
These invariants are what make the SCALING.md numbers meaningful, so they
get their own test.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT / "tools"))


def test_replica_preserves_join_structure(spark, sf_dir, tmp_path):
    import scale_probe

    factor = 3
    out = str(tmp_path / "replica")
    scale_probe.build(factor, out, src=sf_dir, spark=spark)

    li0 = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o0 = spark.read.parquet(f"{sf_dir}/orders.parquet")
    liR = spark.read.parquet(f"{out}/lineitem.parquet")
    oR = spark.read.parquet(f"{out}/orders.parquet")

    # (a) fact row counts scale exactly R-fold; dimension constants don't
    assert liR.count() == factor * li0.count()
    assert oR.count() == factor * o0.count()
    assert (
        spark.read.parquet(f"{out}/nation.parquet").count()
        == spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    )

    # (b) join output scales R-fold, NOT R^2 — key offsets keep each
    # lineitem matching exactly its own replica's order
    base_join = li0.join(o0, li0.l_orderkey == o0.o_orderkey).count()
    big_join = liR.join(oR, liR.l_orderkey == oR.o_orderkey).count()
    assert big_join == factor * base_join

    # (c) cross-replica texts are disjoint: exact-dup groups don't grow
    from pyspark.sql import functions as F

    d0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dR = spark.read.parquet(f"{out}/documents.parquet")
    max_dup0 = (
        d0.groupBy(F.md5("text")).count().agg(F.max("count")).first()[0]
    )
    max_dupR = (
        dR.groupBy(F.md5("text")).count().agg(F.max("count")).first()[0]
    )
    assert max_dupR == max_dup0, (
        "replication must not create cross-replica exact-dup clusters"
    )
    # and doc_ids stay unique
    assert dR.select("doc_id").distinct().count() == dR.count()

    shutil.rmtree(out, ignore_errors=True)
