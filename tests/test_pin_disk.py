"""pin_disk: the DISK_ONLY reuse pin with per-call-site supersession.

The r14 audit found the engine's persist(DISK_ONLY) pins were never
unpersisted, so a repeat invocation of the same query silently read the
previous run's persisted intermediate (CacheManager matches by analyzed
plan) instead of recomputing from parquet, and pins leaked for the
session's lifetime. pin_disk supersedes the previous pin from the same
call site; these tests pin down that contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _build(spark):
    from eeecs485_p4_mapreduce_spark.catalog import pin_disk

    # same logical plan every call, like a query invoked twice
    return pin_disk(spark.range(100).withColumn("x", F.col("id") * 2))


def _n_cached(spark) -> int:
    jvm_cm = spark._jsparkSession.sharedState().cacheManager()
    return 0 if jvm_cm.isEmpty() else 1  # coarse: empty vs not


def test_pin_disk_supersedes_previous_pin(spark):
    from eeecs485_p4_mapreduce_spark.catalog import _DISK_PINS

    spark.catalog.clearCache()
    before = dict(_DISK_PINS)
    a = _build(spark)
    assert a.count() == 100  # materialize the first pin
    assert a.storageLevel.useDisk and not a.storageLevel.useMemory
    b = _build(spark)  # same site, same plan -> supersede
    assert b.count() == 100
    # exactly one live pin for that site (the old one was unpersisted)
    new_keys = set(_DISK_PINS) - set(before)
    assert len(new_keys) == 1
    # the superseded DataFrame is no longer cached
    assert a.storageLevel.useDisk is False or not a.is_cached
    assert b.is_cached
    # cleanup
    b.unpersist()
    for k in new_keys:
        _DISK_PINS.pop(k, None)


def test_pin_disk_sites_key_independently(spark):
    from eeecs485_p4_mapreduce_spark.catalog import _DISK_PINS, pin_disk

    before = set(_DISK_PINS)
    a = pin_disk(spark.range(10))
    b = pin_disk(spark.range(20))  # different line -> different key
    new = set(_DISK_PINS) - before
    assert len(new) == 2
    a.unpersist()
    b.unpersist()
    for k in new:
        _DISK_PINS.pop(k, None)


def test_pin_disk_supersedes_plan_equivalent_pin_from_other_site(spark):
    """Two different call sites pinning the SAME analyzed plan (shared
    helpers across queries, e.g. the PQ codebook) must not alias: the
    second pin uncaches the first site's entry before persisting, so
    the second query computes from source instead of silently reading
    the first query's materialized pin (the census CacheManager
    "already cached" warnings, r15)."""
    from eeecs485_p4_mapreduce_spark.catalog import _DISK_PINS, pin_disk

    def n_materialized() -> int:
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return len([i for i in infos if i.numCachedPartitions() > 0])

    spark.catalog.clearCache()
    before = set(_DISK_PINS)
    plan = lambda: spark.range(50).withColumn("y", F.col("id") + 1)  # noqa: E731
    a = pin_disk(plan())
    assert a.count() == 50  # materialize site A's pin
    assert a.storageLevel.useDisk  # canonical lookup sees the entry
    assert n_materialized() >= 1
    b = pin_disk(plan())  # DIFFERENT line, same canonicalized plan
    # the fix uncached site A's materialized entry BEFORE persisting
    # site B's (the aliasing bug left A's blocks live and served them
    # to B) — so right here nothing is materialized yet
    assert n_materialized() == 0
    assert b.count() == 50  # B computes from source
    assert b.storageLevel.useDisk
    new = set(_DISK_PINS) - before
    b.unpersist()
    for k in new:
        _DISK_PINS.pop(k, None)


def test_transform_spelling_keys_on_operator_site(spark):
    """df.transform(pin_disk) must key on the engine call site, not on
    pyspark's transform internals (all sites would collide there)."""
    from eeecs485_p4_mapreduce_spark.catalog import _DISK_PINS, pin_disk

    before = set(_DISK_PINS)
    a = spark.range(30).transform(pin_disk)
    b = spark.range(40).transform(pin_disk)
    new = set(_DISK_PINS) - before
    assert len(new) == 2, "transform() sites collided on one key"
    for k in new:
        assert "pyspark" not in k[0]
    a.unpersist()
    b.unpersist()
    for k in new:
        _DISK_PINS.pop(k, None)
