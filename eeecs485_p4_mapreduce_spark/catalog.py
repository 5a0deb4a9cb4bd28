"""Table catalog over the driver-generated parquet test data.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}``.

At 100 TB each "table" would be a partitioned parquet/iceberg dataset; the
reads here go through the exact same DataFrameReader path (column pruning +
predicate pushdown reach the scan), so nothing in the engine assumes
single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Per-replica key shift used by tools/scale_probe.py's replica
#: corpora — shared here so probe-only operator variants (e.g.
#: dedup_semdedup_scaledk's shard derivation) and the probe builder can
#: never drift apart on the one constant that links them.
REPLICA_KEY_OFFSET = 100_000_000

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Schema-by-path cache (the engine's one-table metastore). Every
#: ``spark.read.parquet(path)`` WITHOUT an explicit schema runs a
#: schema-inference job (a 1-task footer read) before the query proper —
#: ~0.05-0.5 s of scheduler + py4j latency per table load, paid again on
#: every query invocation (a 6-table star join pays it 6 times, twice per
#: bench run). A real warehouse reads schemas from its catalog, not from
#: data files; this dict is that catalog. Keyed on the resolved path;
#: IMMUTABILITY ASSUMPTION (r14 advice): a cached path's dataset must
#: not be rewritten with a DIFFERENT schema within one process — true
#: for the driver-generated test tables (immutable), cached_layout
#: spools (rebuilds land in a fresh tempdir), and per-run snapshot dirs
#: (rewritten by the same job with the same schema). A fixture that
#: regenerates a path with a new schema must call
#: ``clear_schema_cache()`` first. Caches METADATA only — never rows,
#: so every query still computes from parquet (guide §1 /
#: optimization-round rules).
_SCHEMA_CACHE: dict[str, object] = {}


def clear_schema_cache(path: str | None = None) -> None:
    """Invalidate the schema cache — everything, or one path/key."""
    if path is None:
        _SCHEMA_CACHE.clear()
    else:
        _SCHEMA_CACHE.pop(path, None)


def dump_plan_evidence(df: DataFrame, name: str) -> DataFrame:
    """Plan-evidence hook (r14 audit item 4): queries whose RESULT is
    checkpointed return a plan truncated to ``Scan ExistingRDD``, so
    their committed explain dumps show none of the join/agg structure.
    When ``$SPARK_GRAFT_PLAN_EVIDENCE`` names a directory, write the
    PRE-checkpoint subtree's ``explain("formatted")`` there; otherwise
    (every normal run, the driver, the bench) this is an exact no-op.
    Returns ``df`` so it chains."""
    out_dir = os.environ.get("SPARK_GRAFT_PLAN_EVIDENCE")
    if out_dir:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(buf.getvalue())
    return df


#: Live DISK_ONLY reuse pins, one per pin_disk call site (see pin_disk).
_DISK_PINS: dict[tuple[str, int], DataFrame] = {}


def pin_disk(df: DataFrame) -> DataFrame:
    """``persist(DISK_ONLY)`` with per-call-site supersession: the
    previous invocation's pin from the same source line is unpersisted
    before the new one registers.

    Why not bare ``persist``: Spark's CacheManager matches cache entries
    by ANALYZED PLAN, and the engine's reuse pins were never unpersisted
    — so (a) a repeat invocation of the same query (bench warm runs, the
    oracle gate's 340-query session) silently READ the previous run's
    persisted intermediate instead of recomputing from parquet ("Asked
    to cache already cached data" warnings), and (b) every pin leaked
    for the session's lifetime. Dropping the old entry first makes every
    invocation compute from source and bounds live pins to one per site.

    DISK_ONLY (not localCheckpoint) is deliberate: lineage is kept, so
    an executor-loss at 100 TB recomputes the lost partitions instead of
    failing the query (SCALE.md). Call as ``df.transform(pin_disk)`` or
    ``pin_disk(df)``; the site key is the first non-pyspark caller
    frame, so both spellings key on the operator source line.
    Driver-side, single-threaded use (the engine's query builders)."""
    import sys

    from pyspark import StorageLevel

    f = sys._getframe(1)
    while f is not None and f"{os.sep}pyspark{os.sep}" in (
        f.f_code.co_filename or ""
    ):
        f = f.f_back
    key = (
        (f.f_code.co_filename, f.f_lineno) if f is not None else ("?", 0)
    )
    old = _DISK_PINS.pop(key, None)
    if old is not None:
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001 — old session may be stopped
            pass
    # Cross-SITE supersession (r15): two different queries can pin the
    # same analyzed plan through different call sites (shared helpers —
    # e.g. the PQ codebook), and the site-keyed pop above never sees
    # the other site's live entry, so the persist below would silently
    # ALIAS it (CacheManager "Asked to cache already cached data"):
    # query B's census row then reads query A's materialized pin
    # instead of computing from source. Uncache any plan-equivalent
    # entry first — DataFrame.unpersist matches by canonicalized plan,
    # not by handle, so it drops the other site's entry too. The probe
    # is df.storageLevel (a canonical CacheManager lookup); is_cached
    # checks only this handle's own registration and misses aliases.
    try:
        lvl = df.storageLevel
        if lvl.useDisk or lvl.useMemory or lvl.useOffHeap:
            df.unpersist()
    except Exception:  # noqa: BLE001 — cache probe must never break a build
        pass
    out = df.persist(StorageLevel.DISK_ONLY)
    _DISK_PINS[key] = out
    return out


def read_parquet_cached(
    spark: SparkSession, *paths: str, schema: object | None = None
) -> DataFrame:
    """``spark.read.parquet`` through the path-keyed schema cache.

    Every schema-less parquet read runs a 1-task footer-inference job
    before the query proper; the engine's write-then-read-back demos
    and spool readers paid it on every invocation (31 sites, r14 audit
    item). Keyed on the path tuple: spool layouts are immutable once
    built (``cached_layout`` rebuilds into a FRESH tempdir on any
    mutation) and per-run snapshot dirs are only ever rewritten with
    the same schema by the same job, so a path-keyed entry cannot go
    stale within a process. Pass ``schema`` (writer-schema reuse) to
    skip inference on the very first read too. Caches METADATA only —
    rows always come from the files."""
    key = "\x00".join(paths)
    s = schema if schema is not None else _SCHEMA_CACHE.get(key)
    if s is not None:
        _SCHEMA_CACHE[key] = s
        return spark.read.schema(s).parquet(*paths)
    df = spark.read.parquet(*paths)
    _SCHEMA_CACHE[key] = df.schema
    return df


def pin_utc(spark: SparkSession) -> None:
    """THE repo-wide timezone rule, in one place: every entry point that
    hands engine data to a session (the session factory, load_table,
    streaming's spool_events) pins ``spark.sql.session.timeZone=UTC``
    for the session's lifetime. Rationale: NTZ→LTZ casts interpret
    wall-clock in the session tz, and every downstream epoch bucket
    (unix_micros, window(), date_format) renders in it — on a non-UTC
    host a vanilla session would shift hour/week buckets across
    boundaries vs the DuckDB oracles' tz-free epoch math; under UTC both
    paths agree byte-for-byte. The pin is deliberately NOT restored:
    callers that interleave engine queries with their own timestamp work
    would otherwise see results flip depending on which ran last."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _parse_bytes(v: str) -> int:
    """Spark size-conf string → bytes ("134217728", "128m", "1g", "128MB")."""
    s = v.strip().lower()
    for suffix, mult in (
        ("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20), ("kb", 1 << 10),
        ("t", 1 << 40), ("g", 1 << 30), ("m", 1 << 20), ("k", 1 << 10),
        ("b", 1),
    ):
        if s.endswith(suffix):
            return int(s[: -len(suffix)]) * mult
    return int(s)


def spread_small_source(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Repartition an UNDER-SPLIT source to core width so heavy per-row
    JVM projections (md5-per-window fingerprints, 16-hash MinHash
    signatures) parallelize — and do NOTHING when the source already
    has real splits, so at warehouse scale no extra full-table shuffle
    is ever added. The bench corpus is a single parquet split, which
    otherwise serializes every pre-shuffle projection on one core.

    The under-split test reads the optimizer's own size statistic
    (``optimizedPlan().stats().sizeInBytes`` — the file size for a scan)
    instead of materializing ``df.rdd``: the RDD conversion cost a full
    physical-planning pass per call (~80 ms of driver latency × ~14
    calls per bench run), while the stats read is ~25 ms and the
    decision is the same — scan partitions ≈ sizeInBytes /
    maxPartitionBytes, so "fewer partitions than cores" ⇔ "fewer
    splittable bytes than cores × maxPartitionBytes". That equivalence
    holds for the plain (at most column-pruned) scans every current
    caller passes; a selective FILTER would shrink the estimate below
    the real scan split count (forcing a harmless extra repartition),
    and a non-scan input (e.g. a checkpointed LogicalRDD) reports the
    spark.sql.defaultSizeInBytes sentinel — treated as "unknown" below,
    falling back to the RDD partition check rather than silently
    skipping the spread (r14 advice). Falls back the same way if the
    internal stats API is unavailable."""
    spark = df.sparkSession
    sc = spark.sparkContext
    par = sc.defaultParallelism
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes().toString()
        )
        default_size = int(
            spark.conf.get("spark.sql.defaultSizeInBytes", str(1 << 62))
        )
        if size >= default_size:
            raise ValueError("size statistic is the unknown-size sentinel")
        max_split = _parse_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
        if size >= par * max_split:
            return df
    except Exception:  # pragma: no cover — internal API moved; be correct
        if df.rdd.getNumPartitions() >= par:
            return df
    return df.repartition(par, key)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # Some generations of events.parquet store TIMESTAMP(NANOS), which
        # vanilla Spark 4 refuses to read. This conf is runtime-settable, so
        # flip it here rather than at session-build time: the correctness
        # driver hands us its own vanilla SparkSession, which our session
        # factory never saw.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        pin_utc(spark)
    path = table_path(sf_dir, name)
    cached = _SCHEMA_CACHE.get(path)
    if cached is not None:
        df = spark.read.schema(cached).parquet(path)
    else:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
    if name == "events":
        # Normalize ts to TIMESTAMP (LTZ) at micros precision regardless of
        # how this generation of the file stores it:
        #  - TIMESTAMP(NANOS) → bigint via nanosAsLong → timestamp_micros.
        #    Integer division is load-bearing: `/` is double division, and
        #    doubles can't represent 1.7e18 nanos exactly.
        #  - timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ → cast.
        #    Same wall-clock under the UTC session; LTZ is what
        #    unix_micros()/window() downstream require.
        from pyspark.sql import functions as F

        dtype = dict(df.dtypes).get("ts")
        if dtype == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif dtype == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register each table as a temp view so ``spark.sql`` works directly."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
