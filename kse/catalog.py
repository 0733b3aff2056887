"""Table catalog: explicit schemas, loaders, and view registration.

Schemas are declared statically (never inferred — SURVEY.md §1.3): at 100 TB
scale, schema inference means an extra full-data pass and nondeterministic
typing. The testdata layout (TESTDATA.md, FIXTURES.md) is one parquet file
per table; on a real cluster the same loader points at a partitioned
directory tree (``.../orders/o_orderdate_month=.../part-*.parquet``) and
partition pruning applies with no code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = [
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
]

# Dimension tables small enough to broadcast at ANY scale factor (their
# cardinality is fixed or grows sub-linearly: region=5, nation=25 always).
BROADCAST_DIMS = {"region", "nation"}

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Relation cache: (session id, sf_dir, table) -> DataFrame. A DataFrame is
# just an analyzed logical plan — caching it skips the parquet footer read
# and re-analysis on every query build (worth ~50-100 ms/query at small
# scale, measured) without affecting pushdown/pruning, exactly like a
# catalog caching resolved relations. Data itself is never cached.
_RELATION_CACHE: dict[tuple[int, str, str], DataFrame] = {}

# sf_dir -> directory holding an engine-managed multi-file rewrite of the
# same tables (see prepare_local_layout). Empty unless a caller opts in.
_LAYOUTS: dict[str, str] = {}

# Tables whose scans are CPU-bound (JSON parse, text explode, vector math)
# want more splits than their byte size suggests; floors for the local
# layout. At cluster scale the layout target is file size (128 MB-1 GB),
# not file count — this knob only matters for single-digit-MB testdata.
_LAYOUT_FLOOR = {"documents": 4, "embeddings": 4, "events": 8, "orders": 8}

# The two big fact tables land bucketed+sorted on their shared join key
# (scale.write_bucketed's layout): every lineitem⋈orders query then runs
# with zero Exchange on either side — the dominant cost of large⋈large
# joins is paid once at ingest, not per query. Events land bucketed on
# user_id for the same reason applied to WINDOWS: every per-user operator
# (sessionize, z-score, lead/lag, funnel, EWMA) requires clustering by
# user_id, which the bucketed scan already satisfies — the window plans
# with a local sort and zero Exchange. Bucket count targets PARTITION
# SIZE, not core count: 16 wins at the sf0.1 bench tier (interleaved
# A/B vs 32: inner_hash ~154 vs ~166 ms — 32 buckets of ~20k rows are
# pure task overhead), while at the 10x tier 32 reads ~15% faster
# (~440 vs ~515 ms, buckets finally big enough to feed every core). At
# 100 TB the same layout targets ~128 MB-1 GB per bucket file and the
# count scales with the data, not this constant.
_LAYOUT_BUCKETS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "user_id",
}
_N_BUCKETS = 16

# (sf_dir, table) -> catalog table name for bucketed layout members.
_LAYOUT_TABLES: dict[tuple[str, str], str] = {}


def prepare_local_layout(spark: SparkSession, sf_dir: str, dest: str) -> float:
    """Rewrite ``sf_dir``'s tables into an engine-managed layout at ``dest``
    and route subsequent :func:`load` calls for ``sf_dir`` through it.

    The driver's testdata is one single-row-group parquet file per table
    (FIXTURES.md) — Parquet's split granularity is the row group, so every
    scan is one task and 31 of 32 cores idle. A real 100 TB deployment never
    has this layout: ingest writes many ~128 MB-1 GB files (optionally
    bucketed/partitioned — see kse/scale.py) and scans parallelize
    naturally. This function is the local, one-time image of that ingest
    step: measured at sf0.1 it turns the headline-query total from 2.5 s to
    1.7 s purely by letting scans use the cores. Returns seconds spent.
    Idempotent per (sf_dir, dest); correctness paths that read the raw
    driver files are untouched unless they opt in.
    """
    import time

    t0 = time.perf_counter()
    if _LAYOUTS.get(sf_dir) != dest:
        from concurrent.futures import ThreadPoolExecutor

        from pyspark.sql import functions as F

        def write_one(name: str) -> None:
            df = load(spark, sf_dir, name)
            key = _LAYOUT_BUCKETS.get(name)
            if key is not None:
                # repartition on the bucket key first so each write task
                # holds exactly one bucket -> one file per bucket, which is
                # what lets the scan report its sort order downstream
                # stable digest, not hash() (randomized per process) — the
                # catalog table name is deterministic across runs
                import hashlib

                tag = hashlib.md5(f"{sf_dir}|{dest}".encode()).hexdigest()[:8]
                tbl = f"kse_b_{name}_{tag}"
                (
                    df.repartition(_N_BUCKETS, F.col(key))
                    .write.mode("overwrite")
                    .format("parquet")
                    .option("path", os.path.join(dest, f"{name}_bucketed"))
                    .bucketBy(_N_BUCKETS, key)
                    .sortBy(key)
                    .saveAsTable(tbl)
                )
                _LAYOUT_TABLES[(sf_dir, name)] = tbl
                return
            n_rows = df.count()
            n = max(1, min(16, n_rows // 37_500))
            n = max(n, _LAYOUT_FLOOR.get(name, 1))
            df.repartition(n).write.mode("overwrite").parquet(
                os.path.join(dest, f"{name}.parquet")
            )

        # per-table writes are independent Spark actions; running them from
        # driver threads overlaps their scheduling + IO (Spark is thread-
        # safe for concurrent actions on one session). Ingest at cluster
        # scale is the same shape: many tables landing concurrently.
        with ThreadPoolExecutor(max_workers=len(TABLES)) as pool:
            list(pool.map(write_one, TABLES))
        _LAYOUTS[sf_dir] = dest
        # drop raw-file relations and prepared plans built over them so the
        # next build re-resolves against the layout
        for key in [k for k in _RELATION_CACHE if k[1] == sf_dir]:
            del _RELATION_CACHE[key]
        from kse import registry

        registry.invalidate_plans(sf_dir, spark)
    return time.perf_counter() - t0


# Partition targets for pinned tables (cache_tables): fixed-size dims
# collapse to one in-memory partition (their scan + exchange scheduling
# otherwise costs more than the data), CPU-bound scans (JSON parse, text
# explode) keep enough splits to use the cores. Local-tier knob only — at
# cluster scale you pin dims and hot partitions, never whole fact tables,
# and partition counts come from the layout, not this map.
_CACHE_PARTS = {
    "region": 1,
    "nation": 1,
    "supplier": 1,
    "part": 2,
    "customer": 2,
    "documents": 2,
    "embeddings": 1,
    "orders": 4,
    "lineitem": 8,
    "events": 8,
}


def cache_tables(spark: SparkSession, sf_dir: str) -> float:
    """Pin every NON-BUCKETED table in executor memory (deserialized
    columnar) and route subsequent :func:`load` calls through the pinned
    relations; tables the layout bucketed are skipped (see the inline
    comment below — caching would destroy their co-location).

    This is the warm-buffer-pool posture the DuckDB comparator already
    enjoys (its warm-up passes leave the parquet pages in the OS cache and
    its own buffer manager): Spark's equivalent is an explicit ``.cache()``,
    which also lets Catalyst substitute InMemoryRelation into any plan that
    scans the same files. Coalescing first cuts per-task scheduling cost
    (~2-5 ms/task locally) for tables whose data is smaller than the
    overhead of scanning them in parallel. Bench-only: correctness paths
    never call this. Returns seconds spent materializing the caches."""
    import time

    t0 = time.perf_counter()
    for name in TABLES:
        if (sf_dir, name) in _LAYOUT_TABLES:
            # Never cache a table the layout deliberately BUCKETED:
            # InMemoryRelation does not preserve the bucketed scan's hash
            # partitioning, so a cached fact side re-Exchanges in every
            # co-located join — the cache destroys exactly the locality
            # the layout paid for (measured under bench conditions:
            # inner_hash ~258 ms cached-broadcast vs ~225 ms
            # uncached-co-located SHJ; the cached SHJ path is ~370 ms).
            # The bucketed files sit in the OS page cache after warm-up,
            # which is the same warm-buffer posture the cache gives the
            # small dims.
            continue
        df = load(spark, sf_dir, name)
        n = _CACHE_PARTS.get(name)
        if n is not None and df.rdd.getNumPartitions() > n:
            df = df.coalesce(n)
        df = df.cache()
        df.count()
        _RELATION_CACHE[(id(spark), sf_dir, name)] = df
    from kse import registry

    registry.invalidate_plans(sf_dir, spark)
    return time.perf_counter() - t0


def release_tables(spark: SparkSession, sf_dir: str) -> None:
    """Undo :func:`cache_tables` + :func:`prepare_local_layout` routing for
    ``sf_dir``: unpersist every pinned relation and point subsequent
    :func:`load` calls back at the raw driver files.

    The bench's UNCACHED leg uses this to time the same queries against the
    raw single-file driver layout in the same session (no pinned executor
    memory, no engine-managed rewrite — only the OS page cache, the same
    warm-buffer posture the in-process comparator gets). The rewritten
    layout files themselves stay on disk (the streaming leg reads them by
    path); only the catalog routing changes."""
    for key in [k for k in _RELATION_CACHE if k[1] == sf_dir]:
        df = _RELATION_CACHE.pop(key)
        try:
            df.unpersist()
        except Exception:
            pass
    _LAYOUTS.pop(sf_dir, None)
    for key in [k for k in _LAYOUT_TABLES if k[0] == sf_dir]:
        del _LAYOUT_TABLES[key]
    from kse import registry

    registry.invalidate_plans(sf_dir, spark)


def _normalize_session(spark: SparkSession) -> None:
    """Set the runtime confs every query path depends on, once per session.

    The driver calls ``queries()[name](spark, sf_dir)`` with ITS OWN
    SparkSession, which need not carry kse.session's configs. UTC + NTZ
    inference keep timestamp semantics aligned with the DuckDB oracle;
    ``nanosAsLong`` is a forward-compat guard so a TIMESTAMP(NANOS)-vintage
    events file loads as BIGINT (which :func:`load` then converts) instead
    of failing with PARQUET_TYPE_ILLEGAL — it is a no-op for the current
    timestamp[us] testdata. All three are runtime-settable (verified on
    Spark 4.1.2)."""
    if getattr(spark, "_kse_normalized", False):
        return
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    spark._kse_normalized = True


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Plain ``spark.read.parquet`` so Catalyst keeps full
    pushdown/pruning freedom; the declared schema is documentation + the
    contract tests assert the parquet footer matches it."""
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(SCHEMAS)}")
    _normalize_session(spark)
    key = (id(spark), sf_dir, name)
    cached = _RELATION_CACHE.get(key)
    if cached is not None:
        return cached
    layout = _LAYOUTS.get(sf_dir)
    if layout is not None:
        # engine-managed rewrite: timestamps already micro-truncated at
        # layout-write time, so no per-read conversion
        tbl = _LAYOUT_TABLES.get((sf_dir, name))
        if tbl is not None:
            df = spark.table(tbl)  # bucketed: co-located joins, no Exchange
        else:
            df = spark.read.parquet(os.path.join(layout, f"{name}.parquet"))
    else:
        df = spark.read.parquet(table_path(sf_dir, name))
        if name == "events":
            # The testdata vintage determines how `ts` arrives:
            #   - timestamp[us] parquet (current testdata, pyarrow-verified)
            #     → TIMESTAMP/TIMESTAMP_NTZ: pass through untouched.
            #   - TIMESTAMP(NANOS) parquet read under nanosAsLong → raw
            #     BIGINT nanoseconds: truncate to microseconds (what DuckDB
            #     yields for epoch_us on a ns timestamp) under UTC.
            # Branch on the loaded dtype so either vintage works.
            ts_type = df.schema["ts"].dataType
            if isinstance(ts_type, T.LongType):
                from pyspark.sql import functions as F

                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
    _RELATION_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view (the SQL entry path, SURVEY.md §3.2)."""
    for name in tables or TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
