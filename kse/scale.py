"""Scale patterns as library code (DESIGN.md made runnable).

These are the rewrites you reach for when a key is skewed or an operator
has no shuffle-friendly native form. Each has an equivalence test against
the naive form (tests/test_scale.py) — same answer, different shuffle
shape.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    *,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    Phase 1 groups by (key, salt) — a hot key's rows spread over
    ``salt_buckets`` reducers instead of one straggler; phase 2 merges the
    per-salt partials. ``aggs`` maps output column -> phase-1 aggregate;
    the phase-2 merge re-aggregates with the matching combiner (sum→sum,
    count→sum, min→min, max→max), which is why only decomposable
    aggregates are accepted.

    At 100 TB: use when one key holds >~1 partition's worth of rows and
    AQE's skew handling can't apply (e.g. aggregation, not join). The salt
    only spreads rows — its value never reaches the result, so any cheap
    per-row source works (hash of a row id here).
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    # monotonically_increasing_id is partition-deterministic, fine as salt
    # entropy: the VALUE doesn't matter, only spreading rows.
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(*[c.alias(f"_p_{name}") for name, c in aggs.items()])
    )

    def merge_col(name: str, col: Column) -> Column:
        expr = str(col._jc)  # e.g. "sum(value) AS ..." — inspect combiner
        p = F.col(f"_p_{name}")
        if expr.startswith("count(") or expr.startswith("sum("):
            return F.sum(p).alias(name)
        if expr.startswith("min("):
            return F.min(p).alias(name)
        if expr.startswith("max("):
            return F.max(p).alias(name)
        raise ValueError(f"non-decomposable aggregate for salted_agg: {expr}")

    return phase1.groupBy(key).agg(*[merge_col(n, c) for n, c in aggs.items()])


ASOF_SCHEMA = "event_id bigint, asof_orderkey bigint"


def asof_join_merge(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Scalable as-of join: latest order at-or-before each event, per user.

    One shuffle on the shared key (user_id == o_custkey), then a sorted
    in-memory merge per group via pandas ``merge_asof`` — O(n log n) per
    group instead of the conditional-join + window O(n*m) blow-up of the
    naive form (kse/queries/relational.py q_join_range_asof, which stays
    as the oracle-checked reference semantics). State per group = one
    user's events+orders — bounded; salt the user if ever not.
    """
    ev = events.select("event_id", F.col("user_id").alias("k"), F.col("ts").alias("ets"))
    od = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey"),
        F.col("o_orderdate").cast("timestamp").alias("ots"),
    )
    ev = ev.withColumn("_side", F.lit(0)).withColumnRenamed("ets", "t")
    od = (
        od.withColumn("_side", F.lit(1))
        .withColumnRenamed("ots", "t")
        .withColumnRenamed("o_orderkey", "event_id")  # unify columns; side disambiguates
    )
    unioned = ev.select("k", "t", "event_id", "_side").unionByName(
        od.select("k", "t", "event_id", "_side")
    )

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        ev_g = pdf[pdf["_side"] == 0][["event_id", "t"]].sort_values(["t", "event_id"])
        od_g = (
            pdf[pdf["_side"] == 1][["event_id", "t"]]
            .rename(columns={"event_id": "asof_orderkey"})
            .sort_values(["t", "asof_orderkey"])
        )
        if ev_g.empty or od_g.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "asof_orderkey": pd.Series(dtype="int64")})
        # latest order at-or-before; ties on t broken by max orderkey
        od_g = od_g.groupby("t", as_index=False).max().sort_values("t")
        merged = pd.merge_asof(
            ev_g, od_g, on="t", direction="backward", allow_exact_matches=True
        )
        out = merged.dropna(subset=["asof_orderkey"])[["event_id", "asof_orderkey"]]
        out["asof_orderkey"] = out["asof_orderkey"].astype("int64")
        return out

    # applyInPandas guarantees each key arrives as ONE complete frame
    # (mapInPandas would split big partitions into Arrow batches and break
    # the per-user merge).
    return unioned.groupBy("k").applyInPandas(per_user, schema=ASOF_SCHEMA)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    *,
    buckets: int = 8,
) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and sorted) by
    ``key``.

    Bucketing is the 100 TB co-located-join layout: both fact tables
    hash-partitioned into the same number of buckets on the join key at
    WRITE time, so every subsequent join/aggregate on that key runs with
    ZERO shuffle — the dominant cost of large⋈large joins simply never
    recurs. Pay the shuffle once when landing data, amortize it over every
    downstream query (lineitem⋈orders on orderkey is the canonical case).
    ``sortBy`` additionally lets SortMergeJoin skip its per-task sort.
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def bucketed_join(spark, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — shuffle-free.

    Requires both tables written via :func:`write_bucketed` with the same
    ``buckets`` count. The physical plan contains no Exchange on either
    side (asserted in tests/test_scale.py); with sorted buckets the SMJ
    sort collapses too.
    """
    return spark.table(left_table).join(spark.table(right_table), key)


def write_partitioned(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Persist ``df`` as a directory-partitioned parquet layout.

    Directory partitioning (``path/col=value/...``) is the 100 TB scan-
    pruning layout: a filter on a partition column prunes whole directories
    at PLANNING time — the files are never listed into the scan, so a
    one-day query over a date-partitioned decade of data reads 0.03% of
    it. Choose low-cardinality, always-filtered columns (event date, lang,
    source); never high-cardinality keys (one directory per user_id would
    melt the file listing). Combine with bucketing inside each partition
    for join co-location.
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
