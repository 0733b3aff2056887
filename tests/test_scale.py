"""Equivalence tests for the scale-pattern library (kse/scale.py): same
answers as the naive forms, different shuffle shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kse.catalog import load
from kse.queries.relational import q_join_range_asof
from kse.scale import asof_join_merge, salted_agg

from .conftest import SF_SMOKE


def test_salted_agg_matches_plain(spark):
    e = load(spark, SF_SMOKE, "events")
    plain = {
        (r.user_id): (r.n, round(r.s, 6), r.mx)
        for r in e.groupBy("user_id")
        .agg(F.count("value").alias("n"), F.sum("value").alias("s"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        (r.user_id): (r.n, round(r.s, 6), r.mx)
        for r in salted_agg(
            e,
            "user_id",
            {"n": F.count("value"), "s": F.sum("value"), "mx": F.max("value")},
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_asof_merge_matches_naive(spark):
    naive = {
        (r.event_id, r.asof_orderkey) for r in q_join_range_asof(spark, SF_SMOKE).collect()
    }
    merged = {
        (r.event_id, r.asof_orderkey)
        for r in asof_join_merge(
            load(spark, SF_SMOKE, "events"), load(spark, SF_SMOKE, "orders")
        ).collect()
    }
    assert merged == naive


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from kse.catalog import load
    from kse.scale import bucketed_join, write_bucketed

    li = load(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(li.withColumnRenamed("l_orderkey", "k"), "t_li_b", "k", buckets=4)
    write_bucketed(o.withColumnRenamed("o_orderkey", "k"), "t_o_b", "k", buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_li_b", "t_o_b", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # same answer as the naive (shuffling) join
        naive = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == naive
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_o_b")


def test_partitioned_layout_prunes_directories(spark, tmp_path):
    import pyspark.sql.functions as F

    from kse.catalog import load
    from kse.scale import write_partitioned

    ev = load(spark, SF_SMOKE, "events")
    out = str(tmp_path / "events_by_type")
    write_partitioned(ev, out, "event_type")
    scan = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200], plan
    # only the purchase partition's files are read
    files = scan.select(F.input_file_name()).distinct().collect()
    assert files and all("event_type=purchase" in r[0] for r in files)
    # values survive the round trip
    n = ev.filter(F.col("event_type") == "purchase").count()
    assert scan.count() == n


def test_layout_buckets_fact_tables_for_shuffle_free_join(spark, tmp_path):
    """prepare_local_layout lands lineitem/orders bucketed on the order key
    (catalog._LAYOUT_BUCKETS): at 100 TB neither side can broadcast, so the
    layout must let the join plan with ZERO Exchange on either join side.
    Broadcast is disabled here to surface exactly that plan."""
    from kse import catalog, registry
    from kse.queries.relational import q_join_inner_hash

    saved_layouts = dict(catalog._LAYOUTS)
    saved_tables = dict(catalog._LAYOUT_TABLES)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        catalog.prepare_local_layout(spark, SF_SMOKE, str(tmp_path / "layout"))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = q_join_inner_hash(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        # the only Exchange allowed is the final 5-group aggregation's; the
        # join itself (everything below the join node) must be shuffle-free
        join_part = plan[plan.index("Join") :]
        assert "Exchange" not in join_part, plan
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        catalog._LAYOUTS.clear()
        catalog._LAYOUTS.update(saved_layouts)
        catalog._LAYOUT_TABLES.clear()
        catalog._LAYOUT_TABLES.update(saved_tables)
        catalog._RELATION_CACHE.clear()
        registry.invalidate_plans(spark=spark)


def test_layout_buckets_events_for_shuffle_free_windows(spark, tmp_path):
    """prepare_local_layout lands events bucketed on user_id: every
    per-user window operator then plans with ZERO Exchange — the bucketed
    scan already satisfies the window's clustering, and even the
    per-(user, session) rollup rides the same distribution."""
    from kse import catalog, registry
    from kse.queries.windows import q_win_sessionize

    saved_layouts = dict(catalog._LAYOUTS)
    saved_tables = dict(catalog._LAYOUT_TABLES)
    try:
        catalog.prepare_local_layout(spark, SF_SMOKE, str(tmp_path / "layout"))
        df = q_win_sessionize(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        assert "Exchange" not in plan, plan
        assert df.count() > 0
    finally:
        catalog._LAYOUTS.clear()
        catalog._LAYOUTS.update(saved_layouts)
        catalog._LAYOUT_TABLES.clear()
        catalog._LAYOUT_TABLES.update(saved_tables)
        catalog._RELATION_CACHE.clear()
        registry.invalidate_plans(spark=spark)
