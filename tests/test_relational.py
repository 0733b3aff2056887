"""Hand-computed unit tests + algebraic property checks (SURVEY.md §5.3-5.4)
on tiny inline DataFrames — independent of the DuckDB oracle harness.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kse.catalog import load
from kse.queries.relational import q_join_range_asof, q_topk_per_group

from .conftest import SF_SMOKE


def test_join_semantics_inline(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    right = spark.createDataFrame([(1, 10.0), (1, 20.0), (4, 40.0)], "k long, w double")
    assert left.join(right, "k", "inner").count() == 2
    assert left.join(right, "k", "left").count() == 4  # k=1 doubled, 2/3 null-extended
    assert left.join(right, "k", "left_semi").count() == 1
    assert sorted(r.k for r in left.join(right, "k", "left_anti").collect()) == [2, 3]
    assert left.join(right, "k", "full").count() == 5


def test_set_algebra_identities(spark):
    a = spark.range(0, 10).select(F.col("id"))
    b = spark.range(5, 15).select(F.col("id"))
    assert a.union(b).count() == 20
    assert a.union(b).distinct().count() == 15
    assert a.intersect(b).count() == 5
    assert a.subtract(b).count() == 5
    # (A except B) union (A intersect B) == A  (distinct semantics)
    rebuilt = a.subtract(b).union(a.intersect(b)).distinct()
    assert sorted(r.id for r in rebuilt.collect()) == list(range(10))


def test_window_sum_equals_groupby_sum(spark):
    """Consistency: final running-sum value per key == group sum."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (1, 3.0), (2, 10.0)], "k long, v double"
    )
    w = Window.partitionBy("k").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    last = (
        df.withColumn("run", F.sum("v").over(w))
        .groupBy("k")
        .agg(F.max("run").alias("final_run"))
    )
    grp = df.groupBy("k").agg(F.sum("v").alias("s"))
    joined = last.join(grp, "k").collect()
    for r in joined:
        assert r.final_run == r.s


def test_topk_per_group_bounds(spark):
    out = q_topk_per_group(spark, SF_SMOKE)
    per_group = out.groupBy("o_custkey").count().agg(F.max("count")).collect()[0][0]
    assert per_group <= 3
    assert out.filter(F.col("rn") > 3).count() == 0


def test_asof_join_picks_latest_prior(spark):
    out = q_join_range_asof(spark, SF_SMOKE)
    events = load(spark, SF_SMOKE, "events")
    orders = load(spark, SF_SMOKE, "orders")
    # every matched event maps to exactly one order
    assert out.groupBy("event_id").count().filter("count > 1").count() == 0
    # spot-check one event: the chosen order is the max orderdate among its user's orders
    sample = out.limit(1).collect()[0]
    e = events.filter(F.col("event_id") == sample.event_id).collect()[0]
    user_orders = orders.filter(
        (F.col("o_custkey") == e.user_id) & (F.col("o_orderdate") <= e.ts)
    )
    max_date = user_orders.agg(F.max("o_orderdate")).collect()[0][0]
    chosen = user_orders.filter(F.col("o_orderkey") == sample.asof_orderkey).collect()[0]
    assert chosen.o_orderdate == max_date


def test_sample_deterministic_with_seed(spark):
    e = load(spark, SF_SMOKE, "events")
    s1 = sorted(r.event_id for r in e.sample(False, 0.1, 42).select("event_id").collect())
    s2 = sorted(r.event_id for r in e.sample(False, 0.1, 42).select("event_id").collect())
    assert s1 == s2
    assert 0.03 < len(s1) / 1000 < 0.25  # fraction in a sane band


def test_approx_percentile_close_to_exact(spark):
    """percentile_approx (GK sketch) stays within 1% relative error of the
    exact per-group percentiles — the accuracy contract that justifies the
    sketch swap at scale."""
    from kse.queries.relational import q_agg_approx_percentile, q_agg_percentile

    exact = {r.l_returnflag: r for r in q_agg_percentile(spark, SF_SMOKE).collect()}
    approx = {r.l_returnflag: r for r in q_agg_approx_percentile(spark, SF_SMOKE).collect()}
    assert set(exact) == set(approx)
    for k in exact:
        for fld in ("p50", "p90", "q1_qty"):
            e, a = getattr(exact[k], fld), getattr(approx[k], fld)
            assert abs(a - e) <= 0.01 * abs(e) + 1e-9, (k, fld, e, a)


def test_downsample_ohlc_bounds(spark):
    """OHLC invariant: lo <= open, close <= hi in every bucket, and bucket
    counts sum to the table row count."""
    from kse.queries.extras import q_ts_downsample

    rows = q_ts_downsample(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["lo"] <= r["open"] <= r["hi"]
        assert r["lo"] <= r["close"] <= r["hi"]
    n_events = load(spark, SF_SMOKE, "events").count()
    assert sum(r["n"] for r in rows) == n_events


def test_unpivot_roundtrip(spark):
    """Unpivot of the pivoted counts equals the direct long-form group-by."""
    from kse.queries.extras import q_agg_unpivot

    got = {
        (r["l_returnflag"], r["l_linestatus"]): r["n"]
        for r in q_agg_unpivot(spark, SF_SMOKE).collect()
    }
    want = {
        (r["l_returnflag"], r["l_linestatus"]): r["n"]
        for r in load(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def _write_planted_events(tmp_path, rows):
    """rows: (event_id, iso_ts, user_id, event_type). Returns sf_dir."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [1.0] * len(rows),
            "props": ['{"k": 1}'] * len(rows),
        }
    )
    sf_dir = tmp_path / "planted_events_sf"
    sf_dir.mkdir()
    pdf.to_parquet(sf_dir / "events.parquet", index=False)
    return str(sf_dir)


def test_funnel_planted_orderings(spark, tmp_path):
    """Conversion requires click -> view -> purchase IN ORDER (gaps
    allowed); the same types out of order must not convert."""
    from kse import catalog
    from kse.queries.windows import q_win_funnel

    sf_dir = _write_planted_events(
        tmp_path,
        [
            (1, "2024-01-01T10:00:00", 1, "click"),
            (2, "2024-01-01T10:01:00", 1, "error"),
            (3, "2024-01-01T10:02:00", 1, "view"),
            (4, "2024-01-01T10:03:00", 1, "purchase"),
            (5, "2024-01-01T10:00:00", 2, "purchase"),
            (6, "2024-01-01T10:01:00", 2, "view"),
            (7, "2024-01-01T10:02:00", 2, "click"),
            (8, "2024-01-01T10:00:00", 3, "click"),
            (9, "2024-01-01T10:01:00", 3, "view"),
        ],
    )
    got = {r.user_id: r.converted for r in q_win_funnel(spark, sf_dir).collect()}
    assert got == {1: True, 2: False, 3: False}
    catalog._RELATION_CACHE.pop((id(spark), sf_dir, "events"), None)


def test_burst_planted_window(spark, tmp_path):
    """Events within +/-5 minutes of each other count as nearby — across
    band-bucket boundaries too; isolated events yield no row."""
    from kse import catalog
    from kse.queries.extras import q_ts_burst

    sf_dir = _write_planted_events(
        tmp_path,
        [
            (1, "2024-01-01T10:00:00", 1, "click"),
            (2, "2024-01-01T10:01:00", 1, "view"),
            (3, "2024-01-01T10:04:30", 1, "click"),
            (4, "2024-01-01T12:00:00", 1, "view"),  # isolated
            (5, "2024-01-01T10:00:30", 2, "click"),  # other user, same times
        ],
    )
    got = {r.event_id: r.n_nearby for r in q_ts_burst(spark, sf_dir).collect()}
    # 1 is near 2 and 3; 2 near 1 and 3; 3 near 1 and 2 (4:30 gap < 5min)
    assert got == {1: 2, 2: 2, 3: 2}
    catalog._RELATION_CACHE.pop((id(spark), sf_dir, "events"), None)


def test_lateral_join_top2_per_customer(spark):
    from kse.queries.extras import q_join_lateral

    rows = q_join_lateral(spark, SF_SMOKE).collect()
    orders = load(spark, SF_SMOKE, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    ).collect()
    by_cust: dict[int, list] = {}
    for r in orders:
        by_cust.setdefault(r.o_custkey, []).append(r)
    got: dict[int, set] = {}
    for r in rows:
        got.setdefault(r.c_custkey, set()).add((r.o_orderkey, r.o_totalprice))
    for cust, pairs in got.items():
        assert len(pairs) <= 2
        expect = sorted(
            by_cust[cust], key=lambda o: (-o.o_totalprice, o.o_orderkey)
        )[:2]
        assert pairs == {(o.o_orderkey, o.o_totalprice) for o in expect}


def test_variant_extraction_matches_json_string_path(spark):
    from kse.queries.functions import q_fn_variant

    res = q_fn_variant(spark, SF_SMOKE)
    ev = load(spark, SF_SMOKE, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_ref"),
        "user_id",
        "event_type",
    )
    j = res.join(ev, "event_id")
    assert j.filter(
        (F.col("k") != F.col("k_ref"))
        | (F.col("u") != F.col("user_id"))
        | (F.col("tag0") != F.col("event_type"))
    ).count() == 0


def test_scd2_incremental_equals_full_rebuild(spark):
    """The incremental SCD2 apply (historical batch + delta batch split at
    a date boundary) must be row-for-row identical to rebuilding the
    dimension from the whole change feed — q_sql_scd2 IS that full
    rebuild over the same feed, so the two queries must agree exactly."""
    from kse.queries.extras import q_sql_scd2, q_sql_scd2_incremental

    from .conftest import SF_T2

    full = {tuple(r) for r in q_sql_scd2(spark, SF_T2).collect()}
    inc = {tuple(r) for r in q_sql_scd2_incremental(spark, SF_T2).collect()}
    assert full == inc
    assert len(full) > 0


def test_scd2_incremental_equals_rebuild_for_every_split(spark):
    """Sweep the batch boundary: mid-feed splits, a split before all data
    (everything is delta — the bootstrap case) and after all data
    (everything is history — the no-op apply). Every one must reproduce
    the full rebuild exactly."""
    from kse.queries.extras import q_sql_scd2, scd2_incremental_apply

    from .conftest import SF_T2

    full = {tuple(r) for r in q_sql_scd2(spark, SF_T2).collect()}
    for split in ("1990-01-01", "1996-06-15", "1999-01-01", "2005-01-01"):
        inc = {
            tuple(r) for r in scd2_incremental_apply(spark, SF_T2, split).collect()
        }
        assert inc == full, f"split {split} diverged from rebuild"
