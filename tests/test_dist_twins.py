"""Twin-equivalence tests: each *_dist / *_scaled scale twin must return
exactly what its canonical operator returns (the twins exist to change
the EXECUTION shape — bounded memory, bucketed parallelism, bounded
candidate sets — never the answer). The adversarial parity batteries
prove the same equivalence against DuckDB on hostile data; these pins
keep the pair glued together in-suite."""

from __future__ import annotations

from kse.queries.llm import (
    q_llm_dedup_simhash_hamming,
    q_llm_dedup_simhash_scaled,
)
from kse.queries.extras import (
    q_agg_pareto,
    q_agg_pareto_dist,
    q_agg_percentile_disc,
    q_agg_winsorize,
    q_agg_winsorize_dist,
)
from kse.queries.relational import (
    q_agg_percentile,
    q_agg_percentile_dist,
    q_agg_percentile_disc_dist,
)
from kse.queries.windows import q_win_ntile_percent, q_win_ntile_percent_dist

from .conftest import SF_SMOKE


def _rows(df, key_cols):
    return sorted(
        (tuple(r[c] for c in df.columns) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t[: len(key_cols)]),
    )


def test_ntile_percent_dist_matches_window_form(spark):
    a = q_win_ntile_percent(spark, SF_SMOKE)
    b = q_win_ntile_percent_dist(spark, SF_SMOKE)
    assert _rows(a, ["o_orderkey"]) == _rows(b, ["o_orderkey"])


def test_percentile_dist_matches_buffering_aggregate(spark):
    a = q_agg_percentile(spark, SF_SMOKE)
    b = q_agg_percentile_dist(spark, SF_SMOKE)
    assert _rows(a, ["l_returnflag"]) == _rows(b, ["l_returnflag"])


def test_percentile_disc_dist_matches_buffering_aggregate(spark):
    a = q_agg_percentile_disc(spark, SF_SMOKE)
    b = q_agg_percentile_disc_dist(spark, SF_SMOKE)
    assert _rows(a, ["l_linestatus"]) == _rows(b, ["l_linestatus"])


def test_pareto_dist_matches_global_window(spark):
    a = q_agg_pareto(spark, SF_SMOKE)
    b = q_agg_pareto_dist(spark, SF_SMOKE)
    assert _rows(a, ["n_top_customers"]) == _rows(b, ["n_top_customers"])


def test_winsorize_dist_matches_buffering_bounds(spark):
    a = q_agg_winsorize(spark, SF_SMOKE)
    b = q_agg_winsorize_dist(spark, SF_SMOKE)
    assert _rows(a, ["event_type"]) == _rows(b, ["event_type"])


def test_simhash_scaled_matches_4x15_pigeonhole(spark):
    a = q_llm_dedup_simhash_hamming(spark, SF_SMOKE)
    b = q_llm_dedup_simhash_scaled(spark, SF_SMOKE)
    assert _rows(a, ["doc_id"]) == _rows(b, ["doc_id"])


# ---------------------------------------------------------------------------
# Hostile in-suite fixture (r6 advisor item): the edges the twins engineer
# for — NaN/±Inf values, NULL group/partition keys, partitions with n < 4
# (ntile underfill) — pinned by pytest, not only by the out-of-suite
# adversarial batteries. A tiny synthetic sf_dir with exactly those rows.


import pytest
from pyspark.sql import functions as F

from kse.catalog import load

NAN, INF = float("nan"), float("inf")


@pytest.fixture(scope="module")
def hostile_sf(spark, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("hostile-sf"))

    def poison(df, **overrides):
        return df.limit(1).select(
            *[
                F.lit(overrides[c]).cast(df.schema[c].dataType).alias(c)
                if c in overrides
                else F.col(c)
                for c in df.columns
            ]
        )

    for name, hazards in {
        # percentile twins group by l_returnflag / l_linestatus over the
        # value columns: NULL keys, NaN/±Inf values, and 2-3-row groups
        "lineitem": [
            dict(l_returnflag=None, l_linestatus=None, l_quantity=NAN),
            dict(l_returnflag="Z", l_quantity=INF, l_extendedprice=-INF),
            dict(l_returnflag="Z", l_quantity=-INF, l_discount=NAN),
            dict(l_returnflag=None, l_quantity=None, l_extendedprice=NAN),
        ],
        # pareto twins: NULL customer key, NaN / ±Inf revenue; ntile twin
        # partitions orders — the 3-row base slice underfills every tile
        "orders": [
            dict(o_custkey=None, o_totalprice=NAN),
            dict(o_custkey=7777, o_totalprice=INF),
            dict(o_custkey=7778, o_totalprice=-INF),
            dict(o_custkey=7779, o_totalprice=None),
        ],
        # winsorize twins: NULL event_type group, NaN/±Inf values, and an
        # all-NULL-value group ("ghost") that must keep NULL bounds
        "events": [
            dict(event_type=None, value=NAN),
            dict(event_type="ghost", value=None),
            dict(event_type="click", value=INF),
            dict(event_type="click", value=-INF),
        ],
        # simhash twins: NULL / empty / whitespace / non-ASCII text
        "documents": [
            dict(doc_id=900001, text=None),
            dict(doc_id=900002, text=""),
            dict(doc_id=900003, text="   "),
            dict(doc_id=900004, text="émoji 🚀 émoji 🚀 émoji 🚀"),
        ],
    }.items():
        base = load(spark, SF_SMOKE, name).limit(3)
        df = base
        for hz in hazards:
            df = df.unionByName(poison(base, **hz))
        df.coalesce(1).write.mode("overwrite").parquet(f"{dest}/{name}.parquet")
    return dest


def _rows_full(df):
    """Full-row canonical form: NaN normalized to a sentinel (NaN != NaN
    would fail tuple equality) and a None/str-safe TOTAL sort — the
    poison rows clone base keys, so per-key sorting is ambiguous."""
    def norm(v):
        if isinstance(v, float) and v != v:
            return "NaN"
        return v

    rows = [tuple(norm(v) for v in r) for r in df.collect()]
    return sorted(rows, key=lambda t: tuple((v is None, str(v)) for v in t))


def test_twins_agree_on_hostile_fixture(spark, hostile_sf):
    pairs = [
        (q_win_ntile_percent, q_win_ntile_percent_dist, ["o_orderkey"]),
        (q_agg_percentile, q_agg_percentile_dist, ["l_returnflag"]),
        (q_agg_percentile_disc, q_agg_percentile_disc_dist, ["l_linestatus"]),
        (q_agg_pareto, q_agg_pareto_dist, ["n_top_customers"]),
        (q_agg_winsorize, q_agg_winsorize_dist, ["event_type"]),
        (q_llm_dedup_simhash_hamming, q_llm_dedup_simhash_scaled, ["doc_id"]),
    ]
    for canon, twin, _keys in pairs:
        a = _rows_full(canon(spark, hostile_sf))
        b = _rows_full(twin(spark, hostile_sf))
        assert a == b, f"{twin.__name__} diverged from {canon.__name__}: {a} != {b}"


def test_pctl_histogram_partial_agg(spark):
    """Pass 1 of the percentile twins' rank election must combine
    map-side (partial_count): the final query plan only shows the
    checkpointed scan of the histogram (PLANS.md asserts that), so the
    map-side-combine property of the histogram build itself is pinned
    here, on the pre-checkpoint frame."""
    from pyspark.sql import functions as F

    from kse.queries.relational import _pctl_bucket, _pctl_histogram

    long = (
        spark.range(100)
        .select(
            (F.col("id") % 3).cast("string").alias("grp"),
            F.lit("v").alias("m"),
            (F.col("id") * 1.5).alias("val"),
        )
        .withColumn("bkt", _pctl_bucket(F.col("val")))
    )
    plan = _pctl_histogram(long)._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, plan
