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
