"""The dsum three-band determinism device (kse/queries/_util.py).

Round-5 advisor finding: the old device fell back to a plain IEEE double
sum for ANY |x| > 9e9, including huge-but-FINITE values whose group sum
does not overflow — there the result is order-dependent under Spark's
partial aggregation and need not bit-match DuckDB's sequential sum. The
fix adds an exact DECIMAL(38,0) micro/unit band for finite 9e9..9e15 and
restricts the plain-IEEE fallback to non-finite / absorption-band groups.

These tests pin the device head-to-head against its dsum_sql twin on
BOTH engines (DuckDB oracle AND spark.sql of the same text — the device
is dialect-shared), across repartitionings (order independence), for
every band and boundary, including the decimal->double 2^53 split that
works around DuckDB's misrounded int128->double cast.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from kse.queries._util import dsum, dsum_sql

CASES = {
    "hot": [0.5, 123.45, -67.89, 0.000001],
    "hot_edge": [9.0e9, -9.0e9],
    "wide_mid": [1e10 + 0.25, -7.25e10, 3.5, 0.125],
    "wide_unit": [5.0e14, 9.0e12 + 1024.0, -2.5e13, 42.5],
    "mixed_wide": [8.999e9, 9.001e9, 9.001e12, 1.5, None],
    # the advisor's case: one 1e10 among small values — old device was
    # order-dependent here, new device is exact (10000000001.3)
    "advisor": [1e10, 0.1, 0.2, 0.3, 0.7],
    # group total past 2^53 micro units: exercises the split conversion
    "big_total": [8.9e15, 8.9e15, 8.9e15, 0.125],
    "nan": [float("nan"), 1.0, 2.0],
    "inf": [float("inf"), -5.0],
    "neg_inf_pair": [float("inf"), float("-inf"), 3.0],
    "huge_finite": [1.5e308, 2.0, -3.0],
    "absorb": [9.1e15, 1.0],
    "nulls": [None, None],
    "only_wide": [None, 4.2e13],
    "band_edges": [-9.0e9, 9.0e9, -9.0e12, 9.0e12, -9.0e15, 9.0e15],
    "neg_total": [-5.0e14, -9.0e12 - 1024.0, 2.5e13, -42.5],
    "neg_zero": [-0.0, 0.0],
    "denormal": [5e-324, -2.5e-308, 1.0],
}


def _same(a, b):
    if a is None or b is None:
        return a is None and b is None
    if math.isnan(a) or math.isnan(b):
        return math.isnan(a) and math.isnan(b)
    return a == b


@pytest.fixture(scope="module")
def band_df(spark):
    rows = [(g, v) for g, vals in CASES.items() for v in vals]
    return spark.createDataFrame(rows, "g string, x double")


def _spark_results(band_df, npart):
    rows = (
        band_df.repartition(npart)
        .groupBy("g")
        .agg(dsum(F.col("x"), "s"))
        .collect()
    )
    return {r.g: r.s for r in rows}


def test_dsum_order_independent_across_partitionings(band_df):
    base = _spark_results(band_df, 1)
    for npart in (3, 16):
        got = _spark_results(band_df, npart)
        for g in base:
            assert _same(base[g], got[g]), (g, base[g], got[g])


def test_dsum_matches_duckdb_oracle_per_band(band_df):
    spark_res = _spark_results(band_df, 7)
    con = duckdb.connect()
    con.execute("CREATE TABLE tt (g VARCHAR, x DOUBLE)")
    con.executemany(
        "INSERT INTO tt VALUES (?, ?)",
        [(g, v) for g, vals in CASES.items() for v in vals],
    )
    oracle = dict(
        con.execute(
            f"SELECT g, {dsum_sql('x')} AS s FROM tt GROUP BY g"
        ).fetchall()
    )
    for g in spark_res:
        assert _same(spark_res[g], oracle[g]), (g, spark_res[g], oracle[g])
    # the advisor's case lands on the exact value, not an IEEE association
    assert spark_res["advisor"] == 10000000001.3


def test_dsum_sql_text_is_dialect_shared(spark, band_df):
    """The generated device text runs on Spark SQL itself and agrees with
    the DataFrame expression bit-for-bit (SQL-path queries interpolate
    the same text into Spark-executed statements)."""
    band_df.createOrReplaceTempView("dsum_tt")
    via_sql = {
        r.g: r.s
        for r in spark.sql(
            f"SELECT g, {dsum_sql('x')} AS s FROM dsum_tt GROUP BY g"
        ).collect()
    }
    via_api = _spark_results(band_df, 5)
    for g in via_api:
        assert _same(via_api[g], via_sql[g]), (g, via_api[g], via_sql[g])


def test_dsum_sql_filter_variant(spark, band_df):
    """FILTER (WHERE ...) threads through every aggregate in the device
    (the pivot-cell form)."""
    band_df.createOrReplaceTempView("dsum_tt")
    filt = dsum_sql("x", "g = 'advisor'")
    got = spark.sql(f"SELECT {filt} AS s FROM dsum_tt").collect()[0].s
    assert got == 10000000001.3
    con = duckdb.connect()
    con.execute("CREATE TABLE tt (g VARCHAR, x DOUBLE)")
    con.executemany(
        "INSERT INTO tt VALUES (?, ?)",
        [(g, v) for g, vals in CASES.items() for v in vals],
    )
    assert con.execute(f"SELECT {filt} FROM tt").fetchone()[0] == got
