"""Unit pins for the --extreme battery's engine-side fix classes.

The parity battery proves ORACLE parity on extreme data; these tests pin
the ENGINE semantics directly, so the two silent-corruption bugs it
found can never come back quietly:

1. Spark's ``floor(double)`` is a saturating java cast — ``floor(Inf)``
   is Long.MAX and ``floor(NaN)`` is **0** — so an unguarded micro-unit
   sum silently drops NaN rows and turns Inf into 9.2e12. ``_util.dsum``
   must instead propagate non-finite values IEEE-style.
2. The banded theta join emitted bands {b, floor((lo+W)/W)}; floating
   addition can round lo+W up ONTO a band boundary (lo = 500-3e-14 →
   lo+500 == 1000.0 exactly), making that pair {b, b+2} and silently
   skipping band b+1 — where almost the whole interval lives.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def _one(df):
    return df.collect()[0][0]


class TestDsumGuard:
    def test_finite_groups_stay_micro_exact(self, spark):
        from kse.queries._util import dsum

        df = spark.createDataFrame([(1.1,), (2.2,), (3.3,)], "x double")
        assert _one(df.agg(dsum(F.col("x"), "s"))) == 6.6

    def test_nan_propagates_instead_of_vanishing(self, spark):
        # the bug: floor(NaN) == 0, so NaN rows silently summed as 0.0
        from kse.queries._util import dsum

        df = spark.createDataFrame([(1.5,), (float("nan"),)], "x double")
        assert math.isnan(_one(df.agg(dsum(F.col("x"), "s"))))

    def test_inf_propagates_instead_of_saturating(self, spark):
        # the bug: floor(Inf) == Long.MAX, so the sum came back 9.2e12
        from kse.queries._util import dsum

        df = spark.createDataFrame([(1.5,), (float("inf"),)], "x double")
        assert _one(df.agg(dsum(F.col("x"), "s"))) == float("inf")

    def test_huge_finite_falls_back_to_ieee_sum(self, spark):
        # 1.5e308 is finite but its micro-quantization overflows BIGINT;
        # the group must take the plain-sum path (overflowing to Inf is
        # the IEEE answer for 2×1.5e308, identical on both engines)
        from kse.queries._util import dsum

        df = spark.createDataFrame([(1.5e308,), (1.5e308,)], "x double")
        assert _one(df.agg(dsum(F.col("x"), "s"))) == float("inf")

    def test_null_only_group_is_null(self, spark):
        from kse.queries._util import dsum

        df = spark.createDataFrame([(None,), (None,)], "x double")
        assert _one(df.agg(dsum(F.col("x"), "s"))) is None


class TestThetaBandBoundary:
    def test_fp_rounded_boundary_band_is_covered(self, spark, tmp_path):
        """lo = 500 - 3e-14: lo+500 rounds to exactly 1000.0, so the old
        two-band form joined bands {0, 2} and missed every part in band
        1 — including p = 750, squarely inside [lo, lo+500]."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kse import catalog, registry

        lo = 500.0 - 3e-14
        assert lo < 500.0 and lo + 500.0 == 1000.0  # the FP pathology

        sf = tmp_path / "sf"
        sf.mkdir()
        (sf / "supplier.parquet").mkdir()
        pq.write_table(
            pa.table(
                {
                    "s_suppkey": pa.array([1], pa.int64()),
                    "s_name": ["s1"],
                    "s_nationkey": pa.array([0], pa.int32()),
                    "s_acctbal": pa.array([lo], pa.float64()),
                }
            ),
            str(sf / "supplier.parquet" / "part-0.parquet"),
        )
        (sf / "part.parquet").mkdir()
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2, 3], pa.int64()),
                    "p_name": ["a", "b", "c"],
                    "p_brand": ["B", "B", "B"],
                    "p_type": ["T", "T", "T"],
                    "p_size": pa.array([1, 1, 1], pa.int32()),
                    # in-band, in-band (the skipped middle band), out
                    "p_retailprice": pa.array([600.0, 750.0, 1500.0], pa.float64()),
                }
            ),
            str(sf / "part.parquet" / "part-0.parquet"),
        )
        try:
            out = (
                registry.all_queries()["q_join_theta_banded"]
                .fn(spark, str(sf))
                .collect()
            )
            assert len(out) == 1
            # both 600.0 (band 1) and 750.0 (band 1) are within
            # [lo, lo+500]; 1500.0 is not
            assert out[0]["n_parts"] == 2
        finally:
            for tbl in catalog.SCHEMAS:
                catalog._RELATION_CACHE.pop((id(spark), str(sf), tbl), None)
            registry.invalidate_plans(str(sf), spark)
