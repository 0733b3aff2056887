"""Runtime evidence that AQE's skew-join split fires.

DESIGN.md and several query docstrings lean on "AQE's skew-join handles
moderate key skew at runtime" as part of the 100 TB posture. This test
demonstrates it instead of asserting it: a join where one key holds 90%
of the left side, forced onto the sort-merge path, with the skew
thresholds lowered to the test's data size — the FINAL adaptive plan
must show the skewed partition split (``skew=true`` on the join node)
and the answer must be unchanged.

Two findings from building this are themselves the lesson:

- Column pruning nearly defeated the demo: with the payload column
  pruned above the join, the hot partition was 360k near-identical
  longs that shuffle-compressed under the skew byte threshold — skew
  detection operates on COMPRESSED shuffle bytes, so low-entropy hot
  keys look smaller than their row counts suggest.
- With an aggregation downstream of the join, OptimizeSkewedJoin skips
  by default: splitting a partition breaks the join's co-partitioning,
  which would force an extra shuffle before the agg. On a cluster you
  either accept that trade with
  ``spark.sql.adaptive.forceOptimizeSkewedJoin`` (as here) or the skew
  handling applies only when the join is stage-final.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_SKEW_CONF = {
    # force the sort-merge path (broadcast would hide the skew machinery)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # lower the skew thresholds to toy-data scale: a partition counts as
    # skewed when > factor * median AND > threshold bytes
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "128KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    # the downstream agg would otherwise veto the split (see module doc)
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}


def test_aqe_splits_the_skewed_partition(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONF}
    try:
        for k, v in _SKEW_CONF.items():
            spark.conf.set(k, v)
        # left: 400k rows, 90% on key 0, with a HIGH-ENTROPY payload so
        # the hot partition's compressed shuffle size crosses the
        # threshold (a constant payload compresses to almost nothing)
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.md5(F.col("id").cast("string")).alias("v"),
        )
        right = spark.range(0, 4_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = left.join(right, "k").groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("w").alias("sw"),
            F.max("v").alias("mv"),  # keeps the payload un-pruned
        )
        rows = joined.collect()
        # the FINAL adaptive plan (available after execution) must carry
        # the skew=true marker on the sort-merge join node
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
        # correctness is unchanged by the split
        by_key = {r["k"]: (r["n"], r["sw"]) for r in rows}
        assert by_key[0] == (360_000, 0)
        assert len(by_key) == 1 + 4_000 // 10  # key 0 + surviving tail keys
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
