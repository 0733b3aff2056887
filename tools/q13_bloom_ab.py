"""q_tpch_q13 Bloom-filter pre-filter A/B — r10-verdict round-11 item 5.

The one guide lever (SS3.2) never measured on q13: drop definitely-
non-matching rows from the fact side (orders) BEFORE its aggregate's
shuffle, using the customer keys. Two forms are measured against the
registered aggregate-before-join plan:

- semi: the PySpark manual approximation (guide SS3.2: "approximate with a
  broadcast semi-join on the distinct keys when they fit") — orders
  left-semi joined to broadcast(customer keys) before the per-customer
  count.
- auto: Spark's own runtime Bloom-filter injection
  (spark.sql.optimizer.runtime.bloomFilter.enabled with the creation-side
  threshold raised) — the plan is checked for might_contain to see whether
  it fires at all on this shape.

Parity is asserted first (sorted collect must be identical); timing is
interleaved best-of-N through the noop sink. Expected outcome, stated
up front so the A/B is honest: orders.o_custkey is a foreign key into
customer (FIXTURES.md), so a filter over ALL customer keys prunes ~zero
rows — the lever only wins when most fact rows have no match (SS3.2).

Usage: python tools/q13_bloom_ab.py [/tmp/kse-scale10x] [runs=5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kse import catalog, registry  # noqa: E402
from kse.queries._util import t  # noqa: E402
from kse.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kse-scale10x"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_session("kse-q13-bloom-ab")
    spark.sparkContext.setLogLevel("ERROR")
    catalog._LAYOUTS.setdefault(sf_dir, sf_dir)
    qs = registry.all_queries()

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    def registered():
        return qs["q_tpch_q13"].fn(spark, sf_dir)

    def semi_prefilter():
        c = t(spark, sf_dir, "customer")
        o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
        keys = c.select(F.col("c_custkey").alias("o_custkey"))
        o = o.join(F.broadcast(keys), "o_custkey", "left_semi")
        per_cust = o.groupBy("o_custkey").agg(F.count("o_orderkey").alias("n"))
        counts = c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").select(
            F.coalesce("n", F.lit(0)).alias("c_count")
        )
        return counts.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))

    # parity first: both variants must return identical rows
    a = sorted(map(tuple, registered().collect()))
    b = sorted(map(tuple, semi_prefilter().collect()))
    assert a == b, f"parity FAILED: {len(a)} vs {len(b)} rows"
    print(f"# parity OK: {len(a)} identical rows")

    # does Spark's automatic runtime Bloom filter fire on this shape?
    prev = spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "256MB"
    )
    plan = registered()._jdf.queryExecution().executedPlan().toString()
    fired = "might_contain" in plan
    print(f"# auto runtime bloom filter in plan: {fired}")

    variants = {"registered": registered, "semi_prefilter": semi_prefilter}
    for fn in variants.values():  # warm
        mat(fn())
        mat(fn())
    best: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(runs):  # interleaved
        for name, fn in variants.items():
            t0 = time.perf_counter()
            mat(fn())
            best[name].append(time.perf_counter() - t0)
    for name, samples in best.items():
        ss = sorted(samples)
        print(
            f"{name}: best {ss[0]*1000:.0f} ms, median {ss[len(ss)//2]*1000:.0f} ms"
        )
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", prev)


if __name__ == "__main__":
    main()
