"""Phase profile of the percentile dist-twins at the 10x tier — the
r9-verdict contingency "if disc_dist/winsorize still read >8x clean,
profile the extra pass".

Times, per query: (a) pass 1 alone (the long explode + histogram
aggregate materialized through noop), (b) the full query, and (c) the
job count per full run (statusTracker over a job group) — so the gap
decomposes into pass-1 scan work, pass-2+election work, and per-job
dispatch floor. Best-of-N each, interleaved.

Usage: python tools/pctl_profile.py [/tmp/kse-scale10x] [runs=3]
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
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session("kse-pctl-profile")
    spark.sparkContext.setLogLevel("ERROR")
    catalog._LAYOUTS.setdefault(sf_dir, sf_dir)
    sc = spark.sparkContext
    qs = registry.all_queries()

    from kse.queries.relational import _pctl_bucket, _pctl_histogram

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    def long_disc():
        li = t(spark, sf_dir, "lineitem")
        return (
            li.select(
                "l_linestatus",
                F.explode(
                    F.array(
                        F.struct(
                            F.lit("qty").alias("m"),
                            F.col("l_quantity").cast("double").alias("val"),
                        ),
                        F.struct(
                            F.lit("price").alias("m"),
                            F.col("l_extendedprice").cast("double").alias("val"),
                        ),
                    )
                ).alias("e"),
            )
            .select(
                F.col("l_linestatus").alias("grp"),
                F.col("e.m").alias("m"),
                F.col("e.val").alias("val"),
            )
            .filter(F.col("val").isNotNull())
        )

    def long_wins():
        e = t(spark, sf_dir, "events")
        return e.select(
            F.col("event_type").alias("grp"),
            F.lit("v").alias("m"),
            F.col("value").alias("val"),
        ).filter(F.col("val").isNotNull())

    phases = {
        "disc_pass1_hist": lambda: _pctl_histogram(
            long_disc().withColumn("bkt", _pctl_bucket(F.col("val")))
        ),
        "disc_full": lambda: qs["q_agg_percentile_disc_dist"].fn(spark, sf_dir),
        "wins_pass1_hist": lambda: _pctl_histogram(
            long_wins().withColumn("bkt", _pctl_bucket(F.col("val")))
        ),
        "wins_full": lambda: qs["q_agg_winsorize_dist"].fn(spark, sf_dir),
        "pareto_full": lambda: qs["q_agg_pareto_dist"].fn(spark, sf_dir),
        "cont_full": lambda: qs["q_agg_percentile_dist"].fn(spark, sf_dir),
    }
    for fn in phases.values():  # warm
        mat(fn())
    for name, fn in phases.items():
        samples = []
        n_jobs = 0
        for i in range(runs):
            if i == 0:
                sc.setJobGroup(f"pp-{name}", name)
            t0 = time.perf_counter()
            mat(fn())
            samples.append(time.perf_counter() - t0)
            if i == 0:
                try:
                    tracker = sc._jsc.sc().statusTracker()
                    n_jobs = len(tracker.getJobIdsForGroup(f"pp-{name}"))
                except Exception:
                    n_jobs = -1
                sc.setJobGroup(None, None)
        ss = sorted(samples)
        print(
            f"{name}: best {ss[0]*1000:.0f} ms, median {ss[len(ss)//2]*1000:.0f} ms, "
            f"jobs {n_jobs}"
        )


if __name__ == "__main__":
    main()
