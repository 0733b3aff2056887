"""Phase/dispatch profile of the three never-profiled weak-ratio ops —
the r10-verdict round-11 items 3 and 4: q_llm_domain_cap (13.4x),
q_llm_dedup_url (12.4x) and q_sql_scd2_incremental (14.2x at 10x).

For each op: the FULL registered query (best-of-N + job count via a job
group) next to its constituent phases materialized alone through the noop
sink, plus the session's measured dispatch floor — so the committed ratio
decomposes into scan work, per-phase plan work, and jobs x dispatch floor.
The verdict's decision rule: if >2 jobs are dispatch-floor, price and
accept with the profile committed; if a real pass is redundant (guide
SS2.4), remove it.

Usage: python tools/opsprofile_r11.py [/tmp/kse-scale10x] [runs=5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kse import catalog, registry  # noqa: E402
from kse.queries._util import t  # noqa: E402
from kse.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kse-scale10x"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_session("kse-ops-profile")
    spark.sparkContext.setLogLevel("ERROR")
    catalog._LAYOUTS.setdefault(sf_dir, sf_dir)
    sc = spark.sparkContext
    qs = registry.all_queries()

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    # ---- q_llm_dedup_url phases ----
    from kse.queries.llm import _URL_SQL

    def url_canon_only():
        d = t(spark, sf_dir, "documents")
        canon = F.regexp_replace(
            F.regexp_replace(F.lower(F.expr(_URL_SQL)), r"\?utm[^#]*$", ""), "/$", ""
        )
        return d.select("doc_id", canon.alias("url"))

    def url_scan_only():
        d = t(spark, sf_dir, "documents")
        return d.select("doc_id", "source")

    # ---- q_llm_domain_cap phases ----
    def cap_scan_only():
        d = t(spark, sf_dir, "documents")
        return d.select("source", "n_chars", "doc_id")

    def cap_window_only():
        d = t(spark, sf_dir, "documents")
        w = Window.partitionBy("source").orderBy(
            F.col("n_chars").desc(), F.col("doc_id")
        )
        return (
            d.select("source", "n_chars", "doc_id")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 200)
        )

    # ---- q_sql_scd2_incremental phases (mirrors scd2_incremental_apply) ----
    from kse.queries.extras import _SCD2_SPLIT

    def scd2_base():
        return t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 7)

    def scd2_hist():
        o = scd2_base()
        return o.filter(
            (F.col("o_orderdate") < F.lit(_SCD2_SPLIT).cast("date"))
            | F.col("o_orderdate").isNull()
        )

    def scd2_delta():
        o = scd2_base()
        return o.filter(F.col("o_orderdate") >= F.lit(_SCD2_SPLIT).cast("date"))

    def scd2_dim_window():
        hist = scd2_hist()
        w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        w_full = (
            Window.partitionBy("o_custkey")
            .orderBy("o_orderdate", "o_orderkey")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        return hist.select(
            "o_custkey",
            F.row_number().over(w).cast("long").alias("version"),
            F.col("o_orderdate").alias("_from"),
            F.lead("o_orderdate").over(w).alias("_to"),
            F.col("o_totalprice").alias("attr_price"),
            F.count(F.lit(1)).over(w_full).alias("_max_v"),
        )

    def scd2_max_v():
        return scd2_hist().groupBy("o_custkey").agg(F.count(F.lit(1)).alias("_max_v"))

    def scd2_first_new():
        return (
            scd2_delta()
            .groupBy("o_custkey")
            .agg(F.min("o_orderdate").alias("_first_new"))
        )

    phases = {
        "floor_one_row": lambda: spark.range(1),
        "url_scan_only": url_scan_only,
        "url_canon_only": url_canon_only,
        "url_full": lambda: qs["q_llm_dedup_url"].fn(spark, sf_dir),
        "cap_scan_only": cap_scan_only,
        "cap_window_only": cap_window_only,
        "cap_full": lambda: qs["q_llm_domain_cap"].fn(spark, sf_dir),
        "scd2_hist_scan": scd2_hist,
        "scd2_delta_scan": scd2_delta,
        "scd2_dim_window": scd2_dim_window,
        "scd2_max_v": scd2_max_v,
        "scd2_first_new": scd2_first_new,
        "scd2_full": lambda: qs["q_sql_scd2_incremental"].fn(spark, sf_dir),
    }
    for fn in phases.values():  # warm (JIT + codegen + page cache)
        mat(fn())
    for name, fn in phases.items():
        samples = []
        n_jobs = 0
        for i in range(runs):
            if i == 0:
                sc.setJobGroup(f"op-{name}", name)
            t0 = time.perf_counter()
            mat(fn())
            samples.append(time.perf_counter() - t0)
            if i == 0:
                try:
                    tracker = sc._jsc.sc().statusTracker()
                    n_jobs = len(tracker.getJobIdsForGroup(f"op-{name}"))
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
