"""A/B: the dsum device's band-detector aggregates — counts vs max-code.

The flagship q_agg_groupby spends ~40% of its 10x-tier time in the dsum
exactness device (plain-sum twin 276 ms vs full query 455 ms, this tool's
profile mode). Each dsum runs FIVE aggregate expressions: two band
detectors (count of out-of-domain rows, count of wide-band rows) plus the
three band sums (BIGINT micro, DECIMAL(38,0) wide, plain IEEE fallback).
Hypothesis under test: folding the two detector counts into ONE
``max(CASE band-code)`` aggregate (2 = out-of-domain, 1 = wide, 0 = hot)
shaves an aggregate buffer and a per-row CASE per dsum.

MEASURED RESULT (r11, 10x tier, interleaved best-of-7, parity asserted on
all 6 rows first): the max-code variant is ~80% SLOWER —

    current (counts)   best 393-473 ms   median 432-568 ms
    max-band-code      best 725-766 ms   median 802-825 ms

Reading: the detector counts are ``count(CASE WHEN <between> THEN 1 END)``
— a codegen-friendly conditional count whose predicate short-circuits per
band, while the 3-branch CASE inside max() evaluates the full band
classification (3 BETWEENs) on every row AND adds an int max buffer whose
update is a compare-branch per row. The two-count form is the fast form;
the device stands as registered. (Kept as a tool so the measurement is
reproducible; the negative result is recorded in OPTIMIZATION_r11.md.)

Usage: python tools/dsum_ab.py [/tmp/kse-scale10x] [runs=7]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kse import catalog, registry  # noqa: E402
from kse.queries._util import (  # noqa: E402
    in_wide_band,
    micro_exact,
    micro_total_to_double,
    out_of_domain,
    r4,
    r6,
    t,
    wide_micro,
)
from kse.session import get_session  # noqa: E402


def dsum_expr_maxcode(c):
    """The rejected variant: one max(band-code) detector per dsum."""
    band = (
        F.when(out_of_domain(c), F.lit(2))
        .when(in_wide_band(c), F.lit(1))
        .otherwise(F.lit(0))
    )
    mb = F.max(band)
    fast = F.sum(F.when(micro_exact(c), F.floor(c * 1000000.0 + 0.5)))
    wide = F.sum(wide_micro(c))
    return (
        F.when(mb == 2, F.sum(c))
        .when(mb == 1, micro_total_to_double(fast, wide))
        .otherwise(fast / 1000000.0)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kse-scale10x"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_session("dsum-ab")
    spark.sparkContext.setLogLevel("ERROR")
    catalog._LAYOUTS.setdefault(sf_dir, sf_dir)
    qs = registry.all_queries()

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    def variant():
        li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2001-09-01")
        disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return li.groupBy("l_returnflag", "l_linestatus").agg(
            dsum_expr_maxcode(F.col("l_quantity")).alias("sum_qty"),
            dsum_expr_maxcode(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum_expr_maxcode(disc).alias("sum_disc_price"),
            dsum_expr_maxcode(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
            r4(F.avg("l_quantity"), "avg_qty"),
            r4(F.avg("l_extendedprice"), "avg_price"),
            r6(F.avg("l_discount"), "avg_disc"),
            F.count("*").alias("count_order"),
        )

    def current():
        return qs["q_agg_groupby"].fn(spark, sf_dir)

    # Parity gate before any timing: both forms must agree exactly.
    a = sorted(tuple(r) for r in current().collect())
    b = sorted(tuple(r) for r in variant().collect())
    assert a == b, f"PARITY FAIL: {a[:2]} vs {b[:2]}"
    print(f"parity OK: {len(a)} rows identical")

    # Phase profile: where does the registered query's time go?
    cols = [
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_shipdate",
    ]

    def scan_only():
        return t(spark, sf_dir, "lineitem").select(*cols)

    def plain_sums():
        li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2001-09-01")
        disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"),
            F.sum("l_extendedprice"),
            F.sum(disc),
            F.sum(disc * (1 + F.col("l_tax"))),
            F.round(F.avg("l_quantity"), 4),
            F.round(F.avg("l_extendedprice"), 4),
            F.round(F.avg("l_discount"), 6),
            F.count("*"),
        )

    def bench(label, fn):
        mat(fn())  # warm
        s = []
        for _ in range(runs):
            t0 = time.perf_counter()
            mat(fn())
            s.append(time.perf_counter() - t0)
        s.sort()
        print(
            f"{label:32s} best={s[0] * 1000:7.1f} ms  "
            f"med={s[len(s) // 2] * 1000:7.1f} ms"
        )

    bench("floor (1-row noop)", lambda: spark.range(1))
    bench("bare 7-col scan", scan_only)
    bench("plain-sum twin (no device)", plain_sums)
    # Interleaved rounds: both variants sampled under the same ambient load.
    for rnd in range(2):
        bench(f"current counts-detector (r{rnd})", current)
        bench(f"max-band-code variant (r{rnd})", variant)


if __name__ == "__main__":
    main()
