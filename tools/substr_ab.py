"""One-shot A/B: q_llm_dedup_substring's single-aggregate plan (mixed
countDistinct + plain aggregates) vs a manual two-level aggregation, at
the 10x tier.

Motivation (guide §2.3, shuffle fewer bytes): mixing a DISTINCT aggregate
with plain ones makes Spark plan an Expand over the pre-shuffle rows —
each gram row is duplicated (one copy per aggregate group), so the only
exchange in the query carries ~2x the rows. The two-level form aggregates
by (gram, doc) first — duplicates collapse map-side, no Expand — then by
gram. Whether the extra exchange costs more than Expand saves is exactly
what this measures, interleaved best-of-N, value parity asserted first.

Usage: python tools/substr_ab.py [/tmp/kse-scale10x] [runs=5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from kse import catalog, registry  # noqa: E402
from kse.queries._util import t  # noqa: E402
from kse.session import get_session  # noqa: E402


def plan_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return registry.all_queries()["q_llm_dedup_substring"].fn(spark, sf_dir)


def _grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kse.queries.llm import _SUBSTR_W as w

    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("tk"))
    return toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"CASE WHEN size(tk) >= {w} THEN "
                f"transform(sequence(1, size(tk) - {w - 1}),"
                f" i -> concat_ws(' ', slice(tk, i, {w}))) "
                "ELSE array() END"
            )
        ).alias("p", "gram"),
    ).select(
        "doc_id",
        (F.col("p") + 1).cast("long").alias("pos"),
        F.substring(F.md5("gram"), 1, 16).alias("g"),
    )


def plan_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics: per-(gram, doc) partial first, then per-gram."""
    grams = _grams(spark, sf_dir)
    per_doc = grams.groupBy("g", "doc_id").agg(
        F.count(F.lit(1)).alias("n_occ"), F.min("pos").alias("min_pos")
    )
    return (
        per_doc.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_occ").alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
            F.min("min_pos").alias("min_pos"),
        )
        .filter(F.col("n_docs") > 1)
        .select(
            F.col("g").alias("gram_hash"),
            "n_docs",
            "n_occurrences",
            "first_doc",
            "min_pos",
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kse-scale10x"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_session("kse-substr-ab")
    spark.sparkContext.setLogLevel("ERROR")
    catalog._LAYOUTS.setdefault(sf_dir, sf_dir)

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    a_rows = sorted(map(tuple, plan_registered(spark, sf_dir).collect()))
    b_rows = sorted(map(tuple, plan_two_level(spark, sf_dir).collect()))
    assert a_rows == b_rows, (
        f"plans disagree: {len(a_rows)} vs {len(b_rows)} rows; first diff "
        f"{next((x for x in zip(a_rows, b_rows) if x[0] != x[1]), None)}"
    )
    print(f"# parity OK: {len(a_rows)} identical result rows")

    variants = {"single_agg_expand": plan_registered, "two_level": plan_two_level}
    for fn in variants.values():
        mat(fn(spark, sf_dir))
    samples: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(runs):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            mat(fn(spark, sf_dir))
            samples[name].append(time.perf_counter() - t0)
    for name, ss in samples.items():
        ss = sorted(ss)
        print(
            f"{name}: best {ss[0]*1000:.0f} ms, median {ss[len(ss)//2]*1000:.0f} ms "
            f"(n={len(ss)})"
        )


if __name__ == "__main__":
    main()
