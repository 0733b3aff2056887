"""One-shot A/B: q_fn_json's JVM get_json_object plan vs an Arrow-side
batch parse (mapInPandas + orjson) at the 10x tier.

The round-9 verdict's last untried lever for the single largest
persistent ratio (q_fn_json, 15-19x vs DuckDB at 10x since r4): ship the
JSON parse to Python workers as Arrow batches and parse with orjson
(~0.11 us/object for the {"k": N} shape, ~10x faster per object than
stdlib json). The bet only pays if orjson's per-object win beats the
Arrow round-trip of the props column both ways plus Python worker
dispatch — this tool measures exactly that, interleaved best-of-N on the
same session, and value-checks the two plans against each other first.

Usage: python tools/json_ab.py [/tmp/kse-scale10x] [runs=5]
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


def plan_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered plan (kse/queries/functions.py q_fn_json)."""
    return registry.all_queries()["q_fn_json"].fn(spark, sf_dir)


def plan_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics, parse moved to Python workers via mapInPandas.

    Parity with try_cast(get_json_object(props, '$.k') AS int): malformed
    or non-JSON props -> NULL, non-integer k -> NULL (bool excluded:
    Python bool is an int subclass but JSON true is not an INT k).
    """
    e = t(spark, sf_dir, "events").select("event_type", "props", "value")

    def parse(batches):
        import orjson

        for pdf in batches:
            ks = []
            for s in pdf["props"].values:
                k = None
                if s is not None:
                    try:
                        v = orjson.loads(s).get("k")
                        if isinstance(v, int) and not isinstance(v, bool):
                            k = v
                    except Exception:
                        k = None
                ks.append(k)
            out = pdf[["event_type", "value"]].copy()
            out["k"] = ks
            yield out[["event_type", "k", "value"]]

    parsed = e.mapInPandas(parse, schema="event_type string, k int, value double")
    return parsed.groupBy("event_type", "k").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kse-scale10x"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_session("kse-json-ab")
    spark.sparkContext.setLogLevel("ERROR")
    catalog._LAYOUTS.setdefault(sf_dir, sf_dir)

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    # value parity first — a faster wrong answer is not a candidate
    a_rows = sorted(map(tuple, plan_jvm(spark, sf_dir).collect()))
    b_rows = sorted(map(tuple, plan_arrow(spark, sf_dir).collect()))
    assert a_rows == b_rows, (
        f"plans disagree: {len(a_rows)} vs {len(b_rows)} rows; "
        f"first diff {next((x for x in zip(a_rows, b_rows) if x[0] != x[1]), None)}"
    )
    print(f"# parity OK: {len(a_rows)} identical result rows")

    variants = {"jvm_get_json_object": plan_jvm, "arrow_orjson_mapInPandas": plan_arrow}
    # warm both (codegen + python worker pool)
    for fn in variants.values():
        mat(fn(spark, sf_dir))
    samples: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(runs):  # interleaved: ambient drift hits both columns
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
