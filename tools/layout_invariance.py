"""Layout-invariance auditor: physical layout must not change results.

On a 1000-executor cluster the SAME logical table arrives as an arbitrary
set of files in arbitrary order, split into arbitrary partitions — so any
query whose RESULT depends on file count, file order, or row order within
files is wrong at scale even if it passes every single-file oracle check.
The classic offenders are silent: ``row_number``/``first``/``last`` over
non-unique orderings, limit-without-order, partial-aggregation fold order,
per-partition seeded draws, sketch merge order.

This tool rewrites every catalog table into a hostile second layout —
17-way hash-scattered files, rows sorted DESCENDING by a value hash within
each file (deterministic, so failures reproduce) — then runs every
registered query against the original layout and the scattered layout and
requires identical results (same comparator as tools/check.py: exact for
non-floats, 1e-12 for floats; queries with a declared sketch tolerance are
held to that tolerance instead; container columns stringify before
sorting, so frames whose only guaranteed orderings are internal still
align). Every non-whitelisted mismatch is a layout-dependence bug.

Usage:
    python tools/layout_invariance.py [sf_dir] [query ...]
    (default sf_dir: /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

import check  # noqa: E402 — tools/check.py, same directory

from kse import registry  # noqa: E402
from kse.catalog import TABLES, load  # noqa: E402
from kse.session import get_session  # noqa: E402

# Queries whose output legitimately depends on the physical layout — each
# entry states why that is the operator's documented contract rather than
# a bug. Kept deliberately short: everything else in the registry must be
# bit-identical across layouts.
EXPECTED_LAYOUT_DEPENDENT: dict[str, str] = {
    "q_sample": (
        "Bernoulli sample with a fixed seed draws per-partition (Spark's "
        "documented sample contract): the same seed over a different "
        "partitioning selects different rows. By design rows-only for the "
        "driver too; its deterministic twin q_sample_hash must (and does) "
        "hold layout invariance."
    ),
}


def scatter(spark, src_dir: str, dst_dir: str) -> None:
    """Rewrite every catalog table into the hostile layout: 17 files,
    hash-scattered rows, descending value-hash order within each file.
    Deterministic (xxhash64 of every column with a fixed seed column
    list), so a failing query fails the same way on re-run."""
    os.makedirs(dst_dir, exist_ok=True)
    for name in TABLES:
        df = load(spark, src_dir, name)
        cols = [F.col(c) for c in df.columns]
        scrambled = (
            df.withColumn("__h", F.xxhash64(*cols))
            .repartition(17, "__h")
            .sortWithinPartitions(F.col("__h").desc())
            .drop("__h")
        )
        scrambled.write.mode("overwrite").parquet(
            os.path.join(dst_dir, f"{name}.parquet")
        )


def main() -> int:
    args = sys.argv[1:]
    only = {a for a in args if not a.startswith("/")}
    dirs = [a for a in args if a.startswith("/")]
    src = dirs[0] if dirs else "/root/testdata/sf0.001"

    spark = get_session("kse-layout-invariance")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="kse-layout-")
    try:
        scattered = os.path.join(base, "scattered")
        scatter(spark, src, scattered)
        qs = registry.all_queries()
        unexpected, stale, n_pass, n_tol = [], [], 0, 0
        for name, q in qs.items():
            if only and name not in only:
                continue
            try:
                a = q.fn(spark, src).toPandas()
                b = q.fn(spark, scattered).toPandas()
                if q.check_rel_tol is not None:
                    errs = check.compare_tol(a, b, q.check_rel_tol)
                else:
                    errs = check.compare(a, b)
            except Exception as exc:  # noqa: BLE001
                errs = [f"{type(exc).__name__}: {str(exc)[:160]}"]
            if errs and name in EXPECTED_LAYOUT_DEPENDENT:
                print(f"OK(by-design)  {name}: layout-dependent as documented")
            elif errs:
                unexpected.append((name, errs))
                print(f"FAIL  {name}: {errs}")
            elif name in EXPECTED_LAYOUT_DEPENDENT:
                stale.append(name)
                print(f"STALE WHITELIST  {name}: held invariance unexpectedly")
            else:
                if q.check_rel_tol is not None:
                    n_tol += 1
                else:
                    n_pass += 1
        print(
            f"\n== layout-invariance: {n_pass} exact, {n_tol} within declared "
            f"tolerance, {len(unexpected)} unexpected layout-dependent, "
            f"{len(stale)} stale whitelist entries =="
        )
        return 1 if (unexpected or stale) else 0
    finally:
        shutil.rmtree(base, ignore_errors=True)
        registry.invalidate_plans(spark=spark)


if __name__ == "__main__":
    raise SystemExit(main())
