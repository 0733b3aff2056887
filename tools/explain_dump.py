"""Dump `.explain("formatted")` output for named registered queries to
files — the before/after plan evidence the optimization rounds commit
under plans/r<N>/ so plan-shape claims are checkable without running
Spark.

Usage: python tools/explain_dump.py OUTDIR SUFFIX q_a[,q_b,...] [sf_dir]
       (default sf_dir /root/testdata/sf0.1; writes
        OUTDIR/<query>_<SUFFIX>.txt, e.g. plans/r10/q_fn_json_before.txt)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kse import registry  # noqa: E402
from kse.session import get_session  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",")
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    os.makedirs(outdir, exist_ok=True)
    spark = get_session("kse-explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    for name in names:
        df = qs[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted'), {suffix}, sf_dir={sf_dir}\n")
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
