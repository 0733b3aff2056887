"""CLI entry point — the standalone-repo surface for a user of the engine.

    python -m kse list                         # registered queries + checks
    python -m kse run q_agg_groupby [--sf-dir DIR] [--limit N]
    python -m kse explain q_join_broadcast     # formatted physical plan
    python -m kse sql "SELECT count(*) FROM lineitem" [--sf-dir DIR]

``sql`` registers the catalog tables as temp views first (SURVEY.md §3.2),
so any ad-hoc query over the ten tables runs as-is.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m kse")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    run = sub.add_parser("run", help="run a registered query")
    run.add_argument("query")
    run.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    run.add_argument("--limit", type=int, default=20)

    ex = sub.add_parser("explain", help="print a query's physical plan")
    ex.add_argument("query")
    ex.add_argument("--sf-dir", default=DEFAULT_SF_DIR)

    sq = sub.add_parser("sql", help="run ad-hoc SQL over the catalog tables")
    sq.add_argument("text")
    sq.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    sq.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    from kse import all_queries, get_session, register_views

    if args.cmd == "list":
        for name, q in sorted(all_queries().items()):
            if q.oracle:
                check = "oracle"
            elif q.check_oracle:
                check = "tolerance"
            else:
                check = "rows-only"
            doc = " ".join((q.doc or "").split())[:80]
            print(f"{name:32s} [{check:9s}] {doc}")
        return 0

    spark = get_session("kse-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "sql":
        register_views(spark, args.sf_dir)
        spark.sql(args.text).show(args.limit, truncate=False)
        return 0

    qs = all_queries()
    if args.query not in qs:
        print(f"unknown query {args.query!r}; `python -m kse list` shows all", file=sys.stderr)
        return 2
    df = qs[args.query].fn(spark, args.sf_dir)
    if args.cmd == "explain":
        print(df._jdf.queryExecution().executedPlan().toString())
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
