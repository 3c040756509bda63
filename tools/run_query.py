"""Run any registered query by name and print its result.

    python tools/run_query.py QUERY_NAME [SF_DIR] [--limit N] [--explain]

The operational entry point for ad-hoc use of the declared query
surface (the same registry `__spark_entry__.queries()` exposes to the
driver): `--explain` prints the formatted physical plan instead of
rows — the first thing to look at when a query misbehaves at scale.
`python tools/run_query.py --list` enumerates every query with its
one-line description and whether it has a DuckDB oracle twin.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(prog="run_query")
    p.add_argument("name", nargs="?", help="registered query name")
    p.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--explain", action="store_true",
                   help="print the formatted physical plan, not rows")
    p.add_argument("--list", action="store_true", dest="list_queries",
                   help="list every registered query")
    args = p.parse_args()

    from meshtastic_airsensor_database_spark.plans import REGISTRY

    if args.list_queries:
        for name, q in REGISTRY.items():
            twin = "oracle" if q.oracle is not None else "rows-only"
            print(f"{name:36s} [{twin}] {q.description}")
        return 0
    if not args.name:
        p.error("QUERY_NAME required (or --list)")
    if args.name not in REGISTRY:
        print(f"unknown query {args.name!r}; try --list", file=sys.stderr)
        return 2

    from meshtastic_airsensor_database_spark.session import get_spark

    spark = get_spark("run_query")
    spark.sparkContext.setLogLevel("ERROR")
    df = REGISTRY[args.name].builder(spark, args.sf_dir)
    if args.explain:
        qe = df._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        print(qe.explainString(mode))
    else:
        df.show(args.limit, truncate=False)
        print(f"({df.count()} rows total)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
