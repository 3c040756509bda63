"""Run any registered query by name and print its result.

    python tools/run_query.py QUERY_NAME [SF_DIR] [--limit N] [--explain | --metrics]

The operational entry point for ad-hoc use of the declared query
surface (the same registry `__spark_entry__.queries()` exposes to the
driver): `--explain` prints the formatted physical plan instead of
rows — the first thing to look at when a query misbehaves at scale —
and `--metrics` EXECUTES the query and prints the per-operator runtime
metrics (output rows, shuffle/spill bytes, scan stats) from the
executed plan: the EXPLAIN ANALYZE twin, and the second thing to look
at (a plan can look right and still spill).
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
    p.add_argument("--metrics", action="store_true",
                   help="execute and print per-operator runtime metrics")
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
    elif args.metrics:
        # force full execution of THIS DataFrame's QueryExecution (a
        # write/save would plan a fresh one whose metrics we can't
        # see): toRdd().count() runs every operator distributed, no
        # decoded rows reach the driver. Walk the plan only after —
        # metrics materialize on execution and AQE re-plans mid-run.
        qe = df._jdf.queryExecution()
        qe.toRdd().count()
        node = qe.executedPlan()

        def walk(n, depth=0):
            name = n.nodeName()
            if name == "AdaptiveSparkPlan":
                # AQE hides the (re-planned) tree behind the adaptive
                # root; after execution its final plan is available
                walk(n.executedPlan(), depth)
                return
            if name.endswith("QueryStage"):
                # QueryStageExec wraps each materialized AQE stage
                walk(n.plan(), depth)
                return
            shown = []
            mets = n.metrics()
            it = mets.iterator()
            while it.hasNext():
                kv = it.next()
                key, metric = kv._1(), kv._2()
                if metric.value() > 0 and any(
                    s in key for s in ("numOutputRows", "spill", "bytes",
                                       "numFiles", "numPartitions", "numRows")
                ):
                    shown.append(f"{key}={metric.value():,}")
            print("  " * depth + f"{name}" + (f"  [{', '.join(shown)}]" if shown else ""))
            for i in range(n.children().length()):
                walk(n.children().apply(i), depth + 1)

        walk(node)
    else:
        df.show(args.limit, truncate=False)
        print(f"({df.count()} rows total)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
