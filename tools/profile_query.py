"""Per-query phase profiler for the optimization rounds.

For each named query (default: the bench headline set), measures at
$SPARK_GRAFT_SF_DIR:

- builder wall (REGISTRY[name].builder call — plan construction plus
  any eager passes: collects, checkpoint materializations, index
  lifecycle writes),
- action wall (noop-sink write of the returned frame),
- the number of Spark JOBS each phase launched (job-group tagged):
  a builder with many jobs is latency-bound (per-job fixed cost), a
  builder with zero jobs but big wall is analyzer/plan-construction
  bound — two different optimizations.

    python tools/profile_query.py [query ...] [--reps N]

Prints one line per query and a JSON dump to /tmp/profile_queries.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meshtastic_airsensor_database_spark.plans import REGISTRY
from meshtastic_airsensor_database_spark.session import get_spark


def profile(spark, name: str, sf_dir: str) -> dict:
    sc = spark.sparkContext
    spark._jvm.System.gc()
    sc.setJobGroup(f"prof_build_{name}", name)
    t0 = time.time()
    df = REGISTRY[name].builder(spark, sf_dir)
    t1 = time.time()
    build_jobs = len(sc.statusTracker().getJobIdsForGroup(f"prof_build_{name}"))
    sc.setJobGroup(f"prof_act_{name}", name)
    df.write.mode("overwrite").format("noop").save()
    t2 = time.time()
    act_jobs = len(sc.statusTracker().getJobIdsForGroup(f"prof_act_{name}"))
    sc.setJobGroup(None, None)
    return {
        "build_s": round(t1 - t0, 3),
        "action_s": round(t2 - t1, 3),
        "build_jobs": build_jobs,
        "action_jobs": act_jobs,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = args or list(REGISTRY)
    spark = get_spark("profile")
    out: dict[str, dict] = {}
    for name in names:
        if name not in REGISTRY:
            print(f"unknown query {name!r}", file=sys.stderr)
            continue
        # warm-up pass (untimed): codegen + file listing
        try:
            REGISTRY[name].builder(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception as e:  # surface real errors in the timed pass
            print(f"warmup {name}: {e}", file=sys.stderr)
        best = None
        for _ in range(reps):
            r = profile(spark, name, sf_dir)
            if best is None or r["build_s"] + r["action_s"] < best["build_s"] + best["action_s"]:
                best = r
        out[name] = best
        print(
            f"{name:40s} build {best['build_s']:7.3f}s ({best['build_jobs']:3d} jobs)  "
            f"action {best['action_s']:7.3f}s ({best['action_jobs']:3d} jobs)"
        )
    with open("/tmp/profile_queries.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
