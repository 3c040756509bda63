"""Per-query core-scaling evidence: run the given queries end-to-end
(builder + noop action, min-of-reps) at $SPARK_GRAFT_CPUS and print one
JSON line. Run twice — SPARK_GRAFT_CPUS=32 and =8 — against the SAME
scaled dir (tools/make_scaled_dir.py) and compare per-query ratios: a
compute-bound query approaches the core ratio, a fixed-cost-bound one
sits near 1 (the r11 verdict's ask — sf0.1 cannot show this shape).

    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=8 python tools/scale_ratio.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meshtastic_airsensor_database_spark.plans import REGISTRY
from meshtastic_airsensor_database_spark.session import get_spark


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("scale_ratio")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for name in names:
        try:
            REGISTRY[name].builder(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()  # warm-up
        except Exception as e:
            print(f"warmup {name}: {e}", file=sys.stderr)
        best = float("inf")
        for _ in range(reps):
            spark._jvm.System.gc()
            t0 = time.time()
            df = REGISTRY[name].builder(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(f"{name}: {best:.3f}s", file=sys.stderr)
    print(json.dumps({"cpus": int(cpus), "sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
