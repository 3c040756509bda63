"""Dump one query's .explain("formatted") output to a file.

    python tools/dump_plan_file.py QUERY OUTFILE [SF_DIR]

Used by the optimization rounds to commit plans/rNN/<query>_before.txt
and _after.txt evidence.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name, outfile = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from meshtastic_airsensor_database_spark.plans import REGISTRY
    from meshtastic_airsensor_database_spark.session import get_spark

    spark = get_spark("dump_plan")
    spark.sparkContext.setLogLevel("ERROR")
    df = REGISTRY[name].builder(spark, sf_dir)
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    text = qe.explainString(mode)
    os.makedirs(os.path.dirname(outfile) or ".", exist_ok=True)
    with open(outfile, "w") as f:
        f.write(text)
    print(f"wrote {outfile} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
