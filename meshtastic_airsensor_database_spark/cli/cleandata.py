"""cleandata.py CLI parity (reference: cleandata.py:6-53).

    python -m meshtastic_airsensor_database_spark.cli.cleandata \
        [-o OUT_DIR] file1.csv [file2.csv ...]

Same pipeline (concat -> coerce timestamps -> dropna -> UTC->Pacific ->
sort -> 7-col project -> round(3) -> render) as one lazy DataFrame
chain; output is a header'd CSV directory (single file by default,
mirroring the reference's one-file output — pass --parallel at scale).
"""

from __future__ import annotations

import argparse
import sys

from ..operators.clean import csv_sink, multi_file_union, purpleair_clean
from ..session import get_spark


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(prog="cleandata")
    p.add_argument("csvs", nargs="+", help="PurpleAir export CSVs")
    p.add_argument("-o", "--output", default="purpleairCLEAN.csv",
                   help="output CSV directory (default: purpleairCLEAN.csv)")
    p.add_argument("--parallel", action="store_true",
                   help="write one file per partition instead of coalescing")
    args = p.parse_args(argv)

    spark = spark or get_spark("cleandata")
    cleaned = purpleair_clean(multi_file_union(spark, args.csvs))
    csv_sink(cleaned, args.output, single_file=not args.parallel)
    print(f"Wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
