"""QuerryGenerator.py CLI parity (reference: QuerryGenerator.py:5-16 —
text file lines -> one Mongo document per line).

    python -m meshtastic_airsensor_database_spark.cli.querygen \
        input.txt [-o OUT_DIR] [--name NAME]

Engine-native: JSON-lines documents with the reference's exact field
names ({"Name", "Line", "Line Number"}); a Mongo connector would write
the identical frame with ``.format("mongodb")``.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F

from ..session import get_spark
from ..sources.batch import text_line_source
from ..sources.sinks import document_sink


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(prog="querygen")
    p.add_argument("textfile")
    p.add_argument("-o", "--out-dir", default="querygen_out")
    p.add_argument("--name", default="test_file_hello_world",
                   help="document Name field (reference hardcodes this)")
    args = p.parse_args(argv)

    spark = spark or get_spark("querygen")
    docs = text_line_source(spark, args.textfile).select(
        F.lit(args.name).alias("Name"),
        F.trim(F.col("line")).alias("Line"),
        F.col("line_number").alias("Line Number"),
    )
    document_sink(docs, args.out_dir)
    print(f"Wrote {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
