"""Batch corpus-curation driver (engine extension surface; no reference
counterpart — the reference has no corpus tooling).

    python -m meshtastic_airsensor_database_spark.cli.curate \
        DOCS_PARQUET -o OUT_DIR [--write-stages]

Runs the full pretraining-corpus funnel — language quotas, Gopher-style
quality gates, exact dedup, deterministic train split, word-8-gram
decontamination — over a ``documents``-shaped parquet table and writes:

- ``OUT_DIR/decontaminated/``: the final training corpus (parquet);
- ``OUT_DIR/report.json``: per-stage surviving-document counts;
- with ``--write-stages``, every intermediate stage's parquet too.

The stage composition is ``plans/curateq.py::funnel_stages`` — the
same lineage the oracle-checked ``curation_funnel`` query hash-proves —
so what this CLI ships is exactly what the correctness gate verified.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import functions as F

from ..io_utils import fan_out
from ..plans.curateq import funnel_stages
from ..session import get_spark


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(prog="curate")
    p.add_argument("docs", help="documents parquet (doc_id, text, lang, ...)")
    p.add_argument("-o", "--output", required=True, help="output directory")
    p.add_argument(
        "--write-stages",
        action="store_true",
        help="also write every intermediate stage's parquet",
    )
    args = p.parse_args(argv)

    spark = spark or get_spark("curate")
    docs = fan_out(spark.read.parquet(args.docs))
    stages = funnel_stages(docs)

    report = []
    prev = None
    for idx, (name, df) in enumerate(stages):
        write_this = args.write_stages or name == "decontaminated"
        if write_this:
            df.write.mode("overwrite").parquet(os.path.join(args.output, name))
            # count what was written, not a second evaluation
            n = spark.read.parquet(os.path.join(args.output, name)).count()
        else:
            n = df.count()
        report.append(
            {
                "stage_idx": idx,
                "stage": name,
                "n_docs": n,
                "dropped_here": None if prev is None else prev - n,
            }
        )
        prev = n

    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "report.json"), "w") as f:
        json.dump({"stages": report}, f, indent=2)
    for s in report:
        print(f"{s['stage_idx']}. {s['stage']}: {s['n_docs']}")
    print(f"Wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
