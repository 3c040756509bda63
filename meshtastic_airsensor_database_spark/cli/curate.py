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
    p.add_argument(
        "--snapshot",
        action="store_true",
        help="publish the final corpus as a new immutable snapshot "
        "version under OUT_DIR/decontaminated (sources/versioned.py) "
        "instead of overwriting it — the reproducible-training mode",
    )
    args = p.parse_args(argv)

    spark = spark or get_spark("curate")
    docs = fan_out(spark.read.parquet(args.docs))
    stages = funnel_stages(docs)

    report = []
    prev = None
    snapshot_version = None
    for idx, (name, df) in enumerate(stages):
        out_path = os.path.join(args.output, name)
        if name == "decontaminated" and args.snapshot:
            from ..sources.versioned import read_snapshot, write_snapshot

            snapshot_version = write_snapshot(df, out_path)
            n = read_snapshot(spark, out_path, snapshot_version).count()
        elif args.write_stages or name == "decontaminated":
            df.write.mode("overwrite").parquet(out_path)
            # count what was written, not a second evaluation
            n = spark.read.parquet(out_path).count()
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
        json.dump(
            {"stages": report, "snapshot_version": snapshot_version}, f, indent=2
        )
    for s in report:
        print(f"{s['stage_idx']}. {s['stage']}: {s['n_docs']}")
    print(f"Wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
