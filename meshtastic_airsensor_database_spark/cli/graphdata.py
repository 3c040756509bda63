"""graphdata.py CLI parity (reference: graphdata.py:72-199).

    python -m meshtastic_airsensor_database_spark.cli.graphdata \
        purpleair_clean.csv airwise_export.csv [-o OUT_DIR] \
        [--nodes N1,N2] [--bucket "5 minutes"]

The reference renders six matplotlib overlays (PurpleAir vs two AIRWISE
nodes per metric). The engine computes the comparison as a real query
— per-metric time-bucket alignment of the tagged sources — and writes
one CSV per metric (bucket_ts, source, avg/min/max/n); `--svg` also
renders each figure as a dependency-free SVG chart (chartsvg.py) with
the reference's fixed 0-15 y-axis on the PM metrics (graphdata.py PM
subplots). Charting stays driver-side on the small aggregated result,
exactly as SURVEY §3.3 prescribes.
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import functions as F

from ..functions.scalars import f_to_c, timestamp_parse_coerce, try_double, tz_suffix_strip
from ..operators.align import node_equality_filter, timeseries_align
from ..operators.clean import csv_sink, multi_file_union
from ..session import get_spark

# metric -> (purpleair column expr name, airwise column) — graphdata.py:99-192
# Auto-enumeration cap (ADVICE r1: no unbounded .collect() in the CLI
# surface). The reference fleet is 6 nodes; 64 comparison series is
# already past chart legibility.
MAX_AUTO_NODES = 64

METRICS = {
    "temperature": ("current_temp_c", "temperature"),
    "humidity": ("current_humidity", "humidity"),
    "pressure": ("pressure", "pressure"),
    "pm1_0": ("pm1_0_atm", "pm1_0"),
    "pm2_5": ("pm2_5_atm", "pm2_5"),
    "pm10": ("pm10_0_atm", "pm10"),
}


def load_purpleair(spark, path: str):
    """graphdata.py:15-39: parse time, dropna, F->C, numeric coercion."""
    pa = multi_file_union(spark, [path])
    pa = (
        pa.withColumn("ts", timestamp_parse_coerce(F.col("PacificTime")))
        .na.drop(subset=["ts"])
        .withColumn("current_temp_c", f_to_c(try_double("current_temp_f")))
    )
    for c in ("current_humidity", "pressure", "pm1_0_atm", "pm2_5_atm", "pm10_0_atm"):
        pa = pa.withColumn(c, try_double(c))
    return pa


def load_airwise(spark, path: str):
    """graphdata.py:42-69: strip tz suffix, parse, dropna, coercion."""
    aw = multi_file_union(spark, [path])
    aw = aw.withColumn(
        "ts", timestamp_parse_coerce(tz_suffix_strip(F.col("pst_time")))
    ).na.drop(subset=["ts"])
    for c in ("temperature", "humidity", "pressure", "pm1_0", "pm2_5", "pm10"):
        aw = aw.withColumn(c, try_double(c))
    # unparseable node ids -> null -> dropped (they can't join any series)
    return aw.withColumn("node", F.col("node").cast("long")).na.drop(subset=["node"])


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(prog="graphdata")
    p.add_argument("purpleair_csv")
    p.add_argument("airwise_csv")
    p.add_argument("-o", "--out-dir", default="graphdata_out")
    p.add_argument("--nodes", default=None,
                   help="comma-separated AIRWISE node ids (default: all nodes, "
                        f"up to {MAX_AUTO_NODES})")
    p.add_argument("--bucket", default="5 minutes")
    p.add_argument("--svg", action="store_true",
                   help="also render each metric as a standalone SVG chart")
    args = p.parse_args(argv)

    spark = spark or get_spark("graphdata")
    pa = load_purpleair(spark, args.purpleair_csv)
    aw = load_airwise(spark, args.airwise_csv)
    if args.nodes:
        nodes = [int(n) for n in args.nodes.split(",")]
    else:
        # Bounded driver-side enumeration: one comparison series per
        # node means the chart set (and this collect) must stay small
        # anyway. limit(N+1) caps the transfer regardless of node
        # cardinality; beyond the cap we refuse rather than silently
        # chart a truncated fleet.
        sample = aw.select("node").distinct().limit(MAX_AUTO_NODES + 1).collect()
        if len(sample) > MAX_AUTO_NODES:
            p.error(
                f"more than {MAX_AUTO_NODES} distinct nodes; pass an explicit "
                "--nodes list to chart a subset"
            )
        nodes = sorted(r[0] for r in sample)

    for metric, (pa_col, aw_col) in METRICS.items():
        sources = {"purpleair": pa.select("ts", F.col(pa_col).alias("v"))}
        for n in nodes:
            sources[f"airwise_{n}"] = node_equality_filter(aw, "node", n).select(
                "ts", F.col(aw_col).alias("v")
            )
        aligned = timeseries_align(sources, "ts", "v", args.bucket).orderBy(
            "bucket_ts", "source"
        )
        out = os.path.join(args.out_dir, metric)
        csv_sink(aligned, out, single_file=True)
        print(f"Wrote {out}")
        if args.svg:
            from datetime import datetime

            from .chartsvg import (
                PM_Y_LIMITS,
                aligned_rows_to_series,
                render_line_chart_svg,
            )

            # the aligned frame is chart-sized by construction
            # (buckets x sources); PM metrics pin the reference ylim
            svg = render_line_chart_svg(
                aligned_rows_to_series(aligned.collect()),
                title=metric,
                y_limits=PM_Y_LIMITS if metric.startswith("pm") else None,
                x_labeler=lambda x: datetime.fromtimestamp(x).strftime("%m-%d %H:%M"),
            )
            svg_path = os.path.join(args.out_dir, f"{metric}.svg")
            with open(svg_path, "w") as f:
                f.write(svg)
            print(f"Wrote {svg_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
