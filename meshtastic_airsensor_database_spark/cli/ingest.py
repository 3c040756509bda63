"""The AIRWISE ingest daemon, engine-style (reference:
AIRWISEv0v1comb.py __main__ — MQTT subscribe -> parse/route -> Postgres).

    python -m meshtastic_airsensor_database_spark.cli.ingest \
        --landing-dir DIR --out-dir DIR [--trigger-seconds N] \
        [--dedup] [--once]

The MQTT boundary stays out-of-process (sources/mqtt_bridge.py tails
the broker into --landing-dir); this command runs the Structured
Streaming query that parses, routes, enriches, and appends the three
fact tables + node dim. ``--once`` processes everything available and
exits (testing / catch-up); otherwise runs until interrupted.
"""

from __future__ import annotations

import argparse
import sys

from ..session import get_spark
from ..streaming.ingest import IngestPaths, run_ingest_stream
from ..streaming.monitor import register_lifecycle_alerts


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(prog="ingest")
    p.add_argument("--landing-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--trigger-seconds", type=int, default=None)
    p.add_argument("--dedup", action="store_true",
                   help="cross-batch packet-id dedup within the watermark")
    p.add_argument("--once", action="store_true",
                   help="process available input, then stop")
    p.add_argument("--state-partitions", type=int, default=8,
                   help="state-store / in-batch shuffle width for this "
                        "query — size to the INGEST RATE (default 8 "
                        "suits a sensor-fleet trickle; pass a "
                        "cluster-sized value for bulk backfill; pinned "
                        "by the first run's checkpoint)")
    p.add_argument("--clean-source", choices=("archive", "delete"), default=None,
                   help="retire PROCESSED landing files so the landing "
                        "dir (and the per-trigger listing) stays bounded "
                        "by the unprocessed backlog on long-running "
                        "deployments; 'archive' moves them under "
                        "--source-archive-dir, 'delete' removes them")
    p.add_argument("--source-archive-dir", default=None,
                   help="destination for --clean-source archive")
    args = p.parse_args(argv)
    # validate the pair at parse time: failing later inside
    # packet_stream_source would first spin up a Spark session just to
    # die with a ValueError instead of a usage message (r9 ADVICE)
    if args.clean_source == "archive" and not args.source_archive_dir:
        p.error("--clean-source archive requires --source-archive-dir")

    spark = spark or get_spark("ingest")
    listener = register_lifecycle_alerts(
        spark, lambda kind, desc: print(f"[lifecycle] {kind}: {desc}")
    )
    paths = IngestPaths(landing_dir=args.landing_dir, out_dir=args.out_dir)
    query = run_ingest_stream(
        spark, paths,
        trigger_seconds=args.trigger_seconds,
        dedup_within_watermark=args.dedup,
        state_partitions=args.state_partitions,
        clean_source=args.clean_source,
        source_archive_dir=args.source_archive_dir,
    )
    try:
        if args.once:
            query.processAllAvailable()
            query.stop()
        else:
            query.awaitTermination()
    finally:
        spark.streams.removeListener(listener)
    return 0


if __name__ == "__main__":
    sys.exit(main())
