"""Offline-node monitoring daemon.

Deployment counterpart of the reference's heartbeat thread
(AIRWISEv0.py:73-103 scan loop + :51-68 ntfy POST): streams the landing
directory's nodeinfo packets through the stateful offline detector and
posts one alert per transition.

Env-file keys honored (same file as the bridge/ingest services):
``landing_dir``, ``ntfy_url``, ``offline_threshold_minutes``
(reference default 100, AIRWISEv0.py:20).
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.parse import extract_nodeinfo, json_envelope_parse
from ..session import get_spark
from ..sources.landing import packet_stream_source
from ..streaming.monitor import OFFLINE_THRESHOLD_MINUTES, offline_monitor_stream


def build_monitor_stream(spark, landing_dir: str, threshold_minutes: float) -> DataFrame:
    raw = packet_stream_source(spark, landing_dir)
    heartbeats = extract_nodeinfo(json_envelope_parse(raw)).select(
        "node", "longname", F.col("updated_ts").alias("ts")
    )
    return offline_monitor_stream(heartbeats, threshold_minutes=threshold_minutes)


def alert_batch_writer(ntfy_url: str | None):
    """foreachBatch callable: POST each transition row (or log it)."""

    def on_batch(batch: DataFrame, epoch_id: int) -> None:
        rows = [
            {
                "title": f"Node {r['event']}",
                "message": r["message"] or f"node {r['node']} {r['event']}",
                "priority": "high" if r["event"] == "OFFLINE" else "default",
                "tags": "warning" if r["event"] == "OFFLINE" else "white_check_mark",
            }
            for r in batch.collect()  # bounded: one row per node transition
        ]
        if not rows:
            return
        if ntfy_url:
            from ..sources.sinks import http_alert_sink

            http_alert_sink(rows, ntfy_url)
        else:
            for r in rows:
                print(f"[alert] {r['title']}: {r['message']}", file=sys.stderr)

    return on_batch


def main(argv: list[str] | None = None, spark=None) -> int:
    env = os.environ
    p = argparse.ArgumentParser(prog="monitor")
    p.add_argument(
        "--landing-dir",
        default=env.get("landing_dir"),
        required="landing_dir" not in env,
    )
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument(
        "--threshold-minutes",
        type=float,
        default=float(env.get("offline_threshold_minutes", OFFLINE_THRESHOLD_MINUTES)),
    )
    p.add_argument("--ntfy-url", default=env.get("ntfy_url"))
    p.add_argument(
        "--trigger-seconds",
        type=int,
        default=600,
        help="batch cadence; default mirrors the reference's 600 s "
        "heartbeat scan (AIRWISEv0.py:99). Without an interval the "
        "stateful operator's timers drive back-to-back empty batches.",
    )
    p.add_argument("--once", action="store_true",
                   help="process available input, then stop (testing)")
    args = p.parse_args(argv)

    spark = spark or get_spark("monitor")
    events = build_monitor_stream(spark, args.landing_dir, args.threshold_minutes)
    writer = (
        events.writeStream.foreachBatch(alert_batch_writer(args.ntfy_url))
        .outputMode("update")
        .option("checkpointLocation", args.checkpoint_dir)
    )
    if args.once:
        # Neither processAllAvailable() nor trigger(availableNow) can
        # end a query whose stateful operator uses processing-time
        # timeouts — timer-service batches keep the trigger busy
        # forever (same caveat as tests/test_streaming.py's poll
        # loop). Run untriggered (batches back-to-back) and poll
        # progress: drained once some batch consumed rows and the
        # latest batch consumed none; then stop.
        import time as _time

        query = writer.start()
        deadline = _time.time() + 300
        while _time.time() < deadline:
            progresses = query.recentProgress
            if (
                progresses
                and any(p.numInputRows > 0 for p in progresses)
                and progresses[-1].numInputRows == 0
            ):
                break
            _time.sleep(0.5)
        query.stop()
    else:
        query = writer.trigger(
            processingTime=f"{args.trigger_seconds} seconds"
        ).start()
        query.awaitTermination()
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
