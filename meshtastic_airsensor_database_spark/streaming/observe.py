"""Streaming observability: StreamingQueryProgress -> DataFrame.

A 1000-executor deployment lives or dies by its per-batch telemetry:
input rate vs processing rate (falling behind?), batch duration
breakdown (where does the time go?), state-store growth (leaking
keys?), and watermark lag (how stale is event time vs wall clock?).
Spark already emits all of it as `StreamingQueryProgress` JSON on the
driver; this module flattens the recent-progress ring buffer into a
typed DataFrame so the same engine that runs the pipeline can query
its own health — joinable, windowable, sinkable like any fact table.

Driver-side cost: `recentProgress` is a bounded ring buffer
(spark.sql.streaming.numRecentProgressUpdates, default 100 entries),
so harvesting is O(1) in stream volume.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PROGRESS_SCHEMA = (
    "query_id string, run_id string, batch_id long, ts timestamp, "
    "num_input_rows long, input_rows_per_second double, "
    "processed_rows_per_second double, batch_duration_ms long, "
    "state_rows long, state_bytes long, watermark timestamp"
)


def _parse_iso(ts: str | None) -> datetime | None:
    if not ts:
        return None
    try:
        # Spark emits e.g. 2024-01-01T00:00:00.123Z
        return datetime.fromisoformat(ts.replace("Z", "+00:00")).astimezone(
            timezone.utc
        ).replace(tzinfo=None)
    except ValueError:
        return None


def progress_frame(spark: SparkSession, queries) -> DataFrame:
    """Flatten one or more StreamingQuery handles' recent progress into
    a typed DataFrame. The epoch-unstarted watermark sentinel
    (1970-01-01) is normalized to NULL so lag math never sees it."""
    if not isinstance(queries, (list, tuple)):
        queries = [queries]
    rows = []
    for q in queries:
        for p in q.recentProgress:
            if isinstance(p, str):  # older API returns JSON strings
                p = json.loads(p)
            state = (p.get("stateOperators") or [{}])[0]
            wm = _parse_iso((p.get("eventTime") or {}).get("watermark"))
            if wm is not None and wm.year <= 1970:
                wm = None
            rows.append(
                (
                    p.get("id"),
                    p.get("runId"),
                    p.get("batchId"),
                    _parse_iso(p.get("timestamp")),
                    p.get("numInputRows"),
                    p.get("inputRowsPerSecond"),
                    p.get("processedRowsPerSecond"),
                    (p.get("durationMs") or {}).get("triggerExecution"),
                    state.get("numRowsTotal"),
                    state.get("stateMemory") or state.get("memoryUsedBytes"),
                    wm,
                )
            )
    return spark.createDataFrame(rows, PROGRESS_SCHEMA)


def progress_health(frame: DataFrame) -> DataFrame:
    """Per-query health rollup over a progress frame: total rows, mean
    rates, p95 batch duration, max state size, and the worst watermark
    lag (batch wall-clock minus watermark) — the one number that says
    how far event time trails reality."""
    lag_s = F.unix_timestamp("ts") - F.unix_timestamp("watermark")
    return frame.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_batches"),
        F.sum("num_input_rows").cast("long").alias("total_rows"),
        F.round(F.avg("processed_rows_per_second"), 1).alias("avg_proc_rate"),
        F.expr("percentile(batch_duration_ms, 0.95)").alias("p95_batch_ms"),
        F.max("state_rows").alias("max_state_rows"),
        F.max(lag_s).alias("max_watermark_lag_s"),
    )
