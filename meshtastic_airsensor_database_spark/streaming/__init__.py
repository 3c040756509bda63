"""Structured Streaming shell (SURVEY.md §2.9, §7.1 M3-M4).

The batch operators (operators/) are pure DataFrame->DataFrame, so the
streaming layer is a thin shell: a landing-dir file source, one
foreachBatch multiplexer that routes each micro-batch to the three fact
tables and upserts the node dimension, and a keyed-state monitoring
operator for offline detection + edge-deduplicated alerts.
"""

from .ingest import IngestPaths, run_ingest_stream
from .monitor import (
    OFFLINE_THRESHOLD_MINUTES,
    SCAN_PERIOD_SECONDS,
    offline_monitor_stream,
    outage_episodes,
)

__all__ = [
    "IngestPaths",
    "OFFLINE_THRESHOLD_MINUTES",
    "SCAN_PERIOD_SECONDS",
    "offline_monitor_stream",
    "outage_episodes",
    "run_ingest_stream",
]
