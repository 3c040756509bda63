"""Packet landing-directory source (SURVEY.md §2.1 `mqtt_json_source`).

Spark has no built-in MQTT source, so the ingest boundary is split in
two (SURVEY §4.2):

1. an out-of-process bridge (mqtt_bridge.py) appends each received MQTT
   payload as one JSON line into a landing directory;
2. the engine consumes that directory — `readStream.text` for the live
   pipeline, `read.text` for replay/tests — and everything downstream
   (parse, route, enrich, state) is identical in both modes.

This is the standard Spark pattern for push-style brokers without a
connector: land, then stream the landing zone with exactly-once file
tracking (the file source checkpoint remembers processed files).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.parse import RAW_COLUMN


def packet_batch_source(
    spark: SparkSession, landing_dir: str, recursive: bool = False
) -> DataFrame:
    """Replay a landing directory as a batch DataFrame of raw JSON lines.

    ``recursive=True`` descends into subdirectories — the shape a
    ``cleanSource='archive'`` retirement leaves behind (Spark archives
    each file under ``sourceArchiveDir`` + its original absolute path),
    so replaying an ARCHIVE is ``packet_batch_source(spark, archive_dir,
    recursive=True)``; a live landing dir stays flat.
    """
    reader = spark.read
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.text(landing_dir).withColumnRenamed("value", RAW_COLUMN)


def packet_stream_source(
    spark: SparkSession,
    landing_dir: str,
    max_files_per_trigger: int | None = None,
    clean_source: str | None = None,
    source_archive_dir: str | None = None,
) -> DataFrame:
    """Stream a landing directory as micro-batches of raw JSON lines.

    ``maxFilesPerTrigger`` bounds per-batch work (backpressure); the
    file-source checkpoint provides exactly-once file accounting across
    restarts — the durability the reference's in-memory callback loop
    lacks (a crash between MQTT ack and INSERT loses the packet,
    AIRWISEv0.py:276-305).

    ``clean_source`` ('archive' | 'delete') retires PROCESSED landing
    files (Spark's file-source cleaner, async): without it a
    long-running deployment's landing dir grows forever and every
    trigger re-lists it — O(all files ever landed) driver work per
    batch, the one part of this source that would NOT survive months of
    production ingest. 'archive' moves processed files under
    ``source_archive_dir`` (kept for audit/replay — note a replay then
    needs the archive, not the landing dir); 'delete' removes them (the
    facts + quarantine tables are the durable record). Cleanup is
    post-commit, so crash-replayed files are still present for the
    replayed epoch.
    """
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if clean_source is not None:
        reader = reader.option("cleanSource", clean_source)
        if clean_source == "archive":
            if source_archive_dir is None:
                raise ValueError("clean_source='archive' needs source_archive_dir")
            reader = reader.option("sourceArchiveDir", source_archive_dir)
    return reader.text(landing_dir).withColumnRenamed("value", RAW_COLUMN)


def write_packet_fixture(landing_dir: str, packets: list[str], filename: str) -> str:
    """Append a batch of raw JSON packet lines as one landing file.

    Test/bridge helper: one file per flush matches how the MQTT bridge
    rolls files, and gives the streaming file source natural micro-batch
    boundaries.
    """
    os.makedirs(landing_dir, exist_ok=True)
    path = os.path.join(landing_dir, filename)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        for p in packets:
            fh.write(p.rstrip("\n") + "\n")
    os.rename(tmp, path)  # atomic publish so the file source never sees partial files
    return path
