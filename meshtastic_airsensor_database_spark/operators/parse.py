"""Packet parsing, routing and fact extraction (SURVEY.md §2.2, §2.8, §2.9).

The reference parses each MQTT JSON packet up to four times in Python
(AIRWISEv0v1comb.py:119,170,201,345) and routes it imperatively. Here the
whole discriminated union is ONE ``from_json`` + three declarative
filter/select branches over the same parsed DataFrame — Catalyst reuses
the parse across branches, and every expression is codegen'd.

Routing rules re-expressed (SURVEY §1.3):
- type='telemetry' AND payload.battery_level present  -> battery fact
  (AIRWISEv0.py:126-140; presence == isNotNull under from_json).
- type='telemetry' otherwise                          -> v0 env fact
  (AIRWISEv0.py:142-153); battery packets excluded so they are not
  double-inserted (AIRWISEv0v1comb.py:220-221).
- type='text'  -> v1 env fact from the 9-float CSV payload string
  (AIRWISEv1.py:118-161).
- type='nodeinfo' -> dimension upsert + heartbeat, never a fact
  (AIRWISEv0.py:239-262).
- anything else -> dropped (AIRWISEv0.py:112-114).
- malformed JSON / bad floats -> row dropped, pipeline continues
  (AIRWISEv0.py:155-157, AIRWISEv1.py:163-165).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import epoch_to_timestamp, ingest_wallclock_stamp
from ..schemas import PACKET_SCHEMA, V1_TEXT_FIELDS

RAW_COLUMN = "value"  # raw JSON string column name on the input stream


def json_envelope_parse(raw: DataFrame, raw_col: str = RAW_COLUMN) -> DataFrame:
    """Raw JSON string -> typed ``packet`` struct column.

    PERMISSIVE semantics: corrupt JSON -> null struct (dropped, matching
    the reference's try/except skip, AIRWISEv0.py:155-157); absent keys
    -> null fields (matching ``.get(key, None)``, AIRWISEv0.py:132-135).
    """
    parsed = raw.withColumn("packet", F.from_json(F.col(raw_col), PACKET_SCHEMA))
    return parsed.filter(F.col("packet").isNotNull() & F.col("packet.type").isNotNull())


def packet_type_filter(parsed: DataFrame, ptype: str) -> DataFrame:
    """Keep packets of one type (AIRWISEv0.py:112-114 routing)."""
    return parsed.filter(F.col("packet.type") == F.lit(ptype))


def battery_presence_predicate() -> Column:
    """Power-vs-env telemetry discriminator (AIRWISEv0.py:126)."""
    return F.col("packet.payload.battery_level").isNotNull()


def _common_fact_cols(event_time_is_device: bool = True) -> list[Column]:
    cols = [
        F.col("packet.from").alias("node"),
        F.col("packet.timestamp").alias("timestamp_node"),
        ingest_wallclock_stamp().alias("pst_time"),
    ]
    if event_time_is_device:
        cols.append(epoch_to_timestamp(F.col("packet.timestamp")).alias("event_ts"))
    return cols


def extract_battery_facts(parsed: DataFrame) -> DataFrame:
    """telemetry + battery_level present -> battery fact rows.

    Mirrors AIRWISEv0.py:128-140. The engine keeps ``timestamp_node``
    (the reference INSERT drops it, AIRWISEv0.py:171-183 — documented
    deviation in schemas.py).
    """
    return packet_type_filter(parsed, "telemetry").filter(battery_presence_predicate()).select(
        *_common_fact_cols(),
        F.col("packet.payload.voltage").alias("voltage"),
        F.col("packet.payload.battery_level").alias("battery_level"),
    )


def extract_v0_env_facts(parsed: DataFrame) -> DataFrame:
    """telemetry without battery_level -> v0 environment fact rows.

    Mirrors AIRWISEv0.py:142-153; exclusion of battery packets mirrors
    AIRWISEv0v1comb.py:220-221.
    """
    return packet_type_filter(parsed, "telemetry").filter(~battery_presence_predicate()).select(
        *_common_fact_cols(),
        F.col("packet.payload.barometric_pressure").alias("pressure"),
        F.col("packet.payload.gas_resistance").alias("gas"),
        F.col("packet.payload.iaq").alias("iaq"),
        F.col("packet.payload.relative_humidity").alias("humidity"),
        F.col("packet.payload.temperature").alias("temperature"),
    )


def csv_text_payload_parse(text_col: Column) -> list[Column]:
    """Split the v1 9-float CSV payload string into named double columns.

    Mirrors AIRWISEv1.py:129-157: split on commas, trim, cast to float
    with error->null (``try_cast``), positions mapped to V1_TEXT_FIELDS.
    """
    arr = F.split(F.trim(text_col), r"\s*,\s*")
    return [
        # try_element_at: short arrays -> null (not an ANSI error), matching
        # the reference's IndexError/ValueError drop path.
        F.try_element_at(arr, F.lit(i + 1)).try_cast("double").alias(name)
        for i, name in enumerate(V1_TEXT_FIELDS)
    ]


def extract_v1_env_facts(parsed: DataFrame) -> DataFrame:
    """type='text' packets -> v1 environment fact rows.

    Mirrors AIRWISEv1.py:118-161. A payload whose text is not 9 parseable
    floats is dropped whole (the reference's ValueError path,
    AIRWISEv1.py:163-165): we require all 9 positions non-null.
    """
    base = packet_type_filter(parsed, "text").filter(F.col("packet.payload.text").isNotNull())
    projected = base.select(
        *_common_fact_cols(), *csv_text_payload_parse(F.col("packet.payload.text"))
    )
    all_present = None
    for name in V1_TEXT_FIELDS:
        cond = F.col(name).isNotNull()
        all_present = cond if all_present is None else (all_present & cond)
    return projected.filter(all_present)


def extract_nodeinfo(parsed: DataFrame) -> DataFrame:
    """type='nodeinfo' -> dimension-update rows (AIRWISEv0.py:239-262)."""
    return packet_type_filter(parsed, "nodeinfo").select(
        F.col("packet.from").alias("node"),
        F.col("packet.payload.id").alias("topic_id"),
        F.col("packet.payload.longname").alias("longname"),
        epoch_to_timestamp(F.col("packet.timestamp")).alias("updated_ts"),
    )


def route_packets(parsed: DataFrame) -> dict[str, DataFrame]:
    """One parsed stream -> the 4-way routed slices (stream_route_multiplex).

    Mirrors the combined daemon offering each payload to all parsers
    (AIRWISEv0v1comb.py:393-395) — but parses ONCE and filters four ways.
    """
    return {
        "battery": extract_battery_facts(parsed),
        "v0_env": extract_v0_env_facts(parsed),
        "v1_env": extract_v1_env_facts(parsed),
        "nodeinfo": extract_nodeinfo(parsed),
    }
