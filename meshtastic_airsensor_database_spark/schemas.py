"""Schema registry (SURVEY.md §1).

Single source of truth for every table/stream schema the engine touches.
The reference declares its schemas in bash DDL (EUREKATables.sh:33,52)
and implies the packet envelope shape in parser code; we make both
explicit ``StructType``s so Catalyst can prune/push down and so
``from_json`` gives the reference's ``.get(key, None)`` null semantics
(missing field -> null) for free.

Reference parity notes:
- packet envelope reconstructed from AIRWISEv1.py:46-54 and
  AIRWISEv0v1comb.py:45-53 sample payloads plus the parser code
  (AIRWISEv0.py:105-157).
- REAL -> DoubleType (widened deliberately; DuckDB-oracle parity).
- battery_data drops timestamp_node in the reference INSERT
  (AIRWISEv0.py:171-183); we KEEP it (nullable) and document the
  deviation — dropping event time is a bug, not a feature.
- airwise_datav1 has no DDL in the reference; the 14-column schema
  implied by AIRWISEv1.py:232-235 is canonical here, with the combined
  daemon's 12-column drift (AIRWISEv0v1comb.py:271-274) resolved by
  nullable power columns.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Packet envelope (SURVEY §1.3) — the central streaming input record.
# ---------------------------------------------------------------------------

PAYLOAD_SCHEMA = T.StructType(
    [
        # telemetry / environment variant (v0 hardware, BME680) — AIRWISEv0.py:144-148
        T.StructField("temperature", T.DoubleType()),
        T.StructField("relative_humidity", T.DoubleType()),
        T.StructField("barometric_pressure", T.DoubleType()),
        T.StructField("gas_resistance", T.DoubleType()),
        T.StructField("iaq", T.IntegerType()),
        # telemetry / power variant — discriminated by battery_level presence
        # (AIRWISEv0.py:126); from_json yields null for absent keys, so the
        # presence test becomes an isNotNull test.
        T.StructField("battery_level", T.DoubleType()),
        T.StructField("voltage", T.DoubleType()),
        T.StructField("air_util_tx", T.DoubleType()),
        T.StructField("channel_utilization", T.DoubleType()),
        T.StructField("uptime_seconds", T.LongType()),
        # type='text' (v1 hardware): CSV string of 9 floats — AIRWISEv1.py:46,147-157
        T.StructField("text", T.StringType()),
        # type='nodeinfo' — AIRWISEv0.py:248-250
        T.StructField("id", T.StringType()),
        T.StructField("longname", T.StringType()),
        T.StructField("shortname", T.StringType()),
        T.StructField("hardware", T.StringType()),
    ]
)

PACKET_SCHEMA = T.StructType(
    [
        T.StructField("channel", T.IntegerType()),
        T.StructField("from", T.LongType()),  # unsigned-32 node ids need LongType
        T.StructField("sender", T.StringType()),
        T.StructField("to", T.LongType()),
        T.StructField("id", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("timestamp", T.LongType()),  # epoch seconds, device event time
        T.StructField("hop_start", T.IntegerType()),
        T.StructField("hops_away", T.IntegerType()),
        T.StructField("rssi", T.IntegerType()),
        T.StructField("snr", T.DoubleType()),
        T.StructField("payload", PAYLOAD_SCHEMA),
    ]
)

# ---------------------------------------------------------------------------
# Canonical fact tables (SURVEY §1.4)
# ---------------------------------------------------------------------------

AIRWISE_DATA_SCHEMA = T.StructType(  # EUREKATables.sh:33
    [
        T.StructField("node", T.LongType()),
        T.StructField("topic_id", T.StringType()),
        T.StructField("longname", T.StringType()),
        T.StructField("pressure", T.DoubleType()),
        T.StructField("gas", T.DoubleType()),
        T.StructField("iaq", T.IntegerType()),
        T.StructField("humidity", T.DoubleType()),
        T.StructField("temperature", T.DoubleType()),
        T.StructField("timestamp_node", T.LongType()),
        T.StructField("pst_time", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),  # engine addition: typed event time
    ]
)

BATTERY_DATA_SCHEMA = T.StructType(  # EUREKATables.sh:52 (+ timestamp_node kept, see module doc)
    [
        T.StructField("node", T.LongType()),
        T.StructField("topic_id", T.StringType()),
        T.StructField("longname", T.StringType()),
        T.StructField("voltage", T.DoubleType()),
        T.StructField("battery_level", T.DoubleType()),
        T.StructField("timestamp_node", T.LongType()),
        T.StructField("pst_time", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)

AIRWISE_DATAV1_SCHEMA = T.StructType(  # implied by AIRWISEv1.py:232-235
    [
        T.StructField("node", T.LongType()),
        T.StructField("topic_id", T.StringType()),
        T.StructField("longname", T.StringType()),
        T.StructField("temperature", T.DoubleType()),
        T.StructField("humidity", T.DoubleType()),
        T.StructField("pressure", T.DoubleType()),
        T.StructField("gas", T.DoubleType()),
        T.StructField("pm1_0", T.DoubleType()),
        T.StructField("pm2_5", T.DoubleType()),
        T.StructField("pm10", T.DoubleType()),
        T.StructField("bus_voltage", T.DoubleType()),
        T.StructField("current_mA", T.DoubleType()),
        T.StructField("timestamp_node", T.LongType()),
        T.StructField("pst_time", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)

# v1 'text' payload positional layout — AIRWISEv1.py:147-157
V1_TEXT_FIELDS = [
    "temperature",
    "humidity",
    "pressure",
    "gas",
    "pm1_0",
    "pm2_5",
    "pm10",
    "bus_voltage",
    "current_mA",
]

# Node dimension (AIRWISEv0.py:41-49 seeds it; nodeinfo packets upsert it)
NODE_DIM_SCHEMA = T.StructType(
    [
        T.StructField("node", T.LongType(), False),
        T.StructField("topic_id", T.StringType()),
        T.StructField("longname", T.StringType()),
        T.StructField("updated_ts", T.TimestampType()),
    ]
)

# Seed fleet from AIRWISEv0.py:41-49 (6 nodes)
NODE_DIM_SEED = [
    (3127201152, "!ba654d80", "Farm1"),
    (2102560288, "!7d54e620", "Farm2"),
    (3127248732, "!ba660b5c", "Farm3"),
    (2102559768, "!7d54e418", "Farm4"),
    (3127248580, "!ba660ac4", "Farm5"),
    (1129728980, "!43579bd4", "Farm6"),
]

# PurpleAir reference-sensor clean output — cleandata.py:32-40
PURPLEAIR_CLEAN_COLUMNS = [
    "PacificTime",
    "current_temp_f",
    "current_humidity",
    "pressure",
    "pm1_0_atm",
    "pm2_5_atm",
    "pm10_0_atm",
]

# ---------------------------------------------------------------------------
# Driver-provided synthetic testdata tables (TESTDATA.md) — explicit schemas
# so readers never pay inference and column pruning is exact.
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
