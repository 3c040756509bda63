"""Packet parse/route operator tests (SURVEY §5.2 items 1, 3, 5)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from meshtastic_airsensor_database_spark.operators.parse import (
    csv_text_payload_parse,
    json_envelope_parse,
    route_packets,
)
from meshtastic_airsensor_database_spark.schemas import V1_TEXT_FIELDS

from .fixtures import as_json_lines


def _parsed(spark):
    raw = spark.createDataFrame([(line,) for line in as_json_lines()], ["value"])
    return json_envelope_parse(raw)


def test_malformed_json_dropped(spark):
    # 7 lines in; the truncated-JSON line must vanish, others parse
    assert _parsed(spark).count() == 6


def test_route_counts(spark):
    routed = route_packets(_parsed(spark))
    assert routed["battery"].count() == 1
    assert routed["v0_env"].count() == 1
    assert routed["v1_env"].count() == 1  # BAD_TEXT_PACKET dropped
    assert routed["nodeinfo"].count() == 1


def test_v0_env_fields(spark):
    row = route_packets(_parsed(spark))["v0_env"].collect()[0]
    assert row.node == 3127201152
    assert row.pressure == 1009.4
    assert row.gas == 120.3
    assert row.iaq == 55
    assert row.humidity == 48.2
    assert row.temperature == 21.5
    assert row.timestamp_node == 1760748340
    assert row.event_ts is not None


def test_battery_routing_not_double_inserted(spark):
    """battery packets must NOT appear as v0 env facts
    (AIRWISEv0v1comb.py:220-221 exclusion)."""
    routed = route_packets(_parsed(spark))
    env_nodes = {r.node for r in routed["v0_env"].collect()}
    assert 2102560288 not in env_nodes
    bat = routed["battery"].collect()[0]
    assert bat.battery_level == 101.0 and bat.voltage == 0.0


def test_v1_text_positional_mapping(spark):
    row = route_packets(_parsed(spark))["v1_env"].collect()[0]
    assert row.temperature == 21.9
    assert row.pm2_5 == 2.5
    assert row.current_mA == 120.5


def test_nodeinfo_never_a_fact(spark):
    routed = route_packets(_parsed(spark))
    info = routed["nodeinfo"].collect()[0]
    assert info.topic_id == "!43579bd4" and info.longname == "Farm6"
    for slice_name in ("battery", "v0_env", "v1_env"):
        assert 1129728980 not in {r.node for r in routed[slice_name].collect()}


def test_missing_payload_fields_null(spark):
    """.get(key, None) semantics: absent payload keys -> null columns."""
    raw = spark.createDataFrame(
        [('{"from": 1, "type": "telemetry", "timestamp": 5, "payload": {}}',)],
        ["value"],
    )
    row = route_packets(json_envelope_parse(raw))["v0_env"].collect()[0]
    assert row.temperature is None and row.iaq is None and row.pressure is None


@settings(max_examples=25, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False).map(lambda x: round(x, 3)),
                min_size=9, max_size=9))
def test_v1_csv_roundtrip_property(spark, values):
    """Any 9 floats rendered to CSV re-parse to the same values
    (AIRWISEv1.py:129-157 semantics)."""
    text = ",".join(repr(v) for v in values)
    df = spark.createDataFrame([(text,)], ["t"]).select(
        *csv_text_payload_parse(F.col("t"))
    )
    row = df.collect()[0]
    for name, expected in zip(V1_TEXT_FIELDS, values):
        assert row[name] == expected
