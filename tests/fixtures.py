"""Golden packet fixtures.

Shapes reconstructed from the captured real packets the reference
authors preserved as comments (AIRWISEv1.py:46-54,
AIRWISEv0v1comb.py:45-53) — node ids/topics from the seed fleet
(AIRWISEv0.py:41-49). Plus malformed variants for the
drop-and-continue contract (AIRWISEv0.py:155-157).
"""

import json

V0_ENV_PACKET = {
    "channel": 0,
    "from": 3127201152,
    "sender": "!ba654d80",
    "to": 4294967295,
    "id": 1001,
    "type": "telemetry",
    "timestamp": 1760748340,
    "hop_start": 3,
    "hops_away": 0,
    "rssi": -70,
    "snr": 6.5,
    "payload": {
        "temperature": 21.5,
        "relative_humidity": 48.2,
        "barometric_pressure": 1009.4,
        "gas_resistance": 120.3,
        "iaq": 55,
    },
}

BATTERY_PACKET = {
    "channel": 0,
    "from": 2102560288,
    "sender": "!7d54e620",
    "to": 4294967295,
    "id": 1002,
    "type": "telemetry",
    "timestamp": 1760748341,
    "payload": {"battery_level": 101.0, "voltage": 0.0, "uptime_seconds": 42},
}

V1_TEXT_PACKET = {
    "channel": 0,
    "from": 3127248732,
    "sender": "!ba660b5c",
    "to": 4294967295,
    "id": 1003,
    "type": "text",
    "timestamp": 1760748342,
    "payload": {"text": "21.9,50.1,1008.8,99.2,1.0,2.5,10.0,4.98,120.5\n"},
}

NODEINFO_PACKET = {
    "channel": 0,
    "from": 1129728980,
    "sender": "!43579bd4",
    "to": 4294967295,
    "id": 1004,
    "type": "nodeinfo",
    "timestamp": 1760748343,
    "payload": {"id": "!43579bd4", "longname": "Farm6", "shortname": "F6"},
}

OTHER_TYPE_PACKET = {
    "from": 3127201152,
    "id": 1005,
    "type": "position",
    "timestamp": 1760748344,
    "payload": {},
}

MALFORMED_JSON = '{"from": 123, "type": "telemetry", '  # truncated
BAD_TEXT_PACKET = {
    "from": 3127248732,
    "id": 1006,
    "type": "text",
    "timestamp": 1760748345,
    "payload": {"text": "21.9,oops,1008.8"},  # non-float + too short
}

ALL_GOOD = [V0_ENV_PACKET, BATTERY_PACKET, V1_TEXT_PACKET, NODEINFO_PACKET]


def as_json_lines() -> list[str]:
    lines = [json.dumps(p) for p in ALL_GOOD + [OTHER_TYPE_PACKET, BAD_TEXT_PACKET]]
    lines.append(MALFORMED_JSON)
    return lines
