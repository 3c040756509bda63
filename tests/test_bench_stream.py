"""Guards for the streaming-bench packet generator (bench.py):
bench_stream.json's round-over-round comparability rests on the
generator being deterministic and its class mix stable."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import gen_packets  # noqa: E402


def test_gen_packets_deterministic():
    assert gen_packets(3000) == gen_packets(3000)


def test_gen_packets_class_mix_and_duplicates():
    lines = gen_packets(10_000)
    assert len(lines) == 10_000
    parsed, corrupt = [], 0
    for ln in lines:
        try:
            parsed.append(json.loads(ln))
        except json.JSONDecodeError:
            corrupt += 1
    assert corrupt == 100  # 1 per 100, exactly
    types = {}
    for p in parsed:
        types[p["type"]] = types.get(p["type"], 0) + 1
    # 55% env + 15% battery telemetry (+ telemetry dupes land here too)
    assert types["telemetry"] >= 7000
    assert types["text"] >= 1500  # v1 CSV payloads
    assert types["nodeinfo"] >= 500
    assert types["position"] == 300  # quarantine route, 3 per 100
    # re-broadcast duplicates: verbatim copies of an EARLIER parseable
    # line (same composite [from, id] key -> real dedup load)
    seen, dup_of_earlier = set(), 0
    for ln in lines:
        if ln in seen:
            dup_of_earlier += 1
        seen.add(ln)
    # 600 dup slots (6 per 100) + 99 repeats of the (identical) corrupt
    # line — all 100 corrupt lines are the same truncated JSON string
    assert dup_of_earlier == 699


def test_gen_packets_v1_payload_parses_as_csv():
    # the v1 text route needs 9 comma-separated floats (csv_text_payload_parse)
    for ln in gen_packets(400):
        try:
            p = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if p["type"] == "text":
            vals = p["payload"]["text"].strip().split(",")
            assert len(vals) == 9 and all(float(v) is not None for v in vals)
