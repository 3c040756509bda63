"""Profile the streaming ingest micro-batch: where does the per-batch
wall time go? Replays bench.py's deterministic 20k-packet stream (same
24-file / 4-per-trigger layout) with ``phase_clock`` instrumentation on
(streaming/ingest.py), then prints accumulated per-phase seconds plus
the residual (trigger time not inside any phase = source discovery +
watermark dedup + parse/cache + planning).

Usage: python tools/profile_stream_batch.py [n_packets]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import gen_packets
from meshtastic_airsensor_database_spark.session import get_spark
from meshtastic_airsensor_database_spark.sources.landing import write_packet_fixture
from meshtastic_airsensor_database_spark.streaming.ingest import (
    IngestPaths,
    run_ingest_stream,
)


def main() -> None:
    vol = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark("profile-stream")
    root = tempfile.mkdtemp(prefix="profile_stream_")
    n_files, mfpt = 24, 4
    clock: dict[str, float] = {}
    try:
        paths = IngestPaths(os.path.join(root, "landing"), os.path.join(root, "out"))
        lines = gen_packets(vol)
        per = (len(lines) + n_files - 1) // n_files
        base_t = time.time() - 2 * n_files
        for fi in range(n_files):
            chunk = lines[fi * per : (fi + 1) * per]
            if chunk:
                p = write_packet_fixture(paths.landing_dir, chunk, f"b{fi:03d}.jsonl")
                os.utime(p, (base_t + 2 * fi, base_t + 2 * fi))
        t0 = time.time()
        q = run_ingest_stream(
            spark,
            paths,
            max_files_per_trigger=mfpt,
            dedup_within_watermark=True,
            phase_clock=clock,
        )
        q.processAllAvailable()
        wall = time.time() - t0
        prog = [p for p in (q.recentProgress or []) if p.get("numInputRows", 0) > 0]
        q.stop()
        trig_ms = [p["durationMs"]["triggerExecution"] for p in prog]
        phase_total = sum(clock.values())
        print(f"packets={vol} wall={wall:.2f}s micro_batches={len(prog)}")
        print(f"trigger_ms={sorted(trig_ms)} (sum {sum(trig_ms)/1000:.2f}s)")
        for name, sec in sorted(clock.items(), key=lambda kv: -kv[1]):
            print(f"  {name:>22}: {sec:6.2f}s ({sec/len(prog):.2f}s/batch)")
        resid = sum(trig_ms) / 1000 - phase_total
        print(f"  {'<residual>':>22}: {resid:6.2f}s ({resid/len(prog):.2f}s/batch)"
              "  [source listing + watermark dedup + parse + planning]")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
