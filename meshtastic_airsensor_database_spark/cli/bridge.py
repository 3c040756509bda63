"""MQTT -> landing-dir bridge daemon.

Deployment counterpart of the reference's in-process subscribe loop
(AIRWISEv0.py:33-38, :266-375): run this next to the ingest service;
it lands every received payload as JSON lines that
``cli.ingest`` streams.

Configuration: flags first, then the reference's env-file keys
(DockerImageForFIREsmartDB/connectionSpecs.env) so one env file drives
the whole compose stack::

    mqtt_broker_address   broker host        (--broker)
    mqtt_port             broker port        (--port)
    mqtt_topics           comma-separated    (--topic, repeatable)
    ntfy_url              alert endpoint     (--ntfy-url)
    landing_dir           output directory   (--landing-dir)

Requires paho-mqtt at runtime (import-gated; see sources/mqtt_bridge).
"""

from __future__ import annotations

import argparse
import os
import sys

from ..sources.mqtt_bridge import (
    DEFAULT_BROKER,
    DEFAULT_PORT,
    DEFAULT_TOPICS,
    run_bridge,
)


def make_ntfy_alert(ntfy_url: str | None):
    """(title, body) callback posting to ntfy, or a stderr fallback."""
    if not ntfy_url:
        return lambda title, body: print(f"[alert] {title}: {body}", file=sys.stderr)

    def post(title: str, body: str) -> None:
        from ..sources.sinks import http_alert_sink

        http_alert_sink([{"title": title, "message": body}], ntfy_url)

    return post


def main(argv: list[str] | None = None, bridge=run_bridge) -> int:
    env = os.environ
    p = argparse.ArgumentParser(prog="bridge")
    p.add_argument(
        "--landing-dir",
        default=env.get("landing_dir"),
        required="landing_dir" not in env,
    )
    p.add_argument("--broker", default=env.get("mqtt_broker_address", DEFAULT_BROKER))
    p.add_argument("--port", type=int, default=int(env.get("mqtt_port", DEFAULT_PORT)))
    p.add_argument(
        "--topic",
        action="append",
        dest="topics",
        help="repeatable; default from $mqtt_topics (comma-separated) "
        "or the reference subscription set",
    )
    p.add_argument("--ntfy-url", default=env.get("ntfy_url"))
    args = p.parse_args(argv)

    topics = args.topics or [
        t.strip() for t in env.get("mqtt_topics", "").split(",") if t.strip()
    ] or list(DEFAULT_TOPICS)

    bridge(
        landing_dir=args.landing_dir,
        broker=args.broker,
        port=args.port,
        topics=topics,
        on_alert=make_ntfy_alert(args.ntfy_url),
    )
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
