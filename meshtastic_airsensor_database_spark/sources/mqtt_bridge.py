"""Out-of-process MQTT -> landing-directory bridge (SURVEY.md §4.2 #1).

Replaces the reference's in-process paho callback loop
(AIRWISEv0.py:266-274 subscribe, :375 loop_forever) with the standard
Spark ingest pattern for push-style brokers: a small standalone process
appends each received payload as one JSON line and rolls files every
``flush_every``/``flush_seconds``; the engine streams the directory via
``packet_stream_source`` with exactly-once file tracking.

Why out-of-process: Spark's file/Kafka sources pull; MQTT pushes. The
bridge is the durability boundary — once a payload is in a published
landing file, a Spark restart cannot lose it (unlike the reference,
where a crash between MQTT ack and INSERT drops the packet).

Import-gated: paho-mqtt is not installed in this container, so
``run_bridge`` raises NotImplementedError unless it is. The file-rolling
logic is pure stdlib and fully tested via ``LandingWriter``.
"""

from __future__ import annotations

import time
from collections.abc import Sequence

from .landing import write_packet_fixture

# Reference subscription set (AIRWISEv0.py:33-38) and broker endpoint
# (AIRWISEv0.py:12-13), kept as defaults for parity.
DEFAULT_BROKER = "mqtt.meshtastic.org"
DEFAULT_PORT = 1883
DEFAULT_TOPICS = (
    "msh/US/CA/eureka/2/json/AirWise/#",
    "msh/US/CA/eureka/2/json/LongFast/#",
)
DEFAULT_KEEPALIVE_S = 60  # client.connect(..., 60) AIRWISEv0.py:365
DEFAULT_CONNECT_TIMEOUT_S = 20  # _connect_timeout AIRWISEv1.py:411


class LandingWriter:
    """Buffers payload lines and publishes rolled landing files atomically."""

    def __init__(self, landing_dir: str, flush_every: int = 500, flush_seconds: float = 5.0):
        self.landing_dir = landing_dir
        self.flush_every = flush_every
        self.flush_seconds = flush_seconds
        self._buf: list[str] = []
        self._seq = 0
        self._last_flush = time.monotonic()

    def add(self, payload: str, now: float | None = None) -> str | None:
        """Buffer one payload; returns the published path when a roll happens."""
        self._buf.append(payload)
        now = time.monotonic() if now is None else now
        if len(self._buf) >= self.flush_every or (now - self._last_flush) >= self.flush_seconds:
            return self.flush(now)
        return None

    def flush(self, now: float | None = None) -> str | None:
        if not self._buf:
            return None
        path = write_packet_fixture(
            self.landing_dir, self._buf, f"packets-{self._seq:010d}.jsonl"
        )
        self._seq += 1
        self._buf = []
        self._last_flush = time.monotonic() if now is None else now
        return path


class BridgeSession:
    """Connection lifecycle for the bridge, client-agnostic and
    therefore testable without paho or a live broker.

    Reference semantics modeled (behavior, not code):
    - successful connect (re)subscribes every topic — AIRWISEv0.py:266-274
      (paho drops subscriptions across reconnects unless clean_session
      is false; the reference resubscribes in on_connect);
    - clean disconnect (rc == 0) is final — AIRWISEv0.py:307-309;
    - unexpected disconnect alerts once (the reference ntfy POST,
      AIRWISEv0.py:310-313) and then re-establishes the connection —
      the reference delegates retry to paho's loop_forever; here the
      retry loop is explicit, with exponential backoff capped at
      ``reconnect_max_s`` so a dead broker cannot hot-loop the bridge.

    ``client`` needs three methods: ``subscribe(topic)``,
    ``reconnect()`` (raising on failure), ``disconnect()``.
    """

    def __init__(
        self,
        client,
        writer: LandingWriter,
        topics: Sequence[str] = DEFAULT_TOPICS,
        on_alert=None,
        reconnect_initial_s: float = 1.0,
        reconnect_max_s: float = 60.0,
        max_reconnect_attempts: int | None = None,
        sleep=time.sleep,
    ):
        self.client = client
        self.writer = writer
        self.topics = tuple(topics)
        self.on_alert = on_alert or (lambda title, body: None)
        self.reconnect_initial_s = reconnect_initial_s
        self.reconnect_max_s = reconnect_max_s
        self.max_reconnect_attempts = max_reconnect_attempts
        self._sleep = sleep
        self.n_reconnects = 0

    def on_connect(self, rc: int) -> None:
        if rc == 0:
            for topic in self.topics:
                self.client.subscribe(topic)
        else:
            self.on_alert("bridge connect failed", f"reason code {rc}")

    def on_message(self, payload: bytes) -> None:
        self.writer.add(payload.decode("utf-8", errors="replace"))

    def on_disconnect(self, rc: int) -> None:
        if rc == 0:
            self.writer.flush()  # clean shutdown: publish the tail
            return
        self.on_alert("bridge disconnected", f"unexpected disconnect rc={rc}")
        delay = self.reconnect_initial_s
        attempts = 0
        while True:
            try:
                self.client.reconnect()
            except Exception:
                attempts += 1
                if (
                    self.max_reconnect_attempts is not None
                    and attempts >= self.max_reconnect_attempts
                ):
                    self.writer.flush()  # giving up: land what we have
                    raise
                self._sleep(delay)
                delay = min(delay * 2, self.reconnect_max_s)
            else:
                self.n_reconnects += 1
                return  # paho fires on_connect after reconnect -> resubscribe


def run_bridge(
    landing_dir: str,
    broker: str = DEFAULT_BROKER,
    port: int = DEFAULT_PORT,
    topics: Sequence[str] = DEFAULT_TOPICS,
    keepalive_s: int = DEFAULT_KEEPALIVE_S,
    on_alert=None,
) -> None:  # pragma: no cover - requires a live broker + paho
    """Subscribe and land every message; blocks forever (loop_forever parity)."""
    try:
        import paho.mqtt.client as mqtt
    except ImportError as exc:
        raise NotImplementedError("run_bridge requires the 'paho-mqtt' package") from exc

    writer = LandingWriter(landing_dir)
    client = mqtt.Client()
    session = BridgeSession(client, writer, topics, on_alert=on_alert)
    client.on_connect = lambda c, u, flags, rc, properties=None: session.on_connect(
        getattr(rc, "value", rc)
    )
    client.on_message = lambda c, u, message: session.on_message(message.payload)
    client.on_disconnect = lambda c, u, rc, properties=None, reason_code=None: (
        session.on_disconnect(getattr(rc, "value", rc))
    )
    client.connect(broker, port, keepalive_s)
    try:
        client.loop_forever()
    finally:
        writer.flush()
