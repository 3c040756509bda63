"""Custom PySpark DataSource for Meshtastic packet landing files
(SURVEY.md §4.2 #1 stretch goal — the Spark 4 Python data source API).

``spark.read.format("meshtastic_packets")`` turns a landing directory of
JSON-lines packet files straight into TYPED envelope rows (the
PACKET_SCHEMA struct flattened at the top level), so consumers skip the
raw-text + from_json step. The generic path (sources/landing.py +
operators/parse.py) remains the default — built-in file sources get
vectorized readers and streaming checkpoints the Python API does not —
but this demonstrates the full custom-connector surface for brokers or
formats Spark has no reader for (the reference's MQTT ingest boundary,
AIRWISEv0.py:266-375).

Scale shape: one InputPartition per landing file (the same split
granularity the built-in text source uses for small files); partitions
parse independently with stdlib json, yielding tuples in schema order.
Malformed lines are dropped (AIRWISEv0.py:155-157 semantics).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from ..schemas import PACKET_SCHEMA

FORMAT_NAME = "meshtastic_packets"


def _flat_schema() -> StructType:
    """Envelope fields at top level; 'from' renamed to 'node' (valid
    identifier), payload kept as a nested struct."""
    fields = []
    for f in PACKET_SCHEMA.fields:
        name = "node" if f.name == "from" else f.name
        fields.append((name, f))
    schema = StructType()
    for name, f in fields:
        schema = schema.add(name, f.dataType, True)
    return schema


def _coerce(value, dtype):
    """Scalar coercion matching from_json PERMISSIVE nulls: a value of
    the wrong JSON type becomes null (never truncated/reinterpreted) —
    so this source and the from_json path agree on every input line.
    """
    if value is None or isinstance(value, bool):
        return None  # JSON booleans don't parse into numeric/string fields
    t = dtype.simpleString()
    if t in ("bigint", "int"):
        return value if isinstance(value, int) else None
    if t == "double":
        return float(value) if isinstance(value, (int, float)) else None
    if t == "string":
        return value if isinstance(value, str) else None
    return value


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class PacketDataSourceReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        expected = [f.name for f in _flat_schema().fields]
        if [f.name for f in schema.fields] != expected:
            raise ValueError(
                "meshtastic_packets does not support user-specified schemas; "
                f"the source schema is fixed to {expected}"
            )
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("meshtastic_packets requires a path option")

    def partitions(self) -> Sequence[InputPartition]:
        if os.path.isfile(self.path):
            return [_FilePartition(self.path)]
        if not os.path.isdir(self.path):
            raise FileNotFoundError(f"meshtastic_packets path not found: {self.path}")
        files = sorted(
            p
            for n in os.listdir(self.path)
            if not n.startswith(("_", "."))
            and os.path.isfile(p := os.path.join(self.path, n))
        )
        return [_FilePartition(p) for p in files] or [_FilePartition("")]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        if not partition.path:
            return
        payload_type = PACKET_SCHEMA["payload"].dataType
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    pkt = json.loads(line)
                except ValueError:
                    continue  # malformed -> dropped, pipeline continues
                if not isinstance(pkt, dict) or pkt.get("type") is None:
                    continue
                row = []
                for f in PACKET_SCHEMA.fields:
                    v = pkt.get(f.name)
                    if f.name == "payload":
                        if isinstance(v, dict):
                            row.append(
                                tuple(
                                    _coerce(v.get(pf.name), pf.dataType)
                                    for pf in payload_type.fields
                                )
                            )
                        else:
                            row.append(None)
                    else:
                        row.append(_coerce(v, f.dataType))
                yield tuple(row)


class PacketDataSource(DataSource):
    """spark.read.format("meshtastic_packets").load(landing_dir)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return _flat_schema()

    def reader(self, schema: StructType) -> DataSourceReader:
        return PacketDataSourceReader(schema, self.options)


def register(spark) -> None:
    """Register the connector on a session (idempotent)."""
    spark.dataSource.register(PacketDataSource)
