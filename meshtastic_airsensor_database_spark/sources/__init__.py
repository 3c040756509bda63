"""Sources and sinks (SURVEY.md §2.1).

Every scan/ingest/egress boundary the reference touches, re-expressed as
Spark readers/writers:

- batch:   CSV / text-line / parquet / binary-file readers (`batch.py`)
- stream:  JSON-lines landing-directory packet source (`landing.py`) —
           the ingest boundary that replaces the MQTT callback loop
- bridge:  out-of-process MQTT -> landing-dir bridge (`mqtt_bridge.py`)
- sinks:   partitioned parquet, CSV, JDBC, document/JSON, HTTP alert,
           console (`sinks.py`)
- ddl:     idempotent catalog bootstrap (`ddl.py`)
"""

from .batch import binary_file_source, csv_batch_source, text_line_source
from .landing import packet_batch_source, packet_stream_source, write_packet_fixture
from .sinks import (
    csv_sink,
    document_sink,
    jdbc_healthcheck,
    jdbc_idempotent_table_sink,
    jdbc_table_sink,
    parquet_table_sink,
)

__all__ = [
    "binary_file_source",
    "csv_batch_source",
    "csv_sink",
    "document_sink",
    "jdbc_healthcheck",
    "jdbc_idempotent_table_sink",
    "jdbc_table_sink",
    "packet_batch_source",
    "packet_stream_source",
    "parquet_table_sink",
    "text_line_source",
    "write_packet_fixture",
]
