"""Multimodal (binary) column operators (SURVEY.md §2.11 multimodal_columns).

Images/audio/video ride along as opaque ``binary`` columns plus a typed
metadata struct. The Spark-side plumbing — schema, partition-friendly
batch iteration, Arrow-batched UDF signatures — is real and tested; the
actual byte decoding is STUBBED (this container has no image/audio
libraries) behind ``decode_stub``: a deterministic fake that derives
"features" from the bytes, clearly marked, swappable for a PIL/ffmpeg
call in production.

Scale shape: ``mapInPandas`` streams Arrow batches through the Python
worker — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``, not partition size,
which is what keeps 100 MB-per-row media workable on ordinary
executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_histogram", T.ArrayType(T.LongType())),
    ]
)


def to_media_table(df: DataFrame, id_col: str, payload_col: str, modality: str) -> DataFrame:
    """Wrap any source column as the canonical media table: opaque bytes
    + typed metadata (the binaryFile-source shape)."""
    blob = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        blob.alias("content"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(f"application/x-{modality}").alias("mime_type"),
            F.length(blob).cast("long").alias("n_bytes"),
            F.sha2(blob, 256).alias("sha256"),
        ).alias("meta"),
    )


def decode_stub(content: bytes) -> dict:
    """DETERMINISTIC FAKE DECODER — stands in for PIL/librosa/ffmpeg.

    Production swaps this single function for a real decoder; the
    surrounding Spark plumbing (schema, Arrow batching, partitioning)
    is unchanged. Raises on None to exercise the malformed-row path.
    """
    if content is None:
        raise NotImplementedError("no real decoder in this container; content required")
    hist = [0] * 8
    for byte in content[:4096]:  # bounded work per record, like a thumbnail decode
        hist[byte >> 5] += 1
    mean = (sum(content[:4096]) / min(len(content), 4096)) if content else 0.0
    return {"feat_mean": mean, "feat_histogram": hist}


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    ``mapInPandas`` (not a scalar UDF) so one Python call handles a
    whole Arrow batch and malformed records can be dropped (the
    reference's drop-and-continue contract, AIRWISEv0.py:155-157).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    feats = decode_stub(bytes(content) if content is not None else None)
                except NotImplementedError:
                    continue  # malformed_row_skip semantics
                rows.append(
                    {
                        "media_id": media_id,
                        "n_bytes": len(content),
                        "feat_mean": feats["feat_mean"],
                        "feat_histogram": feats["feat_histogram"],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.select("media_id", "content").mapInPandas(op, FEATURE_SCHEMA)
