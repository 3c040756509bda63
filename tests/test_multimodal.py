"""Multimodal binary-column plumbing tests (decode stubbed)."""

from __future__ import annotations

from meshtastic_airsensor_database_spark.operators.multimodal import (
    extract_features,
    to_media_table,
)


def _media(spark):
    df = spark.createDataFrame(
        [(1, "some image bytes"), (2, "other payload"), (3, None)],
        ["doc_id", "payload"],
    )
    return to_media_table(df, "doc_id", "payload", "image")


def test_media_table_schema(spark):
    media = _media(spark)
    assert [f.name for f in media.schema.fields] == ["media_id", "content", "meta"]
    row = {r.media_id: r for r in media.collect()}
    assert row[1].meta.modality == "image"
    assert row[1].meta.n_bytes == len(b"some image bytes")
    assert len(row[1].meta.sha256) == 64
    assert row[3].content is None and row[3].meta.n_bytes is None


def test_feature_extraction_drops_malformed(spark):
    """Null content exercises the decode-failure drop path
    (malformed_row_skip semantics, AIRWISEv0.py:155-157)."""
    feats = {r.media_id: r for r in extract_features(_media(spark)).collect()}
    assert set(feats) == {1, 2}  # null-content row dropped, not crashed
    assert feats[1].n_bytes == len(b"some image bytes")
    assert len(feats[1].feat_histogram) == 8
    assert sum(feats[1].feat_histogram) == feats[1].n_bytes
