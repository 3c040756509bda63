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


def test_resize_media_size_contract_and_composability(spark):
    import hashlib

    from meshtastic_airsensor_database_spark.operators.multimodal import resize_media

    resized = {r.media_id: r for r in resize_media(_media(spark), 8, 4).collect()}
    assert set(resized) == {1, 2}  # null-content row dropped
    for r in resized.values():
        assert len(r.content) == 32  # exact width*height byte contract
        assert r.meta.n_bytes == 32
        assert r.meta.sha256 == hashlib.sha256(bytes(r.content)).hexdigest()
        assert r.meta.modality == "image"
    # schema identical to input media table -> composes with extract_features
    assert [f.name for f in resize_media(_media(spark), 8, 4).schema.fields] == [
        "media_id", "content", "meta",
    ]


def test_frame_sample_is_one_to_many_and_capped(spark):
    from meshtastic_airsensor_database_spark.operators.multimodal import (
        FRAME_BYTES,
        frame_sample,
    )

    df = spark.createDataFrame(
        [(1, bytes(range(256)) * 10), (2, b"x" * FRAME_BYTES), (3, None)],
        ["doc_id", "payload"],
    )
    media = df.selectExpr("doc_id as media_id", "payload as content")
    frames = frame_sample(media, every_n=2, max_frames=3).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    assert 3 not in by_id  # malformed dropped
    assert [f.frame_idx for f in sorted(by_id[1], key=lambda f: f.frame_idx)] == [0, 2, 4]
    assert all(len(f.frame) == FRAME_BYTES for f in by_id[1])
    assert [f.frame_idx for f in by_id[2]] == [0]  # single short frame


def test_resize_media_skips_null_meta_rows(spark):
    from meshtastic_airsensor_database_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_media,
    )

    rows = [
        (1, b"payload", {"modality": "image", "mime_type": "x", "n_bytes": 7, "sha256": "s"}),
        (2, b"payload", None),  # content present, metadata missing -> skipped
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id for r in resize_media(media, 4, 4).collect()}
    assert out == {1}
