"""Multimodal plumbing (SURVEY §2.11): binary metadata, stubbed feature
extraction via mapInPandas, frame-sampling plan."""

from __future__ import annotations

import pytest

from ago_sisdb_spark.sources.multimodal import (
    MEDIA_SCHEMA,
    attach_binary_meta,
    extract_features,
    frame_sample_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "image/jpeg", b"\xff\xd8\xff\xe0" + bytes(range(64)), None, {}),
        (2, "image", "image/png", b"\x89PNG\r\n\x1a\n" + bytes(64), None, {}),
        (3, "video", "video/mp4", b"\x00\x00\x00\x18ftyp" + bytes(32), None,
         {"duration_s": "12"}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_attach_binary_meta(media):
    got = {r.media_id: (r.n_bytes, r.magic) for r in attach_binary_meta(media).collect()}
    assert got[1] == (68, "jpeg")
    assert got[2] == (72, "png")
    assert got[3][1] == "mp4"


def test_extract_features_shape(media):
    out = extract_features(media).collect()
    assert len(out) == 3
    for r in out:
        assert len(r.feature) == 8
        assert all(0.0 <= x <= 1.0 for x in r.feature)
    # deterministic stub: same row twice → same feature
    again = extract_features(media).collect()
    assert {r.media_id: r.feature for r in out} == {
        r.media_id: r.feature for r in again
    }


def test_poisoned_blobs_yield_null_rows(spark):
    """One bad blob must not fail the job (100 TB rule): null/empty content
    → null feature + error column, good rows unaffected."""
    rows = [
        (1, "image", "image/jpeg", b"\xff\xd8\xff\xe0" + bytes(range(64)), None, {}),
        (2, "image", None, None, None, {}),  # null content
        (3, "image", None, b"", None, {}),  # empty content
    ]
    out = {r.media_id: r for r in extract_features(
        spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()}
    assert len(out) == 3
    assert out[1].feature is not None and out[1].error is None
    assert out[2].feature is None and out[2].error == "null-content"
    assert out[3].feature is None and out[3].error == "empty-content"

    from ago_sisdb_spark.sources.multimodal import resize_media

    rout = {r.media_id: r for r in resize_media(
        spark.createDataFrame(rows, MEDIA_SCHEMA), 32, 32).collect()}
    assert rout[1].content is not None
    assert rout[2].content is None and rout[2].n_bytes_out == 0
    assert rout[3].content is None and rout[3].n_bytes_out == 0


def test_frame_sample_plan(media):
    out = frame_sample_plan(media, every_n_seconds=5).collect()
    # video duration 12s, frames at 0,5,10
    assert [(r.media_id, r.frame_ts) for r in out] == [(3, 0), (3, 5), (3, 10)]


def test_resize_media_shrinks_bytes(media):
    from ago_sisdb_spark.sources.multimodal import resize_media

    out = {r.media_id: r for r in resize_media(media, 32, 32).collect()}
    assert len(out) == 3
    for mid, r in out.items():
        assert r.width == 32 and r.height == 32
        assert r.n_bytes_out == len(r.content)
    # 32x32 vs nominal 64x64 → quarter of the bytes
    src = {r.media_id: len(r.content) for r in media.collect()}
    for mid, r in out.items():
        assert r.n_bytes_out == max(1, src[mid] // 4)
    # deterministic
    again = {r.media_id: bytes(r.content) for r in resize_media(media, 32, 32).collect()}
    assert {m: bytes(r.content) for m, r in out.items()} == again


def test_extract_features_batch_limit_slices(spark):
    """r8: batch_limit actually bounds per-yield size (it was a dead
    parameter).  A tiny limit must still produce every row exactly once."""
    from ago_sisdb_spark.sources import multimodal as mm

    rows = [(i, "image", bytes([i % 251]) * (8 + i)) for i in range(37)]
    df = spark.createDataFrame(rows, "media_id long, modality string, content binary")
    out = mm.extract_features(df, batch_limit=5).collect()
    assert sorted(r.media_id for r in out) == list(range(37))
    assert all(r.n_bytes == 8 + r.media_id for r in out)
