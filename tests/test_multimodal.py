"""Multimodal plumbing tests not covered by the oracle gate:
attach/resize schema + payload slicing, the real-decode stub seam,
and frame fan-out shape."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    from baseline_magician_spark.catalog import load_table
    from baseline_magician_spark.operators.multimodal import attach_media

    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    return attach_media(docs).cache()


def test_attach_schema_and_payload(media):
    from baseline_magician_spark.operators.multimodal import (
        LEN_BASE,
        LEN_MOD,
        _payload_bytes,
    )

    row = media.where("doc_id = 7").first()
    assert row.meta.byte_len == LEN_BASE + 7 % LEN_MOD
    assert isinstance(row.payload, bytearray | bytes)
    assert bytes(row.payload) == _payload_bytes(7)
    assert row.meta.media_type == "audio"  # 7 % 3 == 1


def test_resize_truncates_payload(media):
    from baseline_magician_spark.operators.multimodal import resize_stub

    out = resize_stub(media, new_width=4, new_height=8).where("doc_id = 7").first()
    assert out.meta.width == 4 and out.meta.height == 8
    assert len(out.payload) == 32
    assert out.meta.n_frames == 2  # 32 // FRAME_BYTES


def test_decode_real_is_stubbed(media):
    from baseline_magician_spark.operators.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(media)


def test_frame_fanout_only_videos(media):
    from baseline_magician_spark.operators.multimodal import sample_frames

    frames = sample_frames(media, every=4)
    rows = frames.collect()
    assert rows, "expected at least one sampled frame"
    video_ids = {
        r.doc_id for r in media.where("meta.media_type = 'video'").collect()
    }
    assert {r.doc_id for r in rows} <= video_ids
    assert all(r.frame_idx % 4 == 0 for r in rows)
