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
    from baseline_magician_spark.operators.multimodal import real_decoder

    with pytest.raises(NotImplementedError):
        real_decoder(b"\x00\x01", {"media_type": "image"})


def test_decode_media_default_synthetic(media):
    from baseline_magician_spark.operators.multimodal import decode_media

    out = decode_media(media)
    assert out.columns == [
        "doc_id", "media_type", "width", "height", "n_frames", "pixels",
    ]
    row = out.where("doc_id = 7").first()
    src = media.where("doc_id = 7").first()
    assert bytes(row.pixels) == bytes(src.payload)
    assert (row.width, row.height) == (src.meta.width, src.meta.height)
    assert out.count() == media.count()


def test_decode_media_custom_decoder_plugs_in(media):
    """The extension seam: a user callable replaces the codec and its
    partial dict overlays the metadata defaults."""
    from baseline_magician_spark.operators.multimodal import decode_media

    def halve(payload: bytes, meta: dict) -> dict:
        return {"pixels": payload[: len(payload) // 2], "width": 2}

    out = decode_media(media, decoder=halve).where("doc_id = 7").first()
    src = media.where("doc_id = 7").first()
    assert len(out.pixels) == len(src.payload) // 2
    assert out.width == 2
    assert out.height == src.meta.height  # metadata fallback


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
