"""PNG codec: round-trip over every filter type, spec-compliance of
the emitted container, and codec-grade error behavior."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from baseline_magician_spark.operators.multimodal import (
    PNG_MAGIC,
    _paeth,
    png_decoder,
    png_encode,
)


def _plane(w: int, h: int, seed: int = 7) -> bytes:
    i = np.arange(w * h, dtype=np.int64)
    return ((seed * 131 + i * 197 + 23) % 256).astype(np.uint8).tobytes()


@pytest.mark.parametrize("w,h", [(8, 8), (31, 8), (1, 5), (13, 11), (40, 3)])
def test_roundtrip(w, h):
    plane = _plane(w, h)
    dec = png_decoder(png_encode(plane, w, h), {})
    assert (dec["width"], dec["height"]) == (w, h)
    assert dec["pixels"] == plane


def test_roundtrip_exercises_all_filters():
    # height 12 -> rows use filters 0,1,2,3,4,0,1,2,3,4,0,1
    plane = _plane(16, 12, seed=3)
    assert png_decoder(png_encode(plane, 16, 12), {})["pixels"] == plane


def test_container_is_spec_compliant():
    p = png_encode(_plane(8, 8), 8, 8)
    assert p[:8] == PNG_MAGIC
    # IHDR: 8-bit grayscale, non-interlaced
    (clen,) = struct.unpack(">I", p[8:12])
    assert p[12:16] == b"IHDR" and clen == 13
    w, h, depth, ctype, comp, filt, inter = struct.unpack(
        ">IIBBBBB", p[16:29]
    )
    assert (w, h, depth, ctype, comp, filt, inter) == (8, 8, 8, 0, 0, 0, 0)
    # stdlib-independent viewers: verify via zlib that IDAT inflates
    # to exactly (w+1)*h filtered bytes
    pos = 8
    idat = b""
    while pos + 8 <= len(p):
        (n,) = struct.unpack(">I", p[pos : pos + 4])
        t = p[pos + 4 : pos + 8]
        if t == b"IDAT":
            idat += p[pos + 8 : pos + 8 + n]
        pos += 12 + n
    assert len(zlib.decompress(idat)) == (8 + 1) * 8


def test_crc_mismatch_raises():
    p = bytearray(png_encode(_plane(8, 8), 8, 8))
    p[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        png_decoder(bytes(p), {})
    p2 = bytearray(png_encode(_plane(8, 8), 8, 8))
    p2[40] ^= 0x01  # corrupt an IDAT byte -> its CRC mismatches
    with pytest.raises(ValueError, match="CRC"):
        png_decoder(bytes(p2), {})


def test_bad_signature_and_truncation_raise():
    with pytest.raises(ValueError, match="signature"):
        png_decoder(b"NOTAPNG!" + b"\x00" * 32, {})
    p = png_encode(_plane(8, 8), 8, 8)
    with pytest.raises(ValueError):
        png_decoder(p[: len(p) // 2], {})


def test_paeth_predictor_spec_cases():
    # ties break left > up > upleft per the spec
    assert _paeth(1, 1, 1) == 1
    assert _paeth(10, 20, 15) == 15  # p=15: pa=5, pb=5, pc=0 -> upleft
    assert _paeth(0, 20, 10) == 10  # p=10: pa=10, pb=10, pc=0 -> upleft
    assert _paeth(5, 9, 2) == 9  # p=12: pa=7, pb=3, pc=10 -> up
    assert _paeth(7, 7, 3) == 7  # pa == pb == 4 < pc -> left bias
    assert _paeth(6, 10, 12) == 6  # p=4: pa=2, pb=6, pc=8 -> left


def test_pillow_cross_check_if_available():
    """If PIL exists in the environment, it must agree with our
    decoder byte-for-byte (skip silently where it is not baked in)."""
    try:
        import io

        import PIL.Image
    except ImportError:
        pytest.skip("PIL not installed in this container")
    plane = _plane(24, 10, seed=11)
    p = png_encode(plane, 24, 10)
    img = PIL.Image.open(io.BytesIO(p))
    assert img.tobytes() == plane
