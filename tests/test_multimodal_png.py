"""The REAL image decode path: grayscale-8 PNG via stdlib zlib.

x05g's oracle hash-verifies the raster algebra; these tests pin what SQL
cannot reach — the unfilter math for ALL five PNG filter types (verified
against a reference forward-filter), CRC verification, and the genuine
decode-failure modes (bad signature, truncated chunks, corrupt CRC,
unsupported color class) that the stubbed video path cannot exercise.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from presto_weather_spark.operators.multimodal import (
    PNG_WIDTH,
    _png_chunk,
    decode_png,
    encode_png,
)


def test_png_roundtrip_pixels_and_dims():
    text = "the quick brown fox jumps over the lazy dog" * 3
    payload = encode_png(text)
    w, h, px = decode_png(payload)
    raw = text.encode("utf-8")
    assert w == PNG_WIDTH
    assert h == (len(raw) + PNG_WIDTH - 1) // PNG_WIDTH
    assert px[: len(raw)] == raw
    assert all(b == 0 for b in px[len(raw):])  # zero-padded tail


def test_png_empty_and_none_text():
    for t in ("", None):
        w, h, px = decode_png(encode_png(t))
        assert (w, h) == (PNG_WIDTH, 1)
        assert px == b"\x00" * PNG_WIDTH


def _forward_filter(pixels: bytes, w: int, h: int, ftype: int) -> bytes:
    """Reference forward filter (PNG spec 9.2, bpp=1) — the encoder side
    of what decode_png must invert."""
    out = bytearray()
    prev = bytearray(w)
    for r in range(h):
        row = bytearray(pixels[r * w : (r + 1) * w])
        filt = bytearray(w)
        for x in range(w):
            left = row[x - 1] if x else 0
            up = prev[x]
            ul = prev[x - 1] if x else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:  # paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            filt[x] = (row[x] - pred) & 0xFF
        out += bytes([ftype]) + filt
        prev = row
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_unfilter_inverts_every_filter_type(ftype):
    w, h = 8, 4
    pixels = bytes((13 * i * i + 7 * i + 3) % 256 for i in range(w * h))
    scan = _forward_filter(pixels, w, h, ftype)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scan))
        + _png_chunk(b"IEND", b"")
    )
    got_w, got_h, got = decode_png(payload)
    assert (got_w, got_h) == (w, h)
    assert got == pixels


def test_png_decode_failure_modes():
    good = encode_png("hello failure modes")
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"NOTAPNG" + good[7:])
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:-6])  # IEND chopped mid-chunk
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # flip a byte inside IDAT -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))
    with pytest.raises(ValueError, match="missing IDAT"):
        decode_png(
            good[:8]
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 1, 8, 0, 0, 0, 0))
            + _png_chunk(b"IEND", b"")
        )


def test_png_unsupported_classes_raise_not_implemented():
    # RGB color type
    ihdr_rgb = struct.pack(">IIBBBBB", 4, 1, 8, 2, 0, 0, 0)
    with pytest.raises(NotImplementedError, match="grayscale-8"):
        decode_png(
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr_rgb)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 13))
            + _png_chunk(b"IEND", b"")
        )
    # Adam7 interlace
    ihdr_i = struct.pack(">IIBBBBB", 4, 1, 8, 0, 0, 0, 1)
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_png(
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr_i)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 5))
            + _png_chunk(b"IEND", b"")
        )


def test_png_unknown_filter_type_raises():
    w, h = 4, 1
    scan = b"\x07" + b"\x01\x02\x03\x04"  # filter type 7 is out of spec
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scan))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="filter type"):
        decode_png(payload)
