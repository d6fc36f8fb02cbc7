"""Pure-stdlib PNG codec tests: exact pixel roundtrips, every scanline
filter type, the nearest-neighbor resize kernel, and the multimodal
stages' real-codec paths (no Spark needed except the stage tests)."""

from __future__ import annotations

import struct
import zlib

import pytest

from streamforge_spark.functions.png import (
    _chunk, _SIG, decode_png, encode_png, is_png, resize_nearest)


def _pattern(w, h, ch, seed=0):
    return bytes((seed + i * 31) % 256 for i in range(w * h * ch))


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_roundtrip_exact(ch):
    w, h = 13, 7
    px = _pattern(w, h, ch, seed=5)
    data = encode_png(w, h, px, channels=ch)
    assert is_png(data)
    gw, gh, gch, gpx = decode_png(data)
    assert (gw, gh, gch) == (w, h, ch)
    assert gpx == px


def _encode_with_filters(w, h, px, filters):
    """Hand-build a PNG applying the given per-row filter types —
    exercises decode paths our encoder (filter 0 only) never emits."""
    stride = w * 3
    rows = [bytearray(px[y * stride:(y + 1) * stride]) for y in range(h)]
    raw = bytearray()
    prev = bytearray(stride)
    for y, f in enumerate(filters):
        line = bytearray(rows[y])
        enc = bytearray(line)
        if f == 1:
            for i in range(stride - 1, 2, -1):
                enc[i] = (line[i] - line[i - 3]) & 0xFF
        elif f == 2:
            for i in range(stride):
                enc[i] = (line[i] - prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                enc[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            from streamforge_spark.functions.png import _paeth
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                c = prev[i - 3] if i >= 3 else 0
                enc[i] = (line[i] - _paeth(a, prev[i], c)) & 0xFF
        raw.append(f)
        raw.extend(enc)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def test_all_filter_types_decode():
    w, h = 9, 5
    px = _pattern(w, h, 3, seed=42)
    data = _encode_with_filters(w, h, px, [0, 1, 2, 3, 4])
    gw, gh, gch, gpx = decode_png(data)
    assert (gw, gh, gch) == (w, h, 3)
    assert gpx == px


def test_resize_nearest_known_case():
    # 2x2 RGB quadrants -> 4x4: each quadrant replicated
    px = bytes([255, 0, 0,  0, 255, 0,
                0, 0, 255,  9, 9, 9])
    out = resize_nearest(2, 2, 3, px, 4, 4)
    assert out[0:3] == bytes([255, 0, 0])        # top-left stays red
    assert out[9:12] == bytes([0, 255, 0])       # top-right green
    assert out[-3:] == bytes([9, 9, 9])          # bottom-right gray
    assert len(out) == 4 * 4 * 3


def test_decode_rejects_garbage_and_bad_crc():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    good = encode_png(4, 4, _pattern(4, 4, 3))
    corrupted = bytearray(good)
    corrupted[40] ^= 0xFF                        # flip a byte inside a chunk
    with pytest.raises(ValueError):
        decode_png(bytes(corrupted))


def test_decode_media_real_png_stage(spark):
    from streamforge_spark.multimodal import decode_media, media_png_from_documents
    from streamforge_spark.io import load
    docs = load(spark, "/root/testdata/sf0.001", "documents").limit(20)
    decoded = decode_media(media_png_from_documents(docs))
    rows = {r.media_id: r for r in decoded.collect()}
    assert len(rows) == 20
    for mid, r in rows.items():
        assert r.width == 4 + mid % 13
        assert r.height == 3 + mid % 7


def test_resize_media_real_png_stage(spark):
    from streamforge_spark.multimodal import media_png_from_documents, resize_media
    from streamforge_spark.functions.png import decode_png, resize_nearest
    from streamforge_spark.io import load
    docs = load(spark, "/root/testdata/sf0.001", "documents").limit(5)
    media = media_png_from_documents(docs)
    resized = {r.media_id: bytes(r.payload)
               for r in resize_media(media, 6, 4).collect()}
    originals = {r.media_id: bytes(r.payload) for r in media.collect()}
    for mid, out_png in resized.items():
        w0, h0, ch, px0 = decode_png(originals[mid])
        gw, gh, gch, gpx = decode_png(out_png)
        assert (gw, gh, gch) == (6, 4, ch)
        assert gpx == resize_nearest(w0, h0, ch, px0, 6, 4)


def test_roundtrip_property_sweep():
    # derandomized sweep over sizes x channels x seeds: encode->decode
    # must be pixel-exact everywhere (the hypothesis-style property,
    # with a fixed grid for reproducibility)
    for ch in (1, 3, 4):
        for w, h in ((1, 1), (1, 17), (16, 2), (31, 3), (64, 64)):
            for seed in (0, 7, 123):
                px = _pattern(w, h, ch, seed)
                gw, gh, gch, gpx = decode_png(encode_png(w, h, px, channels=ch))
                assert (gw, gh, gch, gpx) == (w, h, ch, px)
