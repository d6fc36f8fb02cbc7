"""GIF codec tests: exact roundtrips through the shipped encoder, plus
decoding a stream from an independent COMPRESSING LZW encoder (written
here) — proving the decoder implements real GIF LZW (growing code
widths, KwKwK, CLEAR resets), not just the literal-only subset the
shipped encoder emits."""

from __future__ import annotations

import random
import struct

from streamforge_spark.functions.gif import (
    _MIN_CODE_SIZE, _BitWriter, _sub_blocks, decode_gif, encode_gif,
)


def test_roundtrip_random_frames():
    rng = random.Random(11)
    for (w, h, nf) in [(3, 2, 1), (16, 16, 3), (40, 30, 4), (1, 1, 2)]:
        frames = [bytes(rng.randrange(256) for _ in range(w * h))
                  for _ in range(nf)]
        w2, h2, out = decode_gif(encode_gif(w, h, frames))
        assert (w2, h2, out) == (w, h, frames)


def _lzw_compress_real(pixels: bytes) -> bytes:
    """Independent, genuinely compressing GIF LZW encoder (dictionary
    building + growing code widths), used only to test the decoder."""
    clear, eoi = 256, 257
    bw = _BitWriter()
    table = {bytes([i]): i for i in range(256)}
    next_code, width = eoi + 1, _MIN_CODE_SIZE + 1
    bw.write(clear, width)
    cur = b""
    for p in pixels:
        nxt = cur + bytes([p])
        if nxt in table:
            cur = nxt
            continue
        bw.write(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4095:
            bw.write(clear, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = eoi + 1, _MIN_CODE_SIZE + 1
        cur = bytes([p])
    if cur:
        bw.write(table[cur], width)
    bw.write(eoi, width)
    return bw.flush()


def _gif_with_stream(w: int, h: int, stream: bytes) -> bytes:
    out = bytearray(b"GIF89a") + struct.pack("<HH", w, h)
    out += b"\xf7\x00\x00" + bytes(v for i in range(256) for v in (i, i, i))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(_MIN_CODE_SIZE)
    out += _sub_blocks(stream)
    out.append(0x3B)
    return bytes(out)


def test_decoder_handles_compressed_streams():
    # repetitive pixels force dictionary hits, table growth past 512
    # entries (10-bit codes), and the KwKwK corner (run of same symbol)
    w, h = 64, 40
    pixels = bytes((i // 7) % 256 for i in range(w * h))     # long runs
    gif = _gif_with_stream(w, h, _lzw_compress_real(pixels))
    w2, h2, frames = decode_gif(gif)
    assert (w2, h2) == (w, h)
    assert frames == [pixels]
    # and the compressed form is genuinely smaller than literal coding
    assert len(_lzw_compress_real(pixels)) < len(pixels)


def test_decoder_kwkwk_case():
    # aaaa... from a cold dictionary hits code==next_code immediately
    pixels = bytes([5]) * 100
    gif = _gif_with_stream(10, 10, _lzw_compress_real(pixels))
    assert decode_gif(gif)[2] == [pixels]
