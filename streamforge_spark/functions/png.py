"""Pure-stdlib PNG codec (zlib + struct — no PIL/ffmpeg in this
environment, and installing packages is off-limits).

Supports the subset a data pipeline actually meets in practice-shaped
fixtures: 8-bit depth, color types 0 (gray), 2 (RGB) and 6 (RGBA),
non-interlaced, with ALL five scanline filters on decode (encoders in
the wild emit Sub/Up/Average/Paeth; ours emits None). This upgrades
the multimodal decode stage from a deterministic stand-in to a REAL
image decode for PNG payloads — the mapInPandas plumbing is unchanged,
only the codec slot is filled (SURVEY 'multimodal' row; the stub
remains the fallback for other formats).

Used per Arrow batch inside mapInPandas workers: tiny fixture images
decode in microseconds; the code is deliberately dependency-free so it
ships with the engine.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}   # gray, RGB, RGBA
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(width: int, height: int, pixels: bytes,
               channels: int = 3) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``channels`` per pixel) as a
    valid PNG (filter None per scanline, one IDAT)."""
    if channels not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    ihdr = struct.pack(">IIBBBBB", width, height, 8,
                       _COLOR_TYPE[channels], 0, 0, 0)
    stride = width * channels
    raw = b"".join(b"\x00" + pixels[y * stride:(y + 1) * stride]
                   for y in range(height))
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == _SIG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG -> (width, height, channels, raw pixel bytes).

    Handles filters 0-4; rejects interlacing, palettes, and non-8-bit
    depths with ValueError (honest partial coverage, not silent junk).
    """
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos, width = 8, None
    height = channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), tag = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])[0]
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("decompressed size mismatch")
    out = bytearray(height * stride)
    prev = bytearray(stride)
    bpp = channels
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if f == 1:      # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:    # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:    # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:    # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown filter {f}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def resize_nearest(width: int, height: int, channels: int, pixels: bytes,
                   new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resample of raw pixels (the deterministic
    resize kernel — no float interpolation, so results are exact and
    engine-independent)."""
    src = memoryview(pixels)
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = y * height // new_h
        row = sy * width * channels
        orow = y * new_w * channels
        for x in range(new_w):
            sx = x * width // new_w
            s = row + sx * channels
            o = orow + x * channels
            out[o:o + channels] = src[s:s + channels]
    return bytes(out)
