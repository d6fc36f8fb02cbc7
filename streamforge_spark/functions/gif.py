"""Real animated-GIF (GIF89a) video codec — pure stdlib, no third-party
media library required.

The video analog of :mod:`streamforge_spark.functions.png` (image) and
:mod:`streamforge_spark.functions.wav` (audio): a genuine container +
compression codec so the multimodal pipeline's VIDEO path exercises a
real decode end-to-end — block-structured container parsing, Graphic
Control Extensions, and a full variable-code-width LZW decompressor —
while remaining runnable in a hermetic environment. Animated GIF is the
one real multi-frame video format expressible in pure stdlib.

Encoder: the classic "uncompressed GIF" technique — every pixel is
emitted as its own literal LZW code at the initial 9-bit width, with a
CLEAR code interleaved before the code table would force a width
change. Decoders must (and ours does) handle arbitrary conforming
streams: the decoder below implements the full LZW algorithm (growing
code widths, the KwKwK case, CLEAR/EOI handling), not just the subset
the encoder emits.

Reference parity: the reference treats media payloads as opaque bytes +
typed metadata (SURVEY §2 multimodal rows); here the payload is a real
multi-frame GIF and frame sampling operates on true decoded frames.
"""

from __future__ import annotations

import struct

_CLEAR = 256
_EOI = 257
_MIN_CODE_SIZE = 8       # 256-entry color table -> 8-bit literals


def _grayscale_palette() -> bytes:
    return bytes(v for i in range(256) for v in (i, i, i))


class _BitWriter:
    """LSB-first bit packer (GIF LZW bit order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


def _lzw_encode_uncompressed(pixels: bytes) -> bytes:
    """Literal-only LZW stream: CLEAR, pixels as 9-bit codes (CLEAR
    re-issued before the decoder's table would outgrow 9 bits), EOI."""
    bw = _BitWriter()
    width = _MIN_CODE_SIZE + 1
    bw.write(_CLEAR, width)
    next_code = _EOI + 1
    for p in pixels:
        bw.write(p, width)
        # the decoder adds one table entry per code after the first
        # following a CLEAR; reset before entries would need 10 bits
        next_code += 1
        if next_code >= (1 << width) - 1:
            bw.write(_CLEAR, width)
            next_code = _EOI + 1
    bw.write(_EOI, width)
    return bw.flush()


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def encode_gif(width: int, height: int, frames: list[bytes],
               delay_cs: int = 10) -> bytes:
    """Encode frames (each ``width*height`` palette-index bytes, 256-
    entry grayscale palette) into a complete animated GIF89a file."""
    if not frames:
        raise ValueError("encode_gif: at least one frame required")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out.append(0xF7)          # global color table, 256 entries
    out += b"\x00\x00"        # bg color index, aspect
    out += _grayscale_palette()
    for fr in frames:
        if len(fr) != width * height:
            raise ValueError("encode_gif: frame size mismatch")
        # Graphic Control Extension (frame delay)
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        # Image descriptor: full-frame, no local color table
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        out.append(_MIN_CODE_SIZE)
        out += _sub_blocks(_lzw_encode_uncompressed(fr))
    out.append(0x3B)          # trailer
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """Full GIF LZW decompressor: variable code widths, table growth,
    the KwKwK special case, CLEAR resets, EOI termination."""
    br = _BitReader(data)
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1

    def reset():
        return ({i: bytes([i]) for i in range(clear)},
                clear + 2, min_code_size + 1)

    table, next_code, width = reset()
    out = bytearray()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = br.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]          # KwKwK
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Decode a GIF file -> (width, height, frames as palette-index
    bytes). Handles GIF87a/89a, extensions, and per-frame LZW streams;
    interlacing and local color tables raise (encode_gif never emits
    them) rather than returning junk."""
    if payload[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF file")
    width, height = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    if packed & 0x80:                         # global color table
        pos += 3 * (2 << (packed & 0x07))
    frames: list[bytes] = []
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:                         # trailer
            break
        if b == 0x21:                         # extension: skip blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:                       # image descriptor
            left, top, fw, fh = struct.unpack_from("<HHHH", payload, pos + 1)
            fpacked = payload[pos + 9]
            pos += 10
            if fpacked & 0x80:
                raise ValueError("local color tables unsupported")
            if fpacked & 0x40:
                raise ValueError("interlaced frames unsupported")
            if (left, top, fw, fh) != (0, 0, width, height):
                raise ValueError("partial frames unsupported")
            min_code_size = payload[pos]
            pos += 1
            stream = bytearray()
            while payload[pos]:
                n = payload[pos]
                stream += payload[pos + 1:pos + 1 + n]
                pos += 1 + n
            pos += 1
            frames.append(_lzw_decode(bytes(stream), min_code_size,
                                      width * height))
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    return width, height, frames
