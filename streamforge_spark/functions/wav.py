"""Real WAV (RIFF/PCM) audio codec — pure stdlib (``wave`` + ``struct``),
no third-party audio library required.

This is the audio analog of :mod:`streamforge_spark.functions.png`:
the container/codec work is genuine (RIFF chunk framing, PCM 16-bit
little-endian sample packing, via the stdlib ``wave`` module), so the
multimodal pipeline exercises a real decode path end-to-end while
staying runnable in a hermetic environment. Reference parity target:
the reference treats media payloads as opaque bytes + typed metadata
(SURVEY §2 multimodal rows); here the payload is a real WAV file.
"""

from __future__ import annotations

import io
import struct
import wave


def encode_wav(samples: list[int], framerate: int = 8000) -> bytes:
    """Encode mono 16-bit PCM samples into a complete WAV file."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a WAV file -> (n_channels, framerate, n_frames, samples).

    Only mono 16-bit PCM is supported (what encode_wav emits); anything
    else raises rather than returning junk.
    """
    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, width, rate, nframes = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(),
            w.getnframes())
        if nch != 1 or width != 2:
            raise NotImplementedError(
                f"only mono 16-bit PCM supported, got {nch}ch {8 * width}-bit")
        raw = w.readframes(nframes)
    samples = list(struct.unpack(f"<{nframes}h", raw))
    return nch, rate, nframes, samples
