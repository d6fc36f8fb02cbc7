"""WAV codec (functions/wav.py) — exact roundtrips, format strictness."""

from __future__ import annotations

import pytest

from streamforge_spark.functions.wav import decode_wav, encode_wav


def test_wav_roundtrip_exact():
    samples = [0, 1, -1, 32767, -32768, 1234, -4321] * 37
    payload = encode_wav(samples, framerate=16000)
    nch, rate, n, out = decode_wav(payload)
    assert (nch, rate, n) == (1, 16000, len(samples))
    assert out == samples


def test_wav_riff_header_and_empty():
    payload = encode_wav([], framerate=8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert decode_wav(payload)[2:] == (0, [])


def test_wav_rejects_unsupported_width():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)          # stereo — not supported
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00\x00\x00")
    with pytest.raises(NotImplementedError):
        decode_wav(buf.getvalue())
