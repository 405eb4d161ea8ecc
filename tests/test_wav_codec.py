"""Property tests for the stdlib WAV/RIFF codec
(e2e_data_pipeline_spark/operators/wav_codec.py).

The encoder is the stdlib ``wave`` writer; the decoder is an
independent hand-rolled RIFF chunk walker — so round-trip equality is
evidence the parser is spec-correct, not a tautology.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from e2e_data_pipeline_spark.operators.wav_codec import (
    WavFormatError,
    decode_wav_pcm16,
    encode_wav_pcm16,
)


@settings(max_examples=50, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=400
    ),
    rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
)
def test_roundtrip_identity(samples, rate):
    got_rate, got = decode_wav_pcm16(encode_wav_pcm16(samples, rate))
    assert got_rate == rate
    assert got == samples


def test_decoder_skips_metadata_chunks():
    """Real-world WAVs carry LIST/INFO chunks; the walker must skip
    them (with RIFF word alignment for odd sizes) and still find
    fmt/data."""
    samples = [0, 100, -100, 32767, -32768]
    wav = bytearray(encode_wav_pcm16(samples, 16000))
    # splice an odd-sized LIST chunk between fmt and data
    insert_at = 12 + 8 + 16  # after fmt chunk
    meta = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
    wav[insert_at:insert_at] = meta
    # fix the RIFF size field
    struct.pack_into("<I", wav, 4, len(wav) - 8)
    rate, got = decode_wav_pcm16(bytes(wav))
    assert rate == 16000
    assert got == samples


@pytest.mark.parametrize(
    "mutate, err",
    [
        (lambda b: b[:10], "not a RIFF"),
        (lambda b: b"JUNK" + b[4:], "not a RIFF"),
        (lambda b: b[: len(b) - 7], "truncated|exceeds|missing|odd"),
        (
            lambda b: b.replace(b"fmt ", b"fmX ", 1),
            "missing fmt",
        ),
    ],
)
def test_corruption_raises(mutate, err):
    import re

    wav = encode_wav_pcm16([1, 2, 3, 4], 8000)
    with pytest.raises(WavFormatError) as ei:
        decode_wav_pcm16(mutate(wav))
    assert re.search(err, str(ei.value))


def test_unsupported_format_rejected():
    """Stereo / non-PCM payloads are refused, not silently misread."""
    wav = bytearray(encode_wav_pcm16([1, 2, 3, 4], 8000))
    # channels field lives at fmt body offset +2 (LE u16)
    struct.pack_into("<H", wav, 12 + 8 + 2, 2)
    with pytest.raises(WavFormatError, match="unsupported"):
        decode_wav_pcm16(bytes(wav))
