"""Property tests for the stdlib GIF87a/LZW codec behind
multimodal_gif_codec (operators/gif_codec.py).

The oracle hash proves generator≡decoded-stats; these tests prove the
stronger pixel-exact round trip on arbitrary images, the LZW
dictionary-reset path, the cScSc decoder case, PNG↔GIF cross-codec
agreement, and the quarantine classifier's determinism.
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from e2e_data_pipeline_spark.operators.gif_codec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif_gray,
    encode_gif_gray,
)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=48),
    h=st.integers(min_value=1, max_value=48),
    data=st.data(),
)
def test_round_trip_exact(w, h, data):
    px = bytes(
        data.draw(
            st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h)
        )
    )
    assert decode_gif_gray(encode_gif_gray(px, w, h)) == (w, h, px)


def test_dictionary_reset_path():
    # a 200x200 constant image mints >4096 LZW codes, forcing the
    # mid-stream CLEAR + dictionary rebuild on both paths
    px = bytes([7]) * 40_000
    assert decode_gif_gray(encode_gif_gray(px, 200, 200))[2] == px


def test_cscsc_decoder_case():
    # 'aaa...' immediately emits a code equal to next_code (the
    # classic KwKwK case); any decoder missing it corrupts output
    for run in (3, 5, 17, 100):
        px = bytes([42]) * run
        assert _lzw_decode(_lzw_encode(px), run) == px


def test_sub_block_framing_over_255():
    # random-ish incompressible pixels make the LZW stream span
    # multiple 255-byte sub-blocks
    px = bytes(
        int(hashlib.md5(f"sb:{i}".encode()).hexdigest()[:2], 16)
        for i in range(64 * 64)
    )
    gif = encode_gif_gray(px, 64, 64)
    assert len(gif) > 13 + 768 + 10 + 300  # definitely multi-block
    assert decode_gif_gray(gif) == (64, 64, px)


def test_cross_codec_agreement():
    # the SAME pixels through two independent codecs (PNG: filters +
    # deflate; GIF: LZW) must decode identically
    from e2e_data_pipeline_spark.operators.png_codec import (
        decode_png_gray,
        encode_png_gray,
    )

    px = bytes((x * 7 + y * 13) % 256 for y in range(23) for x in range(31))
    assert (
        decode_png_gray(encode_png_gray(px, 31, 23))
        == decode_gif_gray(encode_gif_gray(px, 31, 23))
        == (31, 23, px)
    )


def test_truncation_rejected():
    px = bytes((i * 31) % 256 for i in range(144))
    gif = encode_gif_gray(px, 12, 12)
    for cut in (3, 10, 400, len(gif) // 2, len(gif) - 2):
        with pytest.raises(ValueError):
            decode_gif_gray(gif[:cut])


def test_non_gray_palette_rejected():
    px = bytes(range(100))
    gif = bytearray(encode_gif_gray(px, 10, 10))
    gif[13 + 3 * 7 + 1] ^= 0xFF  # entry 7's G channel
    with pytest.raises(ValueError, match="not grayscale"):
        decode_gif_gray(bytes(gif))


def test_quarantine_classification_deterministic():
    """Replays multimodal_gif_quarantine's corruption schedule for
    every id and pins the classification the oracle predicts."""
    for i in range(192):
        w, h = 4 + i % 12, 4 + i % 9
        px = bytes(
            int(hashlib.md5(f"gq:{i}:{p}".encode()).hexdigest()[:2], 16)
            for p in range(w * h)
        )
        gif = encode_gif_gray(px, w, h)
        if i % 7 == 3:
            b = bytearray(gif)
            b[13 + 3 * 7 + 1] ^= 0xFF
            gif = bytes(b)
        elif i % 7 == 5:
            gif = gif[: len(gif) // 2]
        try:
            got = ("ok",) + decode_gif_gray(gif)[:2]
        except ValueError as e:
            got = (
                "not_gray" if "not grayscale" in str(e) else "truncated",
                None,
                None,
            )
        want = (
            ("not_gray", None, None)
            if i % 7 == 3
            else ("truncated", None, None)
            if i % 7 == 5
            else ("ok", w, h)
        )
        assert got == want, f"id {i}: {got} != {want}"
