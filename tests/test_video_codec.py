"""Negative pins for the VID0 container walker (r9, VERDICT r8 #2):
multimodal_video_codec's decode kernel must REJECT corrupted
containers the way the PNG/GIF quarantine twins do — today's oracle
hash only proves the happy path. These tests seed faults against the
SAME module-level walker the operator's mapInPandas kernel calls."""

from __future__ import annotations

import struct

import pytest

from e2e_data_pipeline_spark.operators.llm_multimodal import (
    walk_video_container,
)
from e2e_data_pipeline_spark.operators.png_codec import encode_png_gray


def _mint(n_frames: int, w: int = 5, h: int = 4) -> bytes:
    parts = [b"VID0", struct.pack(">I", n_frames)]
    for f in range(n_frames):
        px = bytes((f * 37 + p * 11) % 256 for p in range(w * h))
        png = encode_png_gray(px, w, h)
        parts.append(struct.pack(">I", len(png)))
        parts.append(png)
    return b"".join(parts)


def test_valid_container_round_trips():
    nf, n_sampled, w, h, px_sum = walk_video_container(_mint(3))
    assert (nf, n_sampled, w, h) == (3, 2, 5, 4)  # frames 0 and 2 sampled
    expect = sum(
        (f * 37 + p * 11) % 256 for f in (0, 2) for p in range(20)
    )
    assert px_sum == expect


def test_bad_magic_rejected():
    data = bytearray(_mint(2))
    data[0] ^= 0xFF
    with pytest.raises(ValueError, match="magic"):
        walk_video_container(bytes(data))


def test_truncated_container_rejected():
    data = _mint(2)
    with pytest.raises((ValueError, struct.error)):
        walk_video_container(data[: len(data) // 2])


def test_trailing_bytes_rejected():
    with pytest.raises(ValueError, match="trailing"):
        walk_video_container(_mint(2) + b"\x00")


def test_corrupt_sampled_frame_rejected():
    """A flipped byte inside frame 0's PNG payload (sampled by the
    stride-2 rule) must fail the PNG CRC check."""
    data = bytearray(_mint(1))
    data[len(data) - 8] ^= 0xFF  # inside the IDAT/CRC tail of frame 0
    with pytest.raises(ValueError):
        walk_video_container(bytes(data))


def test_corrupt_unsampled_frame_is_skipped():
    """Stride-2 sampling means odd frames are never decoded: a payload
    fault in frame 1 that preserves the length prefix must NOT raise —
    this pins the sampling pattern itself, not just the codec."""
    base = _mint(2)
    # locate frame 1's payload: skip header + frame 0 record
    (len0,) = struct.unpack_from(">I", base, 8)
    f1_payload = 8 + 4 + len0 + 4
    data = bytearray(base)
    data[f1_payload + 10] ^= 0xFF
    nf, n_sampled, w, h, _ = walk_video_container(bytes(data))
    assert (nf, n_sampled, w, h) == (2, 1, 5, 4)
