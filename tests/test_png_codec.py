"""Property tests for the stdlib PNG codec behind
multimodal_png_codec (operators/png_codec.py).

The oracle hash proves generator≡decoded-stats; these tests prove the
stronger pixel-exact round trip on arbitrary images, plus the
decoder's rejection of corrupted bytes (CRC is actually checked, not
decorative).
"""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from e2e_data_pipeline_spark.operators.png_codec import (
    decode_png_gray,
    encode_png_gray,
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
            st.lists(
                st.integers(0, 255), min_size=w * h, max_size=w * h
            )
        )
    )
    assert decode_png_gray(encode_png_gray(px, w, h)) == (w, h, px)


def test_all_five_filters_exercised():
    # height >= 5 guarantees scanline filters 0..4 all appear
    px = bytes((x * 37 + y * 101) % 256 for y in range(6) for x in range(7))
    png = encode_png_gray(px, 7, 6)
    raw = None
    pos = 8
    while pos < len(png):
        (length,) = struct.unpack(">I", png[pos : pos + 4])
        tag = png[pos + 4 : pos + 8]
        if tag == b"IDAT":
            raw = zlib.decompress(png[pos + 8 : pos + 8 + length])
        pos += 12 + length
    filters = {raw[y * 8] for y in range(6)}
    assert filters == {0, 1, 2, 3, 4}
    assert decode_png_gray(png) == (7, 6, px)


def test_crc_corruption_rejected():
    px = bytes((i * 31) % 256 for i in range(64))
    png = bytearray(encode_png_gray(px, 8, 8))
    # flip a byte inside the IDAT payload (after sig+IHDR chunk)
    png[8 + 25 + 12] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png_gray(bytes(png))


def test_bad_signature_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_png_gray(b"GIF89a" + b"\x00" * 30)


def test_pixel_formula_matches_oracle_hash():
    """The mint step's Python md5 pixels must equal the SQL oracle's
    ('0x'||substr(md5(s),1,2)) bytes — same strings, same digests."""
    import hashlib

    import duckdb

    ids = [0, 5, 37, 191]
    for i in ids:
        w, h = 4 + i % 13, 4 + i % 11
        py = [
            int(hashlib.md5(f"px:{i}:{p}".encode()).hexdigest()[:2], 16)
            for p in range(w * h)
        ]
        sql = duckdb.sql(
            f"""SELECT CAST(('0x' || substr(md5('px:' || CAST({i} AS VARCHAR)
                 || ':' || CAST(p AS VARCHAR)), 1, 2)) AS BIGINT)
                FROM (SELECT unnest(range(0, {w * h})) AS p)"""
        ).fetchall()
        assert py == [r[0] for r in sql]


def test_quarantine_corruption_classes_deterministic():
    """multimodal_png_quarantine's oracle predicts the decoder verdict
    per doc_id from the corruption schedule alone — pin that EVERY id
    in the fixture range classifies exactly as scheduled (a flipped
    IDAT byte is always a CRC mismatch, a half-truncation is always a
    short read, untouched images always decode)."""
    import hashlib
    import struct as _struct

    for i in range(192):
        w, h = 4 + i % 13, 4 + i % 11
        px = bytes(
            int(hashlib.md5(f"pq:{i}:{p}".encode()).hexdigest()[:2], 16)
            for p in range(w * h)
        )
        png = encode_png_gray(px, w, h)
        if i % 7 == 3:
            b = bytearray(png)
            b[len(png) // 2] ^= 0xFF
            png = bytes(b)
            with pytest.raises(ValueError, match="CRC"):
                decode_png_gray(png)
        elif i % 7 == 5:
            png = png[: len(png) // 2]
            with pytest.raises((ValueError, _struct.error, Exception)):
                decode_png_gray(png)
        else:
            assert decode_png_gray(png) == (w, h, px)


def test_ahash_brightness_invariance_unless_clipped():
    """multimodal_png_phash's collision claim: +3 brightness preserves
    every aHash bit when no pixel clips (64(px+3) > S+192 ⟺ 64px > S);
    with clipping, base and variant may differ — both paths replayed
    here in pure Python against the op's exact formula."""
    import hashlib

    def bits_of(px):
        s = sum(px)
        return [1 if 64 * v > s else 0 for v in px]

    unclipped = clipped = 0
    for i in range(128):
        base = [
            int(hashlib.md5(f"ah:{i}:{p}".encode()).hexdigest()[:2], 16)
            for p in range(64)
        ]
        var = [min(255, v + 3) for v in base]
        if max(base) <= 252:
            assert bits_of(base) == bits_of(var), i
            unclipped += 1
        else:
            clipped += 1
    # both branches must actually occur for the fixture to be honest
    assert unclipped > 0 and clipped > 0
