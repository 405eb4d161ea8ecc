"""Property tests for the stdlib Avro OCF codec behind scan_avro_py
(operators/avro_codec.py): pixel-exact... rather, BYTE-exact round
trip of long/string/double records under both codecs, multi-block
framing, and structural corruption rejection."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from e2e_data_pipeline_spark.operators.avro_codec import (
    read_ocf,
    write_ocf,
)

FIELDS = [("k", "long"), ("name", "string"), ("amt", "double")]

_row = st.tuples(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.text(max_size=24),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
)


@settings(max_examples=40, deadline=None)
@given(rows=st.lists(_row, max_size=60), codec=st.sampled_from(["null", "deflate"]))
def test_round_trip_exact(rows, codec):
    data = write_ocf(rows, FIELDS, codec=codec, sync=bytes(range(16)))
    fields, back = read_ocf(data)
    assert fields == FIELDS
    assert back == rows


def test_multi_block_framing():
    rows = [(i, f"s{i}", i / 7.0) for i in range(2500)]
    data = write_ocf(rows, FIELDS, block_rows=100)
    assert read_ocf(data)[1] == rows
    # 25 blocks => 25 sync markers after the header one
    assert data.count(b"\x00" * 16) >= 26


def test_bad_magic_rejected():
    data = bytearray(write_ocf([(1, "a", 1.0)], FIELDS))
    data[0] ^= 0xFF
    with pytest.raises(ValueError, match="magic"):
        read_ocf(bytes(data))


def test_sync_corruption_rejected():
    rows = [(i, "x", 0.5) for i in range(10)]
    data = bytearray(write_ocf(rows, FIELDS, sync=bytes(range(16))))
    data[-1] ^= 0xFF  # trailing sync marker byte
    with pytest.raises(ValueError, match="sync"):
        read_ocf(bytes(data))


def test_truncation_rejected():
    data = write_ocf([(i, "x", 0.5) for i in range(50)], FIELDS)
    for cut in (3, 5, len(data) // 2, len(data) - 4):
        with pytest.raises(ValueError):
            read_ocf(data[:cut])


def test_ieee_doubles_travel_bit_exact():
    import math
    import struct

    vals = [0.1, -0.0, math.pi, 2.0**-1074, 1.7e308]
    rows = [(i, "", v) for i, v in enumerate(vals)]
    back = read_ocf(write_ocf(rows, FIELDS))[1]
    for (_, _, a), (_, _, b) in zip(rows, back):
        assert struct.pack("<d", a) == struct.pack("<d", b)
