"""Negative / independent-replay pins for the proof-shaped round-8
operators (r9, VERDICT r8 #2): each test seeds a fault or replays the
contract in plain Python, proving the operator's guarantee actually
bites — the oracle hash alone only exercises the happy path."""

from __future__ import annotations

import hashlib
import shutil

import pyarrow.parquet as pq
import pytest

from e2e_data_pipeline_spark.operators import QUERIES
from tests.conftest import SF_SMALL

_B32 = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"


def test_merkle_root_sees_a_one_cent_corruption(spark, tmp_path):
    """Flip one value in ONE partition class of a copied fixture: the
    Merkle root must change, the perturbed class's leaf must change,
    and every OTHER leaf must stay bit-identical (localization is the
    whole point of the hierarchical checksum)."""
    base = {
        r["pclass"]: r
        for r in QUERIES["dq_merkle_partitions"](spark, SF_SMALL).collect()
    }

    tbl = pq.read_table(f"{SF_SMALL}/lineitem.parquet")
    pdf = tbl.to_pandas()
    victim_key = int(pdf["l_orderkey"].iloc[0])
    victim_class = victim_key % 16
    mask = pdf["l_orderkey"] == victim_key
    pdf.loc[mask, "l_extendedprice"] = (
        pdf.loc[mask, "l_extendedprice"] + 0.01
    )
    work = tmp_path / "merkle_fault"
    work.mkdir()
    import pyarrow as pa

    pq.write_table(
        pa.Table.from_pandas(pdf, schema=tbl.schema, preserve_index=False),
        str(work / "lineitem.parquet"),
    )
    try:
        faulted = {
            r["pclass"]: r
            for r in QUERIES["dq_merkle_partitions"](
                spark, str(work)
            ).collect()
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    assert set(base) == set(faulted)
    row_b, row_f = base[victim_class], faulted[victim_class]
    assert row_f["leaf_a"] != row_b["leaf_a"], "leaf must see the flip"
    for c in base:
        if c == victim_class:
            continue
        assert faulted[c]["leaf_a"] == base[c]["leaf_a"], (
            f"class {c} leaf changed though its data did not"
        )
    # root digests are per-run constants replicated onto every row
    assert faulted[victim_class]["root_differs"] == base[victim_class][
        "root_differs"
    ]  # intra-run A/B flag is fixture-determined, unaffected
    # cross-run root comparison: recompute both roots the op's way
    def root_of(rows):
        leaves = [rows[c]["leaf_a"] for c in sorted(rows)]
        return hashlib.md5("|".join(leaves).encode()).hexdigest()

    assert root_of(base) != root_of(faulted), "root blind to corruption"


def test_ulid_codec_matches_python_replay_and_is_time_ordered(spark):
    """fn_ulid_codec vs a from-scratch Python mint (hashlib md5 +
    divmod Crockford base-32): every ULID string, decoded timestamp
    and round-trip flag must match, and the lexicographic order of the
    10-char time prefix must equal the numeric order of ts_ms — the
    ULID sortability contract."""
    rows = QUERIES["fn_ulid_codec"](spark, SF_SMALL).collect()
    assert rows

    def mint(ts_ms: int, r_hi: int, r_lo: int) -> str:
        out = []
        for word, n in ((ts_ms, 10), (r_hi, 8), (r_lo, 8)):
            for i in range(n - 1, -1, -1):
                out.append(_B32[(word // 32**i) % 32])
        return "".join(out)

    seen = []
    for r in rows:
        k = r["o_orderkey"]
        h = hashlib.md5(f"ulid:{k}".encode()).hexdigest()
        expect = mint(r["ts_ms"], int(h[:10], 16), int(h[10:20], 16))
        assert r["ulid"] == expect, f"key {k}"
        assert r["ts_decoded"] == r["ts_ms"]
        assert r["round_trip_ok"] == 1
        seen.append((r["ts_ms"], r["ulid"]))
    assert len({t for t, _ in seen}) > 1, "fixture must span timestamps"
    by_ulid = sorted(u[:10] for _, u in seen)
    by_ts = [u[:10] for _, u in sorted(seen, key=lambda x: (x[0], x[1][:10]))]
    assert by_ulid == by_ts, "time prefix not lexicographically sortable"


def test_deletion_vectors_match_python_replay_and_deletes_bite(spark):
    """scan_deletion_vectors vs a plain-Python replay of the physical
    layout (sort each class, number positions, apply (pos+class)%7==3)
    — and the resurface negative: a reader that ignores the DV (sums
    every row) must NOT reproduce live_cents for any class that has
    deletes."""
    rows = {
        r["file_class"]: r
        for r in QUERIES["scan_deletion_vectors"](
            spark, SF_SMALL
        ).collect()
    }
    pdf = pq.read_table(
        f"{SF_SMALL}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    ).to_pandas()
    pdf["cents"] = (pdf["l_extendedprice"] * 100).round().astype("int64")

    any_deletes = False
    for c in range(4):
        sub = pdf[pdf["l_orderkey"] % 4 == c].sort_values(
            ["l_orderkey", "l_linenumber", "cents"], kind="mergesort"
        )
        cents = sub["cents"].to_numpy()
        n = len(cents)
        deleted = [(p + c) % 7 == 3 for p in range(n)]
        live = int(cents[[not d for d in deleted]].sum())
        total = int(cents.sum())
        r = rows[c]
        assert r["n_total"] == n
        assert r["n_deleted"] == sum(deleted)
        assert r["live_cents"] == live
        if sum(deleted):
            any_deletes = True
            assert total != live, (
                f"class {c}: resurfaced deleted rows are invisible"
            )
            assert r["live_cents"] != total
    assert any_deletes, "fixture produced no deletes — vacuous pin"


def test_manifest_skipping_actually_skips(spark):
    """The skipping accounting must show real pruning: the range query
    spans ~1/8 of the key space, so the manifest must rule out most of
    the 8 range-clustered files — if n_files_scanned == n_files_total
    the 'index' is decorative."""
    row = QUERIES["sink_manifest_skipping"](spark, SF_SMALL).collect()[0]
    assert row["n_files_total"] == 8
    assert 1 <= row["n_files_scanned"] <= 3
    assert row["n_rows"] > 0


def test_hilbert_codec_matches_textbook_replay(spark):
    """fn_hilbert_curve vs the textbook Wikipedia xy2d/d2xy loops in
    plain Python (the generated SQL chains are IDENTICAL text on both
    engines, so parity alone is formula-blind). Also pins the curve's
    defining property on the op's own points: consecutive d values
    along the curve map to GRID-ADJACENT cells."""

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    def d2xy(n, d):
        x = y = 0
        t = d
        s = 1
        while s < n:
            rx = 1 & (t // 2)
            ry = 1 & (t ^ rx)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            x += s * rx
            y += s * ry
            t //= 4
            s *= 2
        return x, y

    rows = QUERIES["fn_hilbert_curve"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["round_trip_ok"] == 1
        assert r["hilbert_d"] == xy2d(256, r["x"], r["y"]), (
            f"key {r['o_orderkey']}"
        )
        assert (r["x_decoded"], r["y_decoded"]) == d2xy(256, r["hilbert_d"])
    # locality: full-curve neighbor property on a deterministic stripe
    for d in range(0, 65536, 97):
        x1, y1 = d2xy(256, d)
        x2, y2 = d2xy(256, d + 1)
        assert abs(x1 - x2) + abs(y1 - y2) == 1
