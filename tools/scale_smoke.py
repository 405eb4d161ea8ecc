"""Scale-linearity smoke: run headline operators at sf0.1 and at an
N×-inflated copy and report the wall-time ratio.

The inflated dataset is built by key-shifted replication (every foreign
key family shifts by the same stride per copy, so join/group semantics
and selectivities are preserved — copy i is a disjoint "tenant"). The
result mimics the fixture layout, so ANY registry query can run against
it unchanged. This is an internal linearity check, NOT part of the
driver contract: a quadratic kernel or a driver-side collect that
bench.py's sf0.1 can't expose shows up here as a ratio far above N.

Usage:  python tools/scale_smoke.py [N] [key ...]
        (default N=4, keys = a representative heavy mix)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from e2e_data_pipeline_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/spark_graft_scale"

# Per-copy shifts keep every FK family consistent (tenant isolation).
SHIFTS = {
    "o_orderkey": 100_000_000,
    "l_orderkey": 100_000_000,
    "c_custkey": 10_000_000,
    "o_custkey": 10_000_000,
    "user_id": 10_000_000,
    "p_partkey": 1_000_000,
    "l_partkey": 1_000_000,
    "s_suppkey": 1_000_000,
    "l_suppkey": 1_000_000,
    "event_id": 100_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,
}
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
DEFAULT_KEYS = [
    "join_multiway", "agg_groupby", "join_shuffle", "win_rank",
    "join_asof", "dedup_near_lsh", "corpus_pipeline", "sim_topk",
]


def build_inflated(spark, n: int) -> str:
    out = f"{WORK}/x{n}"
    if os.path.isdir(out) and os.listdir(out):
        return out
    shutil.rmtree(out, ignore_errors=True)
    for t in TABLES:
        # Raw read (no catalog ts normalization): bytes in == bytes out,
        # so the inflated copy keeps the fixtures' physical types.
        raw = spark.read.parquet(f"{BASE}/{t}.parquet")
        if t in ("region", "nation"):
            copies = raw  # shared dims: same 5/25 rows for every tenant
        else:
            parts = []
            for i in range(n):
                c = raw
                for col in c.columns:
                    if col in SHIFTS:
                        c = c.withColumn(col, F.col(col) + F.lit(i * SHIFTS[col]))
                if t == "documents" and i > 0:
                    # Tenant-disjoint TEXT too: suffix every token so the
                    # shingle space is disjoint across copies while the
                    # within-tenant Jaccard structure is untouched.
                    # Without this, every doc gains n-1 identical
                    # cross-tenant twins and any pairwise text op's edge
                    # set grows quadratically BY CONSTRUCTION — a harness
                    # artifact, not engine superlinearity.
                    c = c.withColumn(
                        "text", F.regexp_replace("text", r"(\S+)", rf"$1_t{i}")
                    )
                parts.append(c)
            copies = parts[0]
            for p in parts[1:]:
                copies = copies.unionByName(p)
        copies.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


def timed(fn, *args) -> float:
    t0 = time.monotonic()
    fn(*args).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    keys = sys.argv[2:] or DEFAULT_KEYS
    spark = get_spark("scale-smoke")
    inflated = build_inflated(spark, n)

    from e2e_data_pipeline_spark.operators import QUERIES

    report = {}
    for key in keys:
        q = QUERIES[key]
        timed(q, spark, BASE)  # warm (plans, code cache, page cache)
        base_s = timed(q, spark, BASE)
        big_s = timed(q, spark, inflated)
        ratio = big_s / base_s if base_s > 0 else float("inf")
        report[key] = {
            "base_s": round(base_s, 3),
            f"x{n}_s": round(big_s, 3),
            "ratio": round(ratio, 2),
        }
        flag = "" if ratio <= n * 1.8 + 1 else "  <-- SUPERLINEAR?"
        print(f"{key:24s} base {base_s:6.2f}s  x{n} {big_s:6.2f}s  "
              f"ratio {ratio:5.2f}{flag}")
    print(json.dumps({"n": n, "queries": report}))


if __name__ == "__main__":
    main()
