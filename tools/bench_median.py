"""Interleaved-median benchmark protocol (CLAUDE.md noise rule).

The machine shares cores with other processes, so single-shot timings
drift by >15% run to run. This tool runs the headline query set N times
(default 6) *interleaved* — pass 1 runs q1..q10, pass 2 runs q1..q10,
... — inside ONE warmed session, then reports the per-query MEDIAN and
the spread (min/max). Medians over interleaved passes cancel slow-phase
machine noise that would bias any sequential A/B.

Usage:
    python tools/bench_median.py [N_PASSES]

Prints one JSON line:
    {"protocol": "interleaved-median", "passes": N,
     "median_total": S, "queries": {name: {"median": m, "min": lo, "max": hi}}}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from e2e_data_pipeline_spark.session import get_spark
    from e2e_data_pipeline_spark.operators import QUERIES

    spark = get_spark("e2e-bench-median")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    names = [n for n in HEADLINE if n in QUERIES]
    # Untimed warmup pass (footer cache, codegen compile).
    for name in names:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(passes):
        for name in names:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.time() - t0)

    queries = {
        n: {
            "median": round(statistics.median(v), 3),
            "min": round(min(v), 3),
            "max": round(max(v), 3),
        }
        for n, v in samples.items()
    }
    print(
        json.dumps(
            {
                "protocol": "interleaved-median",
                "passes": passes,
                "sf_dir": sf_dir,
                "median_total": round(sum(q["median"] for q in queries.values()), 3),
                "queries": queries,
            }
        )
    )


if __name__ == "__main__":
    main()
