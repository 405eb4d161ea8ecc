"""Run EVERY registered query end-to-end at a given scale factor and
print wall times, slowest first — the empirical "would this survive a
scale-up" check (bench.py times only the headline set).

Usage:
    python tools/sweep_sf.py [sf_dir] [--include-headline]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    include_headline = "--include-headline" in sys.argv

    from bench import HEADLINE
    from e2e_data_pipeline_spark.operators import QUERIES
    from e2e_data_pipeline_spark.session import get_spark

    spark = get_spark("sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rows = []
    for name in sorted(QUERIES):
        if not include_headline and name in HEADLINE:
            continue
        t0 = time.time()
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            rows.append((time.time() - t0, name, "ok"))
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            rows.append((time.time() - t0, name, f"FAIL {type(e).__name__}: {e}"))

    failed = 0
    for t, name, status in sorted(rows, reverse=True):
        print(f"{t:7.2f}s  {name}  {status[:120]}")
        failed += status != "ok"
    print(f"\n{len(rows) - failed} ok, {failed} failed @ {sf_dir}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
