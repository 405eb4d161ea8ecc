"""Cold-JVM stress for the SparkPlanInfo recursion cliff (round 7):
run the deepest-plan keys' ZERO-ROW collect as the FIRST queries of a
fresh subprocess session, optionally under a reduced thread stack.

Why a tool and not a test: the failure mode is flaky by nature
(interpreted Catalyst frames are ~10× compiled ones, so the same plan
passes or dies depending on JIT state) — a CI test would be noise.
The deterministic guards live in tests/test_plan_depth.py (tree ≤220,
subquery-tower ≤2); this tool is the empirical companion: run it
after adding any deep construction and before closing a round.

Usage:
  python tools/cold_stress.py                 # 8 deepest keys, default -Xss16m
  python tools/cold_stress.py -Xss512k k1 k2  # explicit stack + keys
Each key runs in its OWN fresh subprocess (fully cold JVM).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, os, re, tempfile
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_DRIVER_JAVA_OPTS"] = {xss!r}
from e2e_data_pipeline_spark.session import get_spark
from e2e_data_pipeline_spark.operators import QUERIES
from e2e_data_pipeline_spark.schemas import TABLES

spark = get_spark("cold-stress")
root = tempfile.mkdtemp(prefix="sf_empty_")
for name in TABLES:
    spark.read.parquet(f"/root/testdata/sf0.001/{{name}}.parquet").limit(
        0
    ).write.parquet(os.path.join(root, f"{{name}}.parquet"))
QUERIES[{key!r}](spark, root).collect()
print("COLD_OK", {key!r})
spark.stop()
"""


def deepest_keys(n: int = 8) -> list[str]:
    """Measure zero-row plan indent for every key in ONE session and
    return the n deepest (measurement is warm; execution is cold)."""
    import tempfile

    sys.path.insert(0, REPO)
    from e2e_data_pipeline_spark.operators import QUERIES
    from e2e_data_pipeline_spark.schemas import TABLES
    from e2e_data_pipeline_spark.session import get_spark

    spark = get_spark("cold-stress-measure")
    root = tempfile.mkdtemp(prefix="sf_empty_")
    for name in TABLES:
        spark.read.parquet(f"/root/testdata/sf0.001/{name}.parquet").limit(
            0
        ).write.parquet(os.path.join(root, f"{name}.parquet"))
    depths = {}
    for k in sorted(QUERIES):
        try:
            ts = (
                QUERIES[k](spark, root)
                ._jdf.queryExecution()
                .executedPlan()
                .treeString()
            )
            depths[k] = max(
                len(re.match(r"^[\s:+\-*]*", ln).group(0))
                for ln in ts.splitlines()
            )
        except Exception:
            depths[k] = -1
    spark.stop()
    return [
        k for k, _ in sorted(depths.items(), key=lambda x: -x[1])[:n]
    ]


def main() -> None:
    args = sys.argv[1:]
    xss = "-Xss16m"
    if args and args[0].startswith("-Xss"):
        xss, args = args[0], args[1:]
    keys = args or deepest_keys()
    print(f"stress keys ({xss}): {keys}", flush=True)
    failed = []
    for key in keys:
        code = _CHILD.format(repo=REPO, xss=xss, key=key)
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=600,
        )
        ok = f"COLD_OK {key}" in r.stdout
        print(f"  {'OK  ' if ok else 'FAIL'} {key}", flush=True)
        if not ok:
            failed.append(key)
            tail = [
                ln
                for ln in (r.stdout + r.stderr).splitlines()
                if "Error" in ln or "error" in ln
            ][:3]
            for ln in tail:
                print(f"       {ln[:160]}")
    print(f"{len(keys) - len(failed)}/{len(keys)} cold-clean; failed: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
