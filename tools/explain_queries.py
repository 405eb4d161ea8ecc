"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage:
    python tools/explain_queries.py <tag> <suffix> [key ...]

Writes plans/<tag>/<key>_<suffix>.txt for each key (default: the
bench.py HEADLINE set). The optimization-round judge checks plan
claims against these files, so capture them BEFORE and AFTER every
substantive change.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r10"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    keys = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE
    from e2e_data_pipeline_spark.operators import QUERIES
    from e2e_data_pipeline_spark.session import get_spark

    if not keys:
        keys = HEADLINE

    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in keys:
        df = QUERIES[name](spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
