"""Registry-wide single-partition Sort/Window audit.

Walks every registered query's formatted physical plan and reports
each Sort / Window / WindowGroupLimit node whose DIRECT child is an
``Exchange SinglePartition`` — the scale trap class (all rows through
one task). Formatted mode prints the operator tree first and each
node's arguments in a details section, so the parser joins the two:
tree lines give parent→child structure, the details say whether an
Exchange is SinglePartition. Ops whose single-partition window is
guarded by a partial ``WindowGroupLimit`` BELOW the exchange (rank
<= k: only k rows per mapper cross the shuffle) are auto-classified
as bounded and not reported.

Usage:
    python tools/plan_sp_audit.py [key ...]  # default: all keys @ sf0.001
    python tools/plan_sp_audit.py --empty    # zero-row fixtures (fast)

The test twin is tests/test_plan_sweep.py (this script is the
discovery tool that built its whitelist).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from e2e_data_pipeline_spark.operators import QUERIES  # noqa: E402
from e2e_data_pipeline_spark.session import get_spark  # noqa: E402

_TREE_NODE = re.compile(r"([A-Za-z][A-Za-z ]*?)\s*\((\d+)\)\s*$")
_RANK_NODES = ("Sort", "Window", "WindowGroupLimit")


def sp_hits(plan: str) -> list[str]:
    """['Sort(3)<-Exchange(2)', ...] for every Sort/Window/
    WindowGroupLimit directly fed by an Exchange SinglePartition
    that is NOT guarded by a partial WindowGroupLimit below it."""
    parts = plan.split("\n\n", 1)
    tree_lines = [l for l in parts[0].splitlines() if _TREE_NODE.search(l)]
    details = parts[1] if len(parts) > 1 else ""
    # node id -> details block
    blocks: dict[str, str] = {}
    for m in re.finditer(
        r"^\((\d+)\) (.*?)(?=^\(\d+\) |\Z)", details, re.M | re.S
    ):
        blocks[m.group(1)] = m.group(2)
    nodes = []  # (name, id) in tree order; next entry = direct child
    for l in tree_lines:
        m = _TREE_NODE.search(l)
        nodes.append((m.group(1).strip(), m.group(2)))
    hits = []
    for i, (name, nid) in enumerate(nodes):
        if name not in _RANK_NODES or i + 1 >= len(nodes):
            continue
        cname, cid = nodes[i + 1]
        if cname != "Exchange":
            continue
        if "SinglePartition" not in blocks.get(cid, ""):
            continue
        # bounded if a partial WindowGroupLimit sits under the exchange
        if i + 2 < len(nodes) and nodes[i + 2][0] == "WindowGroupLimit":
            continue
        hits.append(f"{name}({nid})<-Exchange({cid})")
    return hits


def plan_text(spark, key: str, sf: str) -> str:
    df = QUERIES[key](spark, sf)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    import shutil
    import tempfile

    spark = get_spark()
    sf = "/root/testdata/sf0.001"
    tmp = None
    if "--empty" in sys.argv:
        from e2e_data_pipeline_spark.schemas import TABLES

        tmp = tempfile.mkdtemp(prefix="sp_audit_empty_")
        for name in TABLES:
            df = spark.read.parquet(f"{sf}/{name}.parquet")
            df.limit(0).write.mode("overwrite").parquet(f"{tmp}/{name}.parquet")
        sf = tmp

    offenders: dict[str, list[str]] = {}
    keys = [a for a in sys.argv[1:] if not a.startswith("--")] or sorted(QUERIES)
    for key in keys:
        try:
            plan = plan_text(spark, key, sf)
        except Exception as e:  # noqa: BLE001
            print(f"[ERR ] {key}: {type(e).__name__}: {str(e)[:120]}")
            continue
        h = sp_hits(plan)
        if h:
            offenders[key] = h
            print(f"[HIT ] {key}: {h}")
    print(f"\n{len(offenders)} offender(s) of {len(keys)} keys")
    if tmp:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
