"""Generate PLANS.md: the physical-plan audit for flagship queries.

For each audited query this prints the load-bearing lines of the
formatted/optimized plan (scan pushdowns, join strategies, aggregate
phases, window limits) plus the property the plan must keep — the
human-readable companion to tests/test_plans.py, which pins the same
properties mechanically. Regenerate after any plan-affecting change:

    python tools/plan_audit.py > /dev/null && git diff PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e2e_data_pipeline_spark.operators import QUERIES  # noqa: E402
from e2e_data_pipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.01")

# query -> (what to grep from the plan, why it matters at 100 TB)
AUDIT: dict[str, tuple[list[str], str]] = {
    "filter_ne": (
        ["PushedFilters", "ReadSchema"],
        "Filters reach the parquet scan; only projected columns are read.",
    ),
    "join_multiway": (
        ["PushedFilters", "BroadcastHashJoin", "SortMergeJoin", "Exchange"],
        "Dims broadcast; the region/date filters prune before the big joins; "
        "facts shuffle once on their join keys.",
    ),
    "agg_groupby": (
        ["HashAggregate", "Exchange"],
        "Partial (map-side) aggregate sits below the exchange — the shuffle "
        "carries group totals, not rows.",
    ),
    "win_topk_per_group": (
        ["WindowGroupLimit", "Sort"],
        "Per-group top-k pushes k into the sort; no group ever fully "
        "materializes its ranking.",
    ),
    "sort_limit": (
        ["TakeOrderedAndProject"],
        "Global top-n is a k-heap per partition + merge, never a full sort.",
    ),
    "join_range_binned": (
        ["SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"],
        "The BETWEEN band join is rewritten to a bucket-exploded EQUI-join — "
        "a raw band predicate would plan as BroadcastNestedLoopJoin (15x "
        "slower at sf0.1).",
    ),
    "join_cbo_reorder": (
        ["Join", "Relation"],
        "With ANALYZE stats + CBO, the worst-order SQL (lineitem first) is "
        "reordered to join the filtered dim first.",
    ),
    "join_dpp_prune": (
        ["dynamicpruning", "PartitionFilters"],
        "The runtime dim result prunes fact DIRECTORIES via "
        "dynamicpruningexpression — no static predicate exists.",
    ),
    "join_bloom_runtime": (
        ["bloom_filter_agg", "might_contain"],
        "The selective dim filter becomes a bloom probe below the fact "
        "pre-aggregation shuffle.",
    ),
    "scan_jdbc_pushdown": (
        ["JDBCRelation", "PushedFilters"],
        "Predicates execute inside the database; only matching rows cross "
        "the wire.",
    ),
    "scan_partition_pruned": (
        ["PartitionFilters"],
        "The day-range predicate prunes at the directory level before any "
        "footer is read.",
    ),
    "scan_cached_table": (
        ["InMemoryTableScan"],
        "Steady-state reads hit the columnar cache, not parquet.",
    ),
    "join_geo_grid": (
        ["SortMergeJoin", "ShuffledHashJoin", "Generate"],
        "The 2-D radius join runs as an equi-join on exploded grid "
        "cells — not BroadcastNestedLoopJoin.",
    ),
    "dedup_minhash_det": (
        ["SortMergeJoin", "ShuffledHashJoin", "HashAggregate"],
        "Candidate pairs come from a band-signature equi-join (linear), "
        "never an all-pairs comparison.",
    ),
    "ml_kmeans_lloyd": (
        ["BroadcastNestedLoopJoin", "BroadcastHashJoin", "SortMergeJoin",
         "HashAggregate"],
        "Every Lloyd assign pass joins points against BROADCAST centroids "
        "(KB-sized at any corpus scale); centroid updates are keyed "
        "aggregates with map-side partials — no iteration shuffles the "
        "point set.",
    ),
    "join_interval_overlap": (
        ["BroadcastHashJoin", "SortMergeJoin", "BroadcastNestedLoopJoin"],
        "The interval theta self-join is rewritten as an equi-join on "
        "exploded (day, hour) buckets — a nested loop here would be "
        "quadratic in concurrent users.",
    ),
    "graph_triangles": (
        ["BroadcastHashJoin", "SortMergeJoin", "HashAggregate"],
        "Triangle closure runs as two equi-joins over the support-pruned, "
        "canonically-oriented edge list; only the 1-row scalar aggregates "
        "ride nested-loop joins.",
    ),
    "stats_permutation_test": (
        ["HashAggregate", "Exchange", "Generate"],
        "The 100x replicate explode (Generate) sits BELOW the partial "
        "aggregate, so the shuffle carries <=200 (replicate, group) cells "
        "per task regardless of event volume.",
    ),
    "sim_ivf_index_roundtrip": (
        ["SelectedBucketsCount", "BroadcastHashJoin"],
        "The probe reads ONLY the probed cells' buckets from the persisted "
        "bucketBy(8, cell) index (bucket pruning), joined with a broadcast "
        "of the tiny probe set.",
    ),
    "corpus_e2e_manifest": (
        ["hashpartitioning(__pid", "HashAggregate"],
        "The token-budget shard packing rides global_rank's per-__pid "
        "windows over the pinned range layout — no single-partition "
        "running sum.",
    ),
    "join_lateral_api": (
        ["BroadcastHashJoin", "WindowGroupLimit", "NestedLoop"],
        "The correlated LATERAL (DataFrame.lateralJoin) decorrelates to "
        "an equi-join + partial WindowGroupLimit — no per-outer-row "
        "re-execution, no nested loop.",
    ),
    "scan_merge_on_read": (
        ["BroadcastHashJoin", "LeftAnti", "Union"],
        "The MOR snapshot assembly broadcasts the tombstone set into a "
        "LeftAnti join over one base scan — the merge never shuffles "
        "the base table.",
    ),
}


def plan_text(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    txt = qe.explainString(mode)
    # DPP / cached-plan features only appear in the executed plan.
    txt += "\n" + qe.executedPlan().toString()
    if name == "join_cbo_reorder":
        txt += "\n" + qe.optimizedPlan().toString()
    return txt


def main() -> None:
    spark = get_spark("plan-audit")
    out = [
        "# PLANS.md — physical-plan audit of the flagship queries",
        "",
        f"Generated by `python tools/plan_audit.py` at {SF} "
        "(excerpts: only the load-bearing plan lines). The same properties "
        "are pinned mechanically in tests/test_plans.py — this file is the "
        "readable wheres-and-whys.",
        "",
    ]
    for name, (needles, why) in AUDIT.items():
        txt = plan_text(spark, name)
        hits: list[str] = []
        seen: set[str] = set()
        for line in txt.splitlines():
            if any(n.lower() in line.lower() for n in needles):
                clean = re.sub(r"#\d+L?", "", line.strip())[:160]
                if clean not in seen:
                    seen.add(clean)
                    hits.append(clean)
            if len(hits) >= 8:
                break
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Property:** {why}")
        out.append("")
        out.append("```")
        out.extend(hits if hits else ["(no matching plan lines — REGRESSION?)"])
        out.append("```")
        out.append("")
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
