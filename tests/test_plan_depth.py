"""Registry-wide plan-DEPTH sweep (VERDICT r6 item 2): the
stats_fleiss_kappa class of failure, turned into a swept invariant.

Spark's SparkPlanInfo.fromSparkPlan/fromLogicalPlan recursion (run on
EVERY collect to post the SQL-execution-start event) StackOverflows
the JVM when a plan nests scalar-subquery towers — and it does so
FLAKILY, because interpreted Catalyst frames are ~10× the size of
JIT-compiled ones, so a cold session dies where a warm one survives
(observed: the same query at -Xss16m crashed on a fresh session and
passed after warmup; -Xss cannot save the driver-owned session, which
carries no JVM flags). The remedy is structural — keep every key's
executed plan shallow — and this sweep enforces it:

* ``max_indent``: deepest tree nesting in the executed plan's
  treeString (subquery inner children included). Long ITERATIVE
  chains (kmeans, pagerank) legitimately reach ~180; the budget
  catches runaway growth.
* ``subquery tower``: number of Subquery sections stacked on one
  ancestor path. The crashes came from towers (a scalar subquery
  whose plan contains scalar subqueries, ...): dq_outlier_votes
  measured tower 4+ / indent 129 before it was rebuilt stagewise
  (operators/relational_ext.py _votes_frame_staged). Budget: 2.

Shares the per-key zero-row construction cache with
test_empty_inputs/test_plan_sweep, so the marginal cost is one
treeString call per key.
"""

from __future__ import annotations

import re

import pytest

from e2e_data_pipeline_spark.operators import QUERIES

MAX_INDENT = 220  # current registry max: 180 (agg_attribution_markov)
MAX_TOWER = 2

_INDENT_RE = re.compile(r"^[\s:+\-*]*")


def plan_depth_metrics(df) -> tuple[int, int]:
    """(max tree indent, max subquery-tower depth) of the executed
    plan's treeString. Iterative (Python-side) traversal — measuring
    the hazard must not itself recurse in the JVM."""
    ts = df._jdf.queryExecution().executedPlan().treeString()
    max_indent = 0
    max_tower = 0
    path: list[tuple[int, bool]] = []  # (indent, is_subquery)
    for line in ts.splitlines():
        ind = len(_INDENT_RE.match(line).group(0))
        body = line[ind:]
        while path and path[-1][0] >= ind:
            path.pop()
        path.append((ind, body.startswith("Subquery")))
        max_indent = max(max_indent, ind)
        max_tower = max(max_tower, sum(1 for _, s in path if s))
    return max_indent, max_tower


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_depth_bounded(empty_query_cache, name):
    df, _ = empty_query_cache(name)
    indent, tower = plan_depth_metrics(df)
    assert indent <= MAX_INDENT, (
        f"{name}: plan tree indent {indent} > budget {MAX_INDENT} — "
        f"flatten the construction (materialize a stage via "
        f"localCheckpoint) before this hits the SparkPlanInfo "
        f"recursion cliff on a cold driver JVM"
    )
    assert tower <= MAX_TOWER, (
        f"{name}: {tower} scalar-subquery levels stacked on one path "
        f"(budget {MAX_TOWER}) — nested-subquery towers are the "
        f"StackOverflow shape; build the stats stagewise like "
        f"relational_ext._votes_frame_staged"
    )


def test_known_bad_tower_is_detected(spark, empty_sf_dir):
    """Metric-rot guard: the r6 crash construction (the outlier-votes
    algebra as ONE nested statement — stats_fleiss_kappa before the
    fix) must keep tripping the tower budget."""
    from pyspark.sql import functions as F

    from e2e_data_pipeline_spark.operators.aggregates import (
        _FLEISS_TAIL,
        _votes_all_days,
    )
    from e2e_data_pipeline_spark.operators.registry import wide_dbl

    orders = spark.read.parquet(f"{empty_sf_dir}/orders.parquet")
    daily = orders.groupBy(
        F.expr(
            "CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT) div 86400"
        ).alias("d")
    ).agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("y")
    )
    daily.createOrReplaceTempView("depth_canary_daily")
    votes = _votes_all_days("div", wide_dbl("q")).format(
        daily="depth_canary_daily"
    )
    bad = spark.sql("WITH allvotes AS (WITH " + votes + ")," + _FLEISS_TAIL)
    indent, tower = plan_depth_metrics(bad)
    assert tower > MAX_TOWER or indent > 100, (
        f"canary got indent={indent}, tower={tower}: either Spark now "
        f"plans nested subqueries flat (budget can tighten) or the "
        f"metric regressed"
    )
