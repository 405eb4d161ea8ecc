"""Zero-row robustness: every registered query must plan, execute, and
keep its schema when every input table is EMPTY.

Why this matters at scale: partition pruning and filter pushdown
routinely hand an operator zero rows (an empty date partition, a
filter that eliminates a split). An operator that throws on empty
input — a `.first()` that assumes a row, a percentile over nothing, a
max over an empty cell — fails exactly when pruning works best. The
schema must also be identical to the populated run, since downstream
consumers bind to it before any data arrives.
"""

from __future__ import annotations

import pytest

from e2e_data_pipeline_spark.operators import QUERIES
from tests.conftest import SF_SMALL


# The zero-row fixture dir and the per-key construction cache are
# session fixtures in conftest.py, shared with test_plan_sweep.


# Queries whose *content* depends on rows existing but which must
# still execute and return an empty, schema-stable frame.
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_on_empty_inputs(spark, empty_query_cache, name):
    empty_df, _ = empty_query_cache(name)
    full_df = QUERIES[name](spark, SF_SMALL)
    assert [f.name for f in empty_df.schema.fields] == [
        f.name for f in full_df.schema.fields
    ], "column set must not depend on data"
    # Executing must not throw. Row-count sanity: per-row operators
    # yield 0; only data-independent outputs survive — global/labeled
    # aggregates (1-2 rows), static band/table enumerations
    # (join_theta_range 5, scan_parquet 10, seq_explode 20,
    # sql_generate_series' 24-hour spine — which EXISTS to emit the
    # zero-filled axis when data is absent). Anything larger means
    # rows were fabricated from nothing.
    # dq_data_dictionary enumerates the 48-column catalog spec — a
    # metadata row per column exists regardless of data.
    static_caps = {"sql_generate_series": 24, "dq_data_dictionary": 48}
    cap = static_caps.get(name, 20)
    # collect(), NOT count(): count() lets column pruning drop every
    # projected expression, hiding plan-time ANSI hazards (a literal
    # 0/0 folded at planning raises DIVIDE_BY_ZERO only when the
    # column survives — the stats_ks_uniform_hash/scan_csv_quarantine
    # class). Inputs are empty, so materializing all columns is free.
    n = len(empty_df.collect())
    assert n <= cap, f"{name} produced {n} rows from nothing"
