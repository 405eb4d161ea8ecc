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
from e2e_data_pipeline_spark.schemas import TABLES
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """A fixture-layout dir where every table has 0 rows but the real
    schema (written from `limit(0)` of the sf0.001 parquet)."""
    root = tmp_path_factory.mktemp("sf_empty")
    for name in TABLES:
        src = spark.read.parquet(f"{SF_SMALL}/{name}.parquet")
        src.limit(0).write.mode("overwrite").parquet(str(root / f"{name}.parquet"))
    return str(root)


# Queries whose *content* depends on rows existing but which must
# still execute and return an empty, schema-stable frame.
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_on_empty_inputs(spark, empty_sf_dir, name):
    empty_df = QUERIES[name](spark, empty_sf_dir)
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
    n = empty_df.count()
    assert n <= cap, f"{name} produced {n} rows from nothing"
