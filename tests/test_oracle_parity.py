"""Differential test vs the DuckDB oracle at sf0.001 (fast tier).

The full sf0.01 sweep is ``python tools/check_oracle.py`` — run it
before handing anything to the driver. This test keeps the same
comparison wired into pytest so a regression shows up immediately.
"""

from __future__ import annotations

import duckdb
import pytest

from e2e_data_pipeline_spark.operators import ORACLES, QUERIES
from e2e_data_pipeline_spark.schemas import TABLES
from tests.conftest import SF_SMALL
from tools.check_oracle import canon


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_hash_parity(spark, oracle_con, name):
    sdf = QUERIES[name](spark, SF_SMALL).toPandas()
    odf = oracle_con.sql(ORACLES[name]).df()
    (acols, arows), (bcols, brows) = canon(sdf), canon(odf)
    assert acols == bcols
    assert len(arows) == len(brows)
    for ra, rb in zip(arows, brows):
        assert ra == rb
