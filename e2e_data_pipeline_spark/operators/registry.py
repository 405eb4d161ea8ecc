"""Query registry: the single source of truth for the engine surface.

Every operator from SURVEY.md §2 registers a ``(spark, sf_dir) ->
DataFrame`` callable here, plus (when the semantics are
SQL-expressible) the equivalent ANSI SQL the DuckDB oracle runs on the
same parquet tables. ``__spark_entry__.py`` re-exports these dicts.

Oracle-parity helpers live here too. The hash check is *exact*, so
float aggregation must be bit-deterministic across engines; the
``dec_sum``/``dec_avg`` helpers sum after casting to DECIMAL (exact,
order-insensitive) and cast the final result back to DOUBLE — the same
construction is written into the oracle SQL. See the module docstrings
of each operator file for per-operator notes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optional oracle SQL) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Exact-arithmetic helpers (Spark side). The SQL twins are spelled
# inline in each oracle string:
#   dec_sum  ->  CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)
#   dec_avg  ->  CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x)
# Rationale: double summation is order-dependent and Spark/DuckDB
# reduce in different orders; decimal addition is exact and therefore
# order-insensitive, and the final decimal->double cast is the same
# deterministic rounding in both engines.
# ---------------------------------------------------------------------------


def dec(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    return F.sum(dec(col, scale)).cast("double")


def dec_avg(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.count(c)
