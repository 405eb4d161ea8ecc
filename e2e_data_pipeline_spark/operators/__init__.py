"""Operator registry package.

Importing this package populates ``QUERIES`` / ``ORACLES`` with every
implemented operator (SURVEY.md §2 keys). Modules self-register via
the :func:`e2e_data_pipeline_spark.operators.registry.register`
decorator at import time.
"""

from e2e_data_pipeline_spark.operators.registry import ORACLES, QUERIES, register

# Import order = SURVEY.md §2 section order. Each import registers its
# queries as a side effect.
from e2e_data_pipeline_spark.operators import (  # noqa: E402,F401
    scans,
    filters,
    joins,
    tpch_extra,
    aggregates,
    windows,
    setops_sort,
    relational_ext,
    timeseries,
    scalar_functions,
    llm_text,
    llm_dedup,
    llm_similarity,
    llm_multimodal,
    streaming_ops,
    udfs,
)

__all__ = ["QUERIES", "ORACLES", "register"]
