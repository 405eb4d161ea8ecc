"""e2e_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL pipeline (``shyambh/e2e-data-pipeline``,
``/root/reference/ingest_data.py``) plus an extended analytics surface:
relational operators (joins, aggregates, windows, set ops), scalar
function families, LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns), and Structured-Streaming
operators with batch parity.

Everything is declared through the DataFrame/SQL API so Catalyst plans
the physical execution (predicate pushdown, column pruning, broadcast
vs shuffle joins, whole-stage codegen, AQE) — no RDDs, no driver-side
row loops.
"""

from e2e_data_pipeline_spark.session import get_spark
from e2e_data_pipeline_spark.catalog import load_table, register_views

__all__ = ["get_spark", "load_table", "register_views"]
