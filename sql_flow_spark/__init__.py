"""sql_flow_spark — a PySpark-native analytics/stream-processing engine
with the query and data-processing capabilities of turbolytics/sql-flow
(reference surveyed in SURVEY.md), re-architected for Spark:

- batch + Structured Streaming pipelines declared in YAML
  (source -> SQL handler -> sink), mirroring the reference's
  pipeline model (reference: sqlflow/pipeline.py, sqlflow/config.py)
- an operator library (sql_flow_spark.operators) covering the
  reference's example-query surface plus TPC-H-style analytics
- LLM-training-data operators (sql_flow_spark.functions): dedup,
  similarity search, text analysis, multimodal column plumbing

Everything is expressed with the DataFrame/SQL API so Catalyst and
Tungsten choose physical plans; Python executes only where Spark
built-ins cannot express the semantics (Arrow-batched, never per-row
in hot paths).
"""

from sql_flow_spark.session import get_spark, DEFAULT_CONFS
from sql_flow_spark.tables import load_tables, TABLE_NAMES

__all__ = ["get_spark", "DEFAULT_CONFS", "load_tables", "TABLE_NAMES"]

__version__ = "0.1.0"
