"""Column-level function library (JVM-first).

Everything here is built from ``pyspark.sql.functions`` so it stays
inside whole-stage codegen; Python/Arrow paths exist only where Spark
built-ins cannot express the semantics (see multimodal.py).
"""

from sql_flow_spark.functions.dedup import (
    cap_bucket_size,
    embedding_near_dup_pairs,
)
from sql_flow_spark.functions.similarity import embedding_dim

__all__ = ["cap_bucket_size", "embedding_near_dup_pairs", "embedding_dim"]
