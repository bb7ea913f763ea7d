"""Column-level function library (JVM-first).

Everything here is built from ``pyspark.sql.functions`` so it stays
inside whole-stage codegen; Python/Arrow paths exist only where Spark
built-ins cannot express the semantics (see multimodal.py).
"""

from sql_flow_spark.functions.curation import (
    connected_components,
    duplicate_edges,
    scrub_text,
)
from sql_flow_spark.functions.dedup import (
    cap_bucket_size,
    embedding_near_dup_pairs,
    exact_jaccard_pairs,
    minhash_candidate_pairs,
    with_shingles,
)
from sql_flow_spark.functions.similarity import embedding_dim

__all__ = [
    "cap_bucket_size",
    "connected_components",
    "duplicate_edges",
    "embedding_near_dup_pairs",
    "embedding_dim",
    "exact_jaccard_pairs",
    "minhash_candidate_pairs",
    "scrub_text",
    "with_shingles",
]
