"""Small driver-side DataFrames without the Python-RDD scan.

``spark.createDataFrame(list_of_tuples)`` parallelizes the rows into
``defaultParallelism`` pickled partitions: on local[32] every tiny
centroid/merge/stage table costs a 32-task job whose tasks each spin a
Python worker just to unpickle a handful of rows (measured ~0.5 s per
call steady-state, ~38 s of summed task time cold — r13 optimization
round). Routing the same rows through a pandas DataFrame takes the
Arrow fast path instead: batches are built driver-side and
deserialized by the JVM, no per-task Python workers (measured ~0.13 s
for the same table, 4x faster; scripts/profile_key.py evidence in
OPTIMIZATION_r13.md). An explicit-literal plan (explode over an array
of struct literals) was also measured and rejected: the optimizer
spends SECONDS on the literal tree (13-44 s for 1024 rows).

Use for bounded driver-side state only (centroids, merge tables,
stage labels) — anything data-sized must stay distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Arrow-path createDataFrame for small driver-side row lists.

    ``rows``: list of tuples (column order must match ``schema``).
    Falls back to the plain path when pandas is unavailable, the rows
    are empty (the Arrow path needs at least the dtypes), or any cell
    is None — pandas coerces None in numeric columns to NaN, which is
    NOT SQL NULL for doubles, so null-bearing frames keep the tuple
    path's NULL semantics (ADVICE r13). Column names are parsed with
    StructType.fromDDL, so nested types (``array<double>``) and
    parenthesized types (``decimal(10,2)``) route correctly (ADVICE
    r13)."""
    try:
        import pandas as pd
    except ImportError:  # pragma: no cover - pandas ships with pyspark
        return spark.createDataFrame(rows, schema)
    rows = list(rows)
    if not rows or any(v is None for r in rows for v in r):
        return spark.createDataFrame(rows, schema)
    from pyspark.sql.types import StructType

    names = [f.name for f in StructType.fromDDL(schema).fields]
    pdf = pd.DataFrame.from_records(rows, columns=names)
    return spark.createDataFrame(pdf, schema)
