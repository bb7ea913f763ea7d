"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship query; queries()/oracle_sql() expose the
operator inventory from SURVEY.md §2 (registered in
sql_flow_spark.operators / sql_flow_spark.functions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sql_flow_spark.operators import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key; keys absent here are
    non-SQL-expressible (hash-specific / approximate) and get the
    driver's rows-only check."""
    return dict(ORACLES)
