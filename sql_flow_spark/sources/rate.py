"""Rate source: Spark's built-in synthetic stream (timestamp, value) —
the stand-in for live push sources in tests/benchmarks."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql_flow_spark.sources.base import Source


class RateSource(Source):
    def __init__(self, rows_per_second: int = 100):
        self.rows_per_second = rows_per_second

    def read(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError("rate source is streaming-only")

    def read_stream(self, spark: SparkSession) -> DataFrame:
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", self.rows_per_second)
            .load()
        )
