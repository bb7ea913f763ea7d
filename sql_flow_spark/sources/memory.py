"""In-memory source for tests and dev-invoke: a list of raw records
(JSON strings) becomes the batch (reference: tests feed fixture lines
into handler.write — sqlflow/tests/handlers/*)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql_flow_spark.serde import JSONSerde, Serde
from sql_flow_spark.sources.base import Source


class MemorySource(Source):
    def __init__(self, records: list[str] | None = None, serde: Serde | None = None):
        self.records: list[str] = list(records or [])
        self.serde = serde or JSONSerde()

    def write(self, record: str):
        self.records.append(record)

    def read(self, spark: SparkSession) -> DataFrame:
        return self.serde.to_dataframe(spark, self.records)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError(
            "memory source is batch-only; use a files/rate source for streams"
        )
