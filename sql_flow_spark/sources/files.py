"""File source: batch or file-stream over a directory (json/csv/
parquet).

This is both the dev-invoke fixture reader (reference: cmd/sql-flow.py
``dev invoke <config> <fixture>``) and the standing file-watch stream.
``max_files_per_trigger`` is the micro-batch knob — the Spark
equivalent of the reference's ``batch_size`` (messages per batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql_flow_spark.sources.base import Source


class FileSource(Source):
    def __init__(
        self,
        path: str,
        format: str = "json",
        schema: str | None = None,
        max_files_per_trigger: int | None = None,
        options: dict | None = None,
    ):
        assert path, "files source requires a path"
        self.path = path
        self.format = format
        self.schema = schema
        self.max_files_per_trigger = max_files_per_trigger
        self.options = options or {}

    def _reader(self, spark: SparkSession, streaming: bool):
        r = spark.readStream if streaming else spark.read
        r = r.format(self.format)
        for k, v in self.options.items():
            r = r.option(k, v)
        if self.format == "csv" and "header" not in self.options:
            r = r.option("header", True)
        if self.schema:
            r = r.schema(self.schema)
        elif streaming:
            # Streaming needs a schema up front; infer it from the
            # existing files once (driver-side, one footer/sample pass).
            static = FileSource(self.path, self.format, None, None, self.options)
            r = r.schema(static.read(spark).schema)
        return r

    def read(self, spark: SparkSession) -> DataFrame:
        r = self._reader(spark, streaming=False)
        if self.format == "csv":
            return r.option("inferSchema", True).load(self.path)
        return r.load(self.path)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        r = self._reader(spark, streaming=True)
        if self.max_files_per_trigger:
            r = r.option("maxFilesPerTrigger", self.max_files_per_trigger)
        return r.load(self.path)
