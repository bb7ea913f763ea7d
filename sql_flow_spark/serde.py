"""Message (de)serialization between raw byte/string records and
DataFrames (reference: sqlflow/serde.py — JSON in / JSON out).

On Spark the decode happens engine-side: a batch of raw JSON strings
becomes a DataFrame via schema inference (schema_of_json on a sample +
from_json), never a per-row Python loop.
"""

from __future__ import annotations

import json
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Serde(ABC):
    """Turns raw string records into a DataFrame and rows back out."""

    @abstractmethod
    def to_dataframe(self, spark: SparkSession, records: list[str]) -> DataFrame: ...

    @abstractmethod
    def encode_rows(self, df: DataFrame) -> list[str]: ...


class JSONSerde(Serde):
    """JSON lines <-> DataFrame with inferred schema (parity with the
    reference's InferredMemBatch deserializer, sqlflow/handlers.py:88)."""

    def to_dataframe(self, spark: SparkSession, records: list[str]) -> DataFrame:
        # spark.read.json over an RDD of strings infers the schema
        # engine-side across the batch (objects with differing keys
        # unify, like DuckDB's read_json_auto).
        return spark.read.json(spark.sparkContext.parallelize(records))

    def encode_rows(self, df: DataFrame) -> list[str]:
        return [r for (r,) in df.select(F.to_json(F.struct(*df.columns))).collect()]


class RawSerde(Serde):
    """Each record is a single `value` string column (for opaque
    payloads, reference Noop serde)."""

    def to_dataframe(self, spark: SparkSession, records: list[str]) -> DataFrame:
        return spark.createDataFrame([(r,) for r in records], "value string")

    def encode_rows(self, df: DataFrame) -> list[str]:
        return [json.dumps(r.asDict(recursive=True), default=str) for r in df.collect()]


def new_serde(kind: str) -> Serde:
    if kind == "json":
        return JSONSerde()
    if kind == "raw":
        return RawSerde()
    raise NotImplementedError(f"unsupported serde: {kind}")
