"""Source ABC (reference: sqlflow/sources/base.py).

The reference's Source yields byte messages; on Spark a source yields
DataFrames — ``read`` for a one-shot batch, ``read_stream`` for a
Structured Streaming DataFrame. Offset tracking/commit is the engine's
job (checkpointLocation), not the source's.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession


class Source(ABC):
    @abstractmethod
    def read(self, spark: SparkSession) -> DataFrame:
        """One-shot batch read (dev invoke / backfill)."""

    @abstractmethod
    def read_stream(self, spark: SparkSession) -> DataFrame:
        """Streaming read (readStream)."""


class SourceException(Exception):
    pass
