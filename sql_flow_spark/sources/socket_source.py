"""TCP socket source — Spark's built-in live-network streaming reader.

Why it exists here: the reference's primary live source is Kafka
(reference: sqlflow/sources/kafka.py:12), whose connector jar is
cluster-side and absent from this container (SCALING.md connector-jar
probe, three failed network attempts). The socket source is the one
built-in source that exercises the SAME engine path a Kafka reader
uses — a network-connected continuous source feeding micro-batches
through readStream → handler SQL → sink with offsets tracked by the
checkpoint — with zero external jars, so the live-stream leg of the
pipeline machinery is e2e-tested in-sandbox (test_sources_sinks.py
runs it against a loopback server).

Not a production source (Spark's socket provider keeps no replayable
offsets — at-most-once on failure; it exists for testing). Production
live ingestion is KafkaSource; this class is the sandbox-runnable
stand-in sharing its plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql_flow_spark.sources.base import Source


class SocketSource(Source):
    """``readStream.format("socket")`` — lines from host:port as a
    streaming ``value: string`` column (parse with from_json in the
    handler SQL, exactly as a Kafka value column would be)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 9999):
        self.host = host
        self.port = port

    def read(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError("socket source is streaming-only")

    def read_stream(self, spark: SparkSession) -> DataFrame:
        return (
            spark.readStream.format("socket")
            .option("host", self.host)
            .option("port", self.port)
            .load()
        )
