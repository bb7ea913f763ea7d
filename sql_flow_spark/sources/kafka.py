"""Kafka source (reference: sqlflow/sources/kafka.py + kafka configs in
dev/config/examples/*.yml).

Maps consumer-group config onto Spark's native kafka connector
(spark-sql-kafka). The connector jar is not bundled in this container,
so construction works (config building is tested) but the actual
read raises a clear error unless the package is on the classpath —
cluster deployments add
``org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``.

SSL/SASL options follow the reference's KafkaSSLConfig/KafkaSASLConfig
(reference: sqlflow/config.py:14,23) via ``options`` passthrough with
the ``kafka.`` prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_flow_spark.sources.base import Source


class KafkaSource(Source):
    def __init__(
        self,
        brokers: list[str],
        topics: list[str],
        group_id: str | None = None,
        auto_offset_reset: str = "earliest",
        options: dict | None = None,
    ):
        self.brokers = brokers
        self.topics = topics
        self.group_id = group_id
        self.auto_offset_reset = auto_offset_reset
        self.options = options or {}

    def reader_options(self) -> dict:
        opts = {
            "kafka.bootstrap.servers": ",".join(self.brokers),
            "subscribe": ",".join(self.topics),
            "startingOffsets": (
                "earliest" if self.auto_offset_reset == "earliest" else "latest"
            ),
        }
        if self.group_id:
            opts["kafka.group.id"] = self.group_id
        for k, v in self.options.items():
            opts[k if k.startswith("kafka.") else f"kafka.{k}"] = v
        return opts

    def _apply(self, reader):
        reader = reader.format("kafka")
        for k, v in self.reader_options().items():
            reader = reader.option(k, v)
        return reader

    @staticmethod
    def decode(df: DataFrame) -> DataFrame:
        """kafka wire schema -> the reference's message surface: the
        JSON payload string plus kafka_{offset,partition,topic} columns
        (reference: handlers.py:104 attaches these)."""
        return df.select(
            F.col("value").cast("string").alias("value"),
            F.col("offset").alias("kafka_offset"),
            F.col("partition").alias("kafka_partition"),
            F.col("topic").alias("kafka_topic"),
        )

    @staticmethod
    def _load(reader):
        """Translate the connector-jar-missing failure into an
        actionable error instead of Spark's generic
        DATA_SOURCE_NOT_FOUND (the jar is deliberately not bundled;
        clusters ship it via --packages)."""
        from sql_flow_spark.sources.base import SourceException

        try:
            return reader.load()
        except Exception as e:
            if "kafka" in str(e).lower() and (
                "DATA_SOURCE_NOT_FOUND" in str(e) or "Failed to find" in str(e)
            ):
                raise SourceException(
                    "the kafka connector jar is not on the classpath; launch "
                    "with --packages org.apache.spark:spark-sql-kafka-0-10_2.13:"
                    "<spark-version> (see SCALING.md kafka probe)"
                ) from e
            raise

    def read(self, spark: SparkSession) -> DataFrame:
        return self.decode(self._load(self._apply(spark.read)))

    def read_stream(self, spark: SparkSession) -> DataFrame:
        return self.decode(self._load(self._apply(spark.readStream)))
