"""External-table sources for enrichment joins.

The reference ATTACHes live databases and joins the stream against
them in handler SQL (reference: dev/config/examples/
kafka.postgres.join.yml — ATTACH postgres, LEFT JOIN pgusersdb.users;
attach-geoip.yml — sqlite/httpfs ATTACH). The Spark-native equivalent
is a JDBC (or file-format) DataFrame registered as a temp view, which
handler SQL then joins; in streaming mode that is a stream-static
join, re-resolved per micro-batch so slowly-changing reference data
stays fresh without restarts.

Scale notes:
- A JDBC read is a SINGLE partition unless partitioning options are
  set. For big external tables pass ``partitionColumn`` +
  ``lowerBound``/``upperBound``/``numPartitions`` (or ``predicates``)
  so executors read ranges in parallel.
- Enrichment dims are usually small: the stream-static join planner
  broadcasts them under the AQE threshold, keeping the fact pipeline
  shuffle-free. For big dims, cache() the view after registration so
  every micro-batch doesn't re-pull the database.
- Pushdown: Catalyst pushes filters/column pruning into the JDBC
  query (SELECT cols WHERE ... at the database), so a view join
  doesn't fetch the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql_flow_spark.sources.base import Source, SourceException


class JdbcSource(Source):
    """Batch source over a JDBC table/query (``type: jdbc``).

    ``options`` passes through to the Spark JDBC reader: ``url``,
    ``dbtable`` or ``query``, ``driver``, ``user``/``password``,
    ``partitionColumn``/``lowerBound``/``upperBound``/``numPartitions``,
    ``fetchsize``… JDBC has no offset log, so there is no native
    streaming read; for change streams use kafka/CDC, and for
    enrichment register the table as a view (register_external_tables)
    and let stream-static joins re-read it per micro-batch.
    """

    def __init__(self, options: dict | None = None):
        self.options = dict(options or {})
        if "url" not in self.options:
            raise SourceException("jdbc source requires an 'url' option")
        if "dbtable" not in self.options and "query" not in self.options:
            raise SourceException("jdbc source requires 'dbtable' or 'query'")

    def reader_options(self) -> dict:
        return dict(self.options)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.format("jdbc").options(**self.reader_options()).load()

    def read_stream(self, spark: SparkSession) -> DataFrame:
        raise SourceException(
            "jdbc has no offset log to stream from; use it as an external "
            "table (external_tables:) joined against a streaming source, "
            "or front changes with kafka/CDC"
        )


def register_external_tables(spark: SparkSession, tables) -> dict[str, DataFrame]:
    """Register each ExternalTableConf as a temp view for handler SQL /
    commands to join against (the reference's ATTACH + alias step).

    ``format: jdbc`` reads through JdbcSource; file formats (csv,
    parquet, json, orc) read ``path`` with ``options`` passed through
    (header, inferSchema, …). Returns the registered DataFrames by
    view name.
    """
    out: dict[str, DataFrame] = {}
    for t in tables:
        if t.format == "jdbc":
            df = JdbcSource(t.options).read(spark)
        else:
            reader = spark.read.format(t.format).options(**t.options)
            if t.schema:
                reader = reader.schema(t.schema)
            if not t.path:
                raise SourceException(f"external table {t.name}: file format needs a path")
            df = reader.load(t.path)
        if t.cache:
            df = df.cache()
        df.createOrReplaceTempView(t.name)
        out[t.name] = df
    return out
