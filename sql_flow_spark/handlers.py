"""Handlers: run the pipeline's SQL against one micro-batch.

Reference semantics (sqlflow/handlers.py): a batch of messages becomes
a table named ``batch``; the handler SQL runs once per batch; the
result goes to the sink. Our batch is a DataFrame (from a streaming
micro-batch or a file read) registered as a temp view — the SQL runs
through Catalyst, so the per-batch plan gets pushdown/codegen like any
other query.

- InferredBatch == reference InferredMemBatch/InferredDiskBatch merged:
  schema is inferred from the data. Spark has no mem/disk handler split
  — spill behavior is the engine's job (that distinction exists in the
  reference only because DuckDB buffers the batch itself).
- StructuredBatch == reference StructuredBatch: the batch is inserted
  into a known table (schema enforced), then the SQL runs against that
  table's accumulated state.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_flow_spark import config


class Handler(ABC):
    @abstractmethod
    def invoke(self, spark: SparkSession, batch_df: DataFrame) -> Optional[DataFrame]:
        """Run the handler SQL over one micro-batch."""


class InferredBatch(Handler):
    """SQL over the inferred-schema batch view (reference:
    handlers.py:88 InferredMemBatch / :31 InferredDiskBatch)."""

    def __init__(self, sql: str):
        self.sql = sql

    def invoke(self, spark: SparkSession, batch_df: DataFrame) -> Optional[DataFrame]:
        # Inside foreachBatch the micro-batch belongs to a cloned
        # streaming session; register and query THERE or the SQL reads
        # a stale `batch` view on the outer session.
        session = batch_df.sparkSession
        batch_df.createOrReplaceTempView("batch")
        return session.sql(self.sql)


class StructuredBatch(Handler):
    """Insert the batch into a known table, then run the SQL against
    the table (reference: handlers.py:136). The target is a spark
    temp view backed by accumulated micro-batches; at scale this is a
    Delta/Iceberg MERGE target instead."""

    # Truncate the union lineage every N batches: an unbounded
    # union-chain makes planning cost grow per batch (at scale the
    # target would be a Delta/Iceberg table and this is a MERGE).
    CHECKPOINT_EVERY = 16

    def __init__(self, sql: str, table: str):
        self.sql = sql
        self.table = table
        self._accumulated: Optional[DataFrame] = None
        self._batches_since_ckpt = 0

    def invoke(self, spark: SparkSession, batch_df: DataFrame) -> Optional[DataFrame]:
        session = batch_df.sparkSession
        target_schema = session.table(self.table).schema
        aligned = batch_df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in target_schema.fields]
        )
        if self._accumulated is None:
            self._accumulated = session.table(self.table).union(aligned)
        else:
            self._accumulated = self._accumulated.union(aligned)
        self._batches_since_ckpt += 1
        if self._batches_since_ckpt >= self.CHECKPOINT_EVERY:
            self._accumulated = self._accumulated.localCheckpoint(eager=True)
            self._batches_since_ckpt = 0
        self._accumulated.createOrReplaceTempView(self.table)
        return session.sql(self.sql)


def new_handler_from_conf(handler_conf: config.HandlerConf) -> Handler:
    typ = handler_conf.type
    if typ in ("handlers.InferredBatch", "handlers.InferredMemBatch",
               "handlers.InferredDiskBatch"):
        return InferredBatch(sql=handler_conf.sql)
    if typ == "handlers.StructuredBatch":
        assert handler_conf.table, "StructuredBatch requires a table name"
        return StructuredBatch(sql=handler_conf.sql, table=handler_conf.table)
    raise NotImplementedError(f"Unsupported handler type: {typ}")
