"""Output sinks (reference: sqlflow/sinks.py).

A sink consumes result DataFrames batch-by-batch. In streaming mode
sinks run inside foreachBatch; in batch mode they're called once.
write_table/flush mirrors the reference Sink ABC (sinks.py:21).
"""

from sql_flow_spark.sinks.core import (
    ClickHouseSink,
    ConsoleSink,
    DLQSink,
    FileSink,
    IcebergSink,
    JDBCSink,
    KafkaSink,
    MemorySink,
    NoopSink,
    RecordingSink,
    Sink,
    SinkException,
    SQLCommandSink,
    UpsertSink,
    new_sink_from_conf,
)

__all__ = [
    "Sink",
    "SinkException",
    "ClickHouseSink",
    "IcebergSink",
    "JDBCSink",
    "ConsoleSink",
    "MemorySink",
    "NoopSink",
    "FileSink",
    "KafkaSink",
    "SQLCommandSink",
    "RecordingSink",
    "UpsertSink",
    "DLQSink",
    "new_sink_from_conf",
]
