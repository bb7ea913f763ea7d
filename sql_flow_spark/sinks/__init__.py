"""Output sinks (reference: sqlflow/sinks.py).

A sink consumes result DataFrames batch-by-batch. In streaming mode
sinks run inside foreachBatch; in batch mode they're called once.
write_table/flush mirrors the reference Sink ABC (sinks.py:21).
"""

from sql_flow_spark.sinks.core import (
    ConsoleSink,
    DLQSink,
    FileSink,
    KafkaSink,
    MemorySink,
    NoopSink,
    RecordingSink,
    Sink,
    SQLCommandSink,
    new_sink_from_conf,
)

__all__ = [
    "Sink",
    "ConsoleSink",
    "MemorySink",
    "NoopSink",
    "FileSink",
    "KafkaSink",
    "SQLCommandSink",
    "RecordingSink",
    "DLQSink",
    "new_sink_from_conf",
]
