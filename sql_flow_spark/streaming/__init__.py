"""Structured Streaming operators: windowed aggregation (the
reference's managed tumbling-window tables), stream dedup, custom
stateful processing."""

from sql_flow_spark.streaming.window import (
    TumblingWindow,
    session_aggregate,
    sliding_aggregate,
    tumbling_aggregate,
)
from sql_flow_spark.streaming.dedupe import dedupe_stream
from sql_flow_spark.streaming.state import (
    running_aggregate,
    running_aggregate_ttl,
    running_aggregate_ttl_tws,
    tws_available,
)

__all__ = [
    "TumblingWindow",
    "tumbling_aggregate",
    "sliding_aggregate",
    "session_aggregate",
    "dedupe_stream",
    "running_aggregate",
    "running_aggregate_ttl",
]
