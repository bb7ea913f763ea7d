"""Input sources (reference: sqlflow/sources/).

A source produces either a batch DataFrame (dev-invoke over a fixture)
or a streaming DataFrame (Structured Streaming). Kafka maps to Spark's
native kafka connector; websocket/webhook are spool-dir push sources
fronted by stdlib shims (an http.server webhook receiver and a raw
RFC 6455 websocket client — sources/shims.py).
"""

from sql_flow_spark.sources.base import Source
from sql_flow_spark.sources.external import JdbcSource, register_external_tables
from sql_flow_spark.sources.files import FileSource
from sql_flow_spark.sources.kafka import KafkaSource
from sql_flow_spark.sources.memory import MemorySource
from sql_flow_spark.sources.rate import RateSource
from sql_flow_spark.sources.socket_source import SocketSource
from sql_flow_spark.sources.pyds import JsonlSpoolSource
from sql_flow_spark.sources.push import WebhookSource, WebsocketSource


def new_source_from_conf(conf) -> Source:
    typ = conf.type
    if typ == "files":
        return FileSource(
            path=conf.path,
            format=conf.format,
            schema=conf.schema,
            max_files_per_trigger=conf.max_files_per_trigger,
            options=conf.options,
        )
    if typ == "kafka":
        return KafkaSource(
            brokers=conf.brokers,
            topics=conf.topics,
            group_id=conf.group_id,
            auto_offset_reset=conf.auto_offset_reset,
            options=conf.options,
        )
    if typ == "jdbc":
        return JdbcSource(options=conf.options)
    if typ == "memory":
        return MemorySource()
    if typ == "rate":
        return RateSource(rows_per_second=conf.rows_per_second)
    if typ == "jsonl_spool":
        return JsonlSpoolSource(conf.path or conf.options.get("path"))
    if typ == "socket":
        return SocketSource(
            host=conf.options.get("host", "127.0.0.1"),
            port=int(conf.options.get("port", 9999)),
        )
    if typ == "websocket":
        return WebsocketSource(
            conf.uri or conf.options.get("uri"),
            spool_dir=conf.options.get("spool_dir"),
            schema=conf.schema,
        )
    if typ == "webhook":
        return WebhookSource(
            hmac_secret=conf.options.get("hmac_secret"),
            hmac_header=conf.options.get("hmac_header", "X-Signature"),
            spool_dir=conf.options.get("spool_dir"),
            schema=conf.schema,
        )
    raise NotImplementedError(f"unsupported source type: {typ}")


__all__ = [
    "Source",
    "FileSource",
    "JdbcSource",
    "KafkaSource",
    "MemorySource",
    "RateSource",
    "SocketSource",
    "JsonlSpoolSource",
    "WebsocketSource",
    "WebhookSource",
    "new_source_from_conf",
    "register_external_tables",
]
