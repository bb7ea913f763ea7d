"""Push sources: websocket + webhook (reference:
sqlflow/sources/websocket.py, webhook.py).

Spark has no built-in websocket/HTTP-server source; the production
design is a tiny ingest shim that appends records to a spooling
directory (or kafka topic) which a FileSource/KafkaSource then streams
— that keeps exactly-once semantics with Spark checkpointing instead
of hand-rolled commit logic. ``spool_dir`` wires that up; the
in-process server itself is STUBBED here (no fastapi/websockets libs
in this container, and a long-running server doesn't belong inside an
executor).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from sql_flow_spark.sources.base import Source
from sql_flow_spark.sources.files import FileSource


class SpoolingPushSource(Source):
    """Base: external pushes land as jsonl files in spool_dir; Spark
    streams the directory. ``push()`` is what the ingest shim calls."""

    def __init__(self, spool_dir: str | None = None, schema: str | None = None):
        self.spool_dir = spool_dir or os.path.join("/tmp", f"sfs-spool-{uuid.uuid4().hex[:8]}")
        os.makedirs(self.spool_dir, exist_ok=True)
        self._file_source = FileSource(self.spool_dir, format="json", schema=schema)

    def push(self, records: list[dict | str]):
        path = os.path.join(self.spool_dir, f"{uuid.uuid4().hex}.jsonl")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            for r in records:
                f.write(r if isinstance(r, str) else json.dumps(r))
                f.write("\n")
        os.rename(tmp, path)  # atomic so the stream never sees partials

    def read(self, spark: SparkSession) -> DataFrame:
        return self._file_source.read(spark)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        return self._file_source.read_stream(spark)


class WebsocketSource(SpoolingPushSource):
    """Websocket consumer (reference: sources/websocket.py connects to
    e.g. the Bluesky firehose). The socket client itself is stubbed."""

    def __init__(self, uri: str | None = None, **kw):
        super().__init__(**kw)
        self.uri = uri

    def start_client(self):
        raise NotImplementedError(
            "websocket client is stubbed in this environment; run an external "
            "consumer that calls .push() / writes jsonl into spool_dir"
        )


class WebhookSource(SpoolingPushSource):
    """HTTP webhook receiver (reference: sources/webhook.py with HMAC
    validation). The HTTP server is stubbed; HMAC validation logic
    lives in validate_hmac for the external shim to use."""

    def __init__(self, hmac_secret: str | None = None, hmac_header: str = "X-Signature", **kw):
        super().__init__(**kw)
        self.hmac_secret = hmac_secret
        self.hmac_header = hmac_header

    def validate_hmac(self, body: bytes, signature: str) -> bool:
        import hashlib
        import hmac as hmac_mod

        if not self.hmac_secret:
            return True
        digest = hmac_mod.new(self.hmac_secret.encode(), body, hashlib.sha256).hexdigest()
        return hmac_mod.compare_digest(digest, signature)

    def start_server(self):
        raise NotImplementedError(
            "webhook HTTP server is stubbed in this environment; front with any "
            "HTTP receiver that calls .push() after validate_hmac"
        )
