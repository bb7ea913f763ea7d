"""Push sources: websocket + webhook (reference:
sqlflow/sources/websocket.py, webhook.py).

Spark has no built-in websocket/HTTP-server source; the production
design is a tiny ingest shim that appends records to a spooling
directory (or kafka topic) which a FileSource/KafkaSource then streams
— that keeps exactly-once semantics with Spark checkpointing instead
of hand-rolled commit logic. ``spool_dir`` wires that up. The ingest
shims themselves are stdlib implementations (sources/shims.py): a
threaded ``http.server`` webhook receiver with HMAC validation and a
raw-socket RFC 6455 websocket client — no fastapi/websockets deps.

At scale the shim runs on the driver (or a sidecar), never in an
executor: ingestion concurrency comes from many shim instances
spooling to shared storage, and Spark's file-stream parallelism picks
the files up.
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
    e.g. the Bluesky firehose and yields every message). Here the
    stdlib RFC 6455 client (shims.WebsocketClient) streams messages
    into the spool; Spark tails the spool as a file stream."""

    def __init__(self, uri: str | None = None, batch_records: int = 1, **kw):
        super().__init__(**kw)
        self.uri = uri
        self.batch_records = batch_records
        self._client = None
        self._flush_pending = None

    def start_client(self):
        """Connect to ``uri`` on a daemon thread; every received
        message is appended to the spool (one jsonl file per
        ``batch_records`` messages). Messages still buffered when the
        stream ends — server close, error, or stop_client() — are
        flushed, never dropped."""
        import threading

        from sql_flow_spark.sources.shims import WebsocketClient

        if not self.uri:
            raise ValueError("WebsocketSource needs a uri to start a client")
        pending: list[str] = []
        # on_message runs on the client thread, flush also from
        # stop_client() on the caller thread
        lock = threading.Lock()

        def flush():
            with lock:
                batch, pending[:] = pending[:], []
            if batch:
                self.push(batch)

        def on_message(payload: bytes):
            with lock:
                pending.append(payload.decode("utf-8"))
                full = len(pending) >= self.batch_records
            if full:
                flush()

        self._flush_pending = flush
        self._client = WebsocketClient(self.uri, on_message, on_close=flush)
        self._client.start()
        return self._client

    def stop_client(self):
        if self._client:
            self._client.stop()
            self._client = None
        if self._flush_pending:
            # on_close already ran in the client thread's finally; this
            # is an idempotent belt-and-braces for a never-started loop
            self._flush_pending()
            self._flush_pending = None


class WebhookSource(SpoolingPushSource):
    """HTTP webhook receiver (reference: sources/webhook.py — FastAPI
    POST /events with ``sha256=<hex>`` HMAC validation). Served here by
    the stdlib shims.WebhookReceiver; the source itself owns the HMAC
    policy so any front end shares one validator."""

    def __init__(self, hmac_secret: str | None = None, hmac_header: str = "X-Signature", **kw):
        super().__init__(**kw)
        self.hmac_secret = hmac_secret
        self.hmac_header = hmac_header
        self._receiver = None

    def validate_hmac(self, body: bytes, signature: str) -> bool:
        """Accepts the reference's ``sha256=<hexdigest>`` format as well
        as a bare hexdigest (reference: sources/webhook.py:80-88)."""
        import hashlib
        import hmac as hmac_mod

        if not self.hmac_secret:
            return True
        digest = hmac_mod.new(self.hmac_secret.encode(), body, hashlib.sha256).hexdigest()
        provided = signature.removeprefix("sha256=")
        return hmac_mod.compare_digest(digest, provided)

    def start_server(self, host: str = "127.0.0.1", port: int = 0):
        """Start the in-process HTTP receiver; returns it (``.url`` has
        the bound address — port=0 picks an ephemeral port)."""
        from sql_flow_spark.sources.shims import WebhookReceiver

        self._receiver = WebhookReceiver(self, host=host, port=port).start()
        return self._receiver

    def stop_server(self):
        if self._receiver:
            self._receiver.stop()
            self._receiver = None
