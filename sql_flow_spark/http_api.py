"""Debug HTTP API: live SQL against the running pipeline's session.

The reference exposes a Flask view that runs an arbitrary SQL string
against the pipeline's DuckDB connection under a lock and returns the
rows as JSON, 400 when no query is given, 500 on execution errors
(reference: sqlflow/http.py:5 DebugAPI, mounted by cmd/sql-flow.py
``--with-http-debug``). The Spark-native equivalent serves
``GET /sql?q=<query>`` against the pipeline's SparkSession — the same
session the handler runs in, so temp views, managed tables, external
tables and memory sinks are all visible.

No Flask in this container; the server reuses the stdlib
ThreadingHTTPServer pattern already proven by the webhook receiver
(sources/shims.py). SparkSession is thread-safe for concurrent
``sql()`` calls (each request is just another job), so no lock is
needed where the reference serializes on a DuckDB connection.

Scale notes: results are truncated to ``max_rows`` (default 1000)
*inside the plan* via ``df.limit`` — the driver never collects an
unbounded result, and Catalyst pushes the limit into the scan where
possible. This is a debug surface: bind it to localhost (default) and
put real consumers on a sink, not this endpoint.

Hardening (this endpoint runs SQL in-session): binding a non-loopback
host without ``allow_remote=True`` raises at construction — an
unauthenticated remote SQL endpoint must be an explicit decision, not
a YAML typo. By default only read statements (SELECT/WITH/VALUES/
SHOW/DESCRIBE/EXPLAIN/TABLE) are accepted; anything else (DROP,
INSERT, SET, ...) is refused with 403 unless ``read_only=False``.
"""

from __future__ import annotations

import json
import logging
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

logger = logging.getLogger(__name__)

# Leading keywords of statements a read-only debug endpoint may run.
# The check strips SQL comments first so `/* x */ DROP ...` can't
# smuggle past the prefix test.
_READ_KEYWORDS = frozenset(
    {"SELECT", "WITH", "VALUES", "SHOW", "DESCRIBE", "DESC", "EXPLAIN", "TABLE"}
)
# Keywords that parse to query-shaped plans — these additionally get the
# parsed-plan DML check, because Spark's grammar accepts a CTE prologue
# before DML (`WITH t AS (...) INSERT INTO tgt SELECT * FROM t`).
_QUERY_KEYWORDS = frozenset({"SELECT", "WITH", "VALUES", "TABLE"})
_COMMENT_RE = re.compile(r"(--[^\n]*\n?)|(/\*.*?\*/)", flags=re.DOTALL)
# String literals ('..' with '' escapes, ".." likewise) and backticked
# identifiers — stripped before the semicolon / DML-keyword scans so a
# `split(col, ';')` constant or a column named `update` can't trip them.
_LITERAL_RE = re.compile(r"'(?:''|[^'])*'|\"(?:\"\"|[^\"])*\"|`(?:``|[^`])*`")
# Catalyst node names of DML statements that can hide beneath an
# UnresolvedWith root (the CTE-before-DML grammar).
_DML_NODE_RE = re.compile(
    r"\b(InsertInto\w*|UpdateTable|DeleteFromTable|MergeInto\w*)\b"
)
_DML_WORD_RE = re.compile(r"\b(INSERT|UPDATE|DELETE|MERGE)\b", re.IGNORECASE)


def _canonical(sql: str) -> str:
    """Comment- and literal-stripped text: only structure remains."""
    return _LITERAL_RE.sub("''", _COMMENT_RE.sub(" ", sql))


def _is_read_statement(sql: str, spark: Optional[SparkSession] = None) -> bool:
    canon = _canonical(sql).strip()
    first = canon.split(None, 1)[0].upper() if canon else ""
    # a single statement only: a trailing `; DROP ...` is not a read
    # (literals are already stripped, so `split(c, ';')` passes)
    if ";" in canon.rstrip().rstrip(";"):
        return False
    if first not in _READ_KEYWORDS:
        return False
    if first in _QUERY_KEYWORDS:
        return _query_plan_is_read(sql, canon, spark)
    return True


def _query_plan_is_read(
    sql: str, canon: str, spark: Optional[SparkSession]
) -> bool:
    """Reject query-keyword statements whose parsed plan is DML/command
    shaped (the WITH-CTE-before-INSERT bypass). Classifies by the
    Catalyst parser when the JVM gateway is reachable; otherwise falls
    back to a conservative textual scan of the comment/literal-stripped
    statement for top-level DML keywords."""
    if spark is not None:
        try:
            jspark = getattr(spark, "_jsparkSession", None)
            jvm = getattr(spark, "_jvm", None)
            if jspark is not None and jvm is not None:
                plan = jspark.sessionState().sqlParser().parsePlan(sql)
                command_cls = jvm.java.lang.Class.forName(
                    "org.apache.spark.sql.catalyst.plans.logical.Command"
                )
                if command_cls.isInstance(plan):
                    return False
                # DML under a CTE root only shows up in the tree, not
                # the root class (WITH..INSERT -> UnresolvedWith).
                return not _DML_NODE_RE.search(plan.treeString())
        except Exception as e:  # unparseable or no gateway (connect)
            # A statement Spark can't parse can't execute either; only
            # fall through to the textual scan on gateway trouble.
            if type(e).__name__ == "ParseException" or "ParseException" in str(
                type(e)
            ):
                return True
            logger.debug("debug-api: parser classification failed: %s", e)
    return not _DML_WORD_RE.search(canon)


def _is_loopback(host: str) -> bool:
    import ipaddress
    import socket

    if host == "":
        # empty host means bind ALL interfaces (INADDR_ANY) — the
        # opposite of loopback
        return False
    if host == "localhost":
        return True
    try:
        return ipaddress.ip_address(host).is_loopback
    except ValueError:
        try:
            return ipaddress.ip_address(socket.gethostbyname(host)).is_loopback
        except OSError:
            return False


def _prom_escape(value: str) -> str:
    return value.replace("\\", r"\\").replace('"', r"\"").replace("\n", r"\n")


def render_prometheus(metrics) -> str:
    """MetricsListener.summary() -> Prometheus text exposition format.

    Metric names mirror the reference's OTel instruments
    (sqlflow/pipeline.py message_count / batch_processing_latency,
    exported by cmd/sql-flow.py's start_http_server): per-streaming-
    query input-row and batch counters plus the latest rate and mean
    micro-batch latency, labeled by query name and id."""
    if metrics is None:
        return (
            "# no metrics listener attached — construct DebugHTTPServer "
            "with metrics=attach_metrics(spark)\n"
        )
    lines = [
        "# HELP sqlflow_input_rows_total Rows ingested per streaming query.",
        "# TYPE sqlflow_input_rows_total counter",
        "# HELP sqlflow_batches_total Micro-batches completed per streaming query.",
        "# TYPE sqlflow_batches_total counter",
        "# HELP sqlflow_rows_per_sec Latest processed-rows-per-second.",
        "# TYPE sqlflow_rows_per_sec gauge",
        "# HELP sqlflow_batch_ms_avg Mean micro-batch trigger latency (ms).",
        "# TYPE sqlflow_batch_ms_avg gauge",
    ]
    for qid, m in sorted(metrics.summary().items()):
        label = f'{{query="{_prom_escape(m["query_name"])}",id="{_prom_escape(qid)}"}}'
        lines.append(f"sqlflow_input_rows_total{label} {m['num_input_rows']}")
        lines.append(f"sqlflow_batches_total{label} {m['num_batches']}")
        lines.append(f"sqlflow_rows_per_sec{label} {m['last_rows_per_sec']}")
        lines.append(f"sqlflow_batch_ms_avg{label} {m['avg_batch_ms']}")
    return "\n".join(lines) + "\n"


class DebugHTTPServer:
    """``GET /sql?q=<query>`` -> JSON rows from ``spark.sql(query)``.

    Contract (mirrors reference sqlflow/http.py dispatch_request):
    missing query -> 400 ``{"error": "No SQL query provided"}``;
    execution error -> 500 ``{"error": "<message>"}``; success -> 200
    with a JSON array of row objects (keyed by column name — richer
    than the reference's positional lists, same information).
    ``?sql=`` is accepted as an alias for ``?q=``.

    ``GET /metrics`` serves the attached MetricsListener's counters in
    Prometheus text exposition format (reference: cmd/sql-flow.py:53
    ``start_http_server`` + the OTel counters in sqlflow/pipeline.py —
    here the engine's own StreamingQueryListener numbers, no client
    library needed). Pass ``metrics=attach_metrics(spark)`` to enable;
    without a listener the endpoint serves an explanatory comment.
    """

    def __init__(
        self,
        spark: SparkSession,
        host: str = "127.0.0.1",
        port: int = 0,
        max_rows: int = 1000,
        allow_remote: bool = False,
        read_only: bool = True,
        metrics=None,
    ):
        if not _is_loopback(host) and not allow_remote:
            raise ValueError(
                f"debug api: refusing to bind non-loopback host {host!r} "
                "without allow_remote=True — this endpoint runs "
                "unauthenticated SQL in the pipeline's session"
            )
        self.spark = spark
        self.max_rows = max_rows
        self.read_only = read_only
        self.metrics = metrics
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet test output
                logger.debug("debug-api: " + fmt, *args)

            def _reply(self, code: int, payload):
                body = json.dumps(payload, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _reply_text(self, code: int, text: str, ctype: str):
                body = text.encode()
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                if u.path.rstrip("/") == "/metrics":
                    self._reply_text(
                        200,
                        render_prometheus(server.metrics),
                        "text/plain; version=0.0.4; charset=utf-8",
                    )
                    return
                if u.path.rstrip("/") != "/sql":
                    self._reply(404, {"error": "not found"})
                    return
                qs = parse_qs(u.query)
                queries = qs.get("q") or qs.get("sql") or []
                if not queries or not queries[0].strip():
                    self._reply(400, {"error": "No SQL query provided"})
                    return
                if server.read_only and not _is_read_statement(
                    queries[0], server.spark
                ):
                    self._reply(
                        403,
                        {
                            "error": "read-only debug api: only single "
                            "SELECT/SHOW/DESCRIBE/EXPLAIN statements are "
                            "accepted (start with read_only=False to allow "
                            "writes)"
                        },
                    )
                    return
                try:
                    df = server.spark.sql(queries[0]).limit(server.max_rows)
                    rows = [r.asDict(recursive=True) for r in df.collect()]
                except Exception as e:
                    self._reply(500, {"error": str(e)})
                    return
                self._reply(200, rows)

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None

    @property
    def address(self) -> tuple[str, int]:
        return self._server.server_address[:2]

    @property
    def url(self) -> str:
        host, port = self.address
        return f"http://{host}:{port}/sql"

    def start(self) -> "DebugHTTPServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="debug-api", daemon=True
        )
        self._thread.start()
        return self

    def stop(self):
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=5)
