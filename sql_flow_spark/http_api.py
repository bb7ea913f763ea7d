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
_COMMENT_RE = re.compile(r"(--[^\n]*\n?)|(/\*.*?\*/)", flags=re.DOTALL)


def _is_read_statement(sql: str) -> bool:
    stripped = _COMMENT_RE.sub(" ", sql).strip()
    first = stripped.split(None, 1)[0].upper() if stripped else ""
    # a single statement only: a trailing `; DROP ...` is not a read
    if ";" in stripped.rstrip().rstrip(";"):
        return False
    return first in _READ_KEYWORDS


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


class DebugHTTPServer:
    """``GET /sql?q=<query>`` -> JSON rows from ``spark.sql(query)``.

    Contract (mirrors reference sqlflow/http.py dispatch_request):
    missing query -> 400 ``{"error": "No SQL query provided"}``;
    execution error -> 500 ``{"error": "<message>"}``; success -> 200
    with a JSON array of row objects (keyed by column name — richer
    than the reference's positional lists, same information).
    ``?sql=`` is accepted as an alias for ``?q=``.
    """

    def __init__(
        self,
        spark: SparkSession,
        host: str = "127.0.0.1",
        port: int = 0,
        max_rows: int = 1000,
        allow_remote: bool = False,
        read_only: bool = True,
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

            def do_GET(self):
                u = urlparse(self.path)
                if u.path.rstrip("/") != "/sql":
                    self._reply(404, {"error": "not found"})
                    return
                qs = parse_qs(u.query)
                queries = qs.get("q") or qs.get("sql") or []
                if not queries or not queries[0].strip():
                    self._reply(400, {"error": "No SQL query provided"})
                    return
                if server.read_only and not _is_read_statement(queries[0]):
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
