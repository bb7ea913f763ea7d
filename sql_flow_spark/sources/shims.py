"""Stdlib network shims for the push sources — no third-party deps.

The reference runs a FastAPI webhook server with HMAC validation and
request metrics (reference: sqlflow/sources/webhook.py:57-123) and a
``websockets``-based streaming client (reference:
sqlflow/sources/websocket.py:25). Neither library ships in this
container, and neither is architecturally necessary: the receiver's
only job is to validate + append records to the spool directory that
Spark's file stream tails (see push.py for why spooling, not an
in-executor server, is the scale design).

``WebhookReceiver``
    threaded ``http.server`` accepting ``POST /events``; validates the
    ``sha256=<hex>`` HMAC signature format the reference emits, counts
    requests/durations by status code (the reference's otel counters,
    minus otel), and pushes the body into the source's spool.

``WebsocketClient``
    minimal RFC 6455 client over a raw socket: HTTP upgrade handshake,
    frame parsing (text/binary/continuation/ping/close, 7/16/64-bit
    lengths), masked client frames. Each complete message is handed to
    ``on_message``.
"""

from __future__ import annotations

import base64
import hashlib
import json
import logging
import os
import socket
import struct
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional
from urllib.parse import urlparse

logger = logging.getLogger(__name__)

_WS_GUID = b"258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

# RFC 6455 opcodes
OP_CONT, OP_TEXT, OP_BINARY, OP_CLOSE, OP_PING, OP_PONG = 0, 1, 2, 8, 9, 10

# A frame length is peer-declared (up to 64-bit); reading it blindly
# lets a misbehaving server allocate unbounded driver memory. Cap it.
MAX_FRAME_SIZE = 16 * 1024 * 1024


# ------------------------------------------------------------- webhook

class WebhookReceiver:
    """In-process HTTP receiver fronting a WebhookSource.

    Mirrors the reference server's contract (reference:
    sqlflow/sources/webhook.py:73-93): POST /events, optional HMAC
    header carrying ``sha256=<hexdigest>`` of the raw body, 400 on a
    missing signature, 403 on a bad one, ``{"status": "received"}`` on
    success. Valid bodies are treated as jsonl (one record per
    non-empty line) and appended atomically to the source spool.
    """

    def __init__(self, source, host: str = "127.0.0.1", port: int = 0):
        self.source = source
        self.request_count: dict[str, int] = {}
        self.request_seconds: float = 0.0
        # handler threads (ThreadingHTTPServer) share the metric dict;
        # += on it is a read-modify-write race without this
        self._metrics_lock = threading.Lock()
        receiver = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet test output
                logger.debug("webhook: " + fmt, *args)

            def _reply(self, code: int, payload: dict):
                # count BEFORE flushing the response: a caller observing
                # the reply must also observe the metric
                with receiver._metrics_lock:
                    receiver.request_count[str(code)] = (
                        receiver.request_count.get(str(code), 0) + 1
                    )
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                start = time.monotonic()
                try:
                    if self.path.rstrip("/") != "/events":
                        self._reply(404, {"detail": "not found"})
                        return
                    try:
                        length = int(self.headers.get("Content-Length", "0"))
                        body = self.rfile.read(length)
                    except (ValueError, OSError):
                        self._reply(400, {"detail": "Bad Content-Length"})
                        return
                    if receiver.source.hmac_secret:
                        sig = self.headers.get(receiver.source.hmac_header)
                        if not sig:
                            self._reply(400, {"detail": "Missing HMAC signature"})
                            return
                        if not receiver.source.validate_hmac(body, sig):
                            self._reply(403, {"detail": "Invalid HMAC signature"})
                            return
                    try:
                        text = body.decode("utf-8")
                    except UnicodeDecodeError:
                        self._reply(400, {"detail": "Body is not valid UTF-8"})
                        return
                    lines = [ln for ln in text.splitlines() if ln.strip()]
                    if lines:
                        receiver.source.push(lines)
                    self._reply(200, {"status": "received"})
                finally:
                    with receiver._metrics_lock:
                        receiver.request_seconds += time.monotonic() - start

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None

    @property
    def address(self) -> tuple[str, int]:
        return self._server.server_address[:2]

    @property
    def url(self) -> str:
        host, port = self.address
        return f"http://{host}:{port}/events"

    def start(self) -> "WebhookReceiver":
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="webhook-receiver", daemon=True
        )
        self._thread.start()
        return self

    def stop(self):
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=5)


# ----------------------------------------------------------- websocket

class BufferedSock:
    """Socket wrapper that first drains bytes read past the handshake —
    a server may send its first frames in the same TCP segment as the
    101 response, and they must not be lost."""

    def __init__(self, sock: socket.socket, residue: bytes = b""):
        self._sock = sock
        self._buf = residue

    def recv(self, n: int) -> bytes:
        if self._buf:
            out, self._buf = self._buf[:n], self._buf[n:]
            return out
        return self._sock.recv(n)

    def sendall(self, data: bytes):
        return self._sock.sendall(data)

    def close(self):
        return self._sock.close()

    def settimeout(self, t):
        return self._sock.settimeout(t)


def _recv_exact(sock, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("websocket peer closed mid-frame")
        buf += chunk
    return buf


def encode_frame(opcode: int, payload: bytes, masked: bool) -> bytes:
    """Encode one RFC 6455 frame (FIN always set — callers that need
    fragmentation split payloads themselves)."""
    head = bytes([0x80 | opcode])
    n = len(payload)
    mask_bit = 0x80 if masked else 0
    if n < 126:
        head += bytes([mask_bit | n])
    elif n < 1 << 16:
        head += bytes([mask_bit | 126]) + struct.pack(">H", n)
    else:
        head += bytes([mask_bit | 127]) + struct.pack(">Q", n)
    if masked:
        mask = os.urandom(4)
        body = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        return head + mask + body
    return head + payload


def read_frame(sock, max_size: int = MAX_FRAME_SIZE) -> tuple[int, bool, bytes]:
    """Read one frame -> (opcode, fin, payload); unmasks if needed.
    Frames over ``max_size`` are refused before allocation."""
    b1, b2 = _recv_exact(sock, 2)
    fin = bool(b1 & 0x80)
    opcode = b1 & 0x0F
    masked = bool(b2 & 0x80)
    n = b2 & 0x7F
    if n == 126:
        n = struct.unpack(">H", _recv_exact(sock, 2))[0]
    elif n == 127:
        n = struct.unpack(">Q", _recv_exact(sock, 8))[0]
    if n > max_size:
        raise ConnectionError(
            f"websocket frame of {n} bytes exceeds max_frame_size {max_size}"
        )
    mask = _recv_exact(sock, 4) if masked else b""
    payload = _recv_exact(sock, n) if n else b""
    if masked:
        payload = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    return opcode, fin, payload


def ws_accept_key(client_key: str) -> str:
    """Server-side Sec-WebSocket-Accept for a client key (used by the
    in-test server; same derivation the client verifies)."""
    digest = hashlib.sha1(client_key.encode() + _WS_GUID).digest()
    return base64.b64encode(digest).decode()


class WebsocketClient:
    """Blocking RFC 6455 client: connect, hand every complete message
    to ``on_message``, answer pings, stop on close (reference behavior:
    sqlflow/sources/websocket.py:25 — connect and yield messages until
    the server ends the stream)."""

    def __init__(self, uri: str, on_message: Callable[[bytes], None],
                 connect_timeout: float = 10.0,
                 max_frame_size: int = MAX_FRAME_SIZE,
                 on_close: Callable[[], None] | None = None):
        self.uri = uri
        self.on_message = on_message
        self.connect_timeout = connect_timeout
        self.max_frame_size = max_frame_size
        # runs exactly once when the read loop ends, however it ends —
        # owners flush buffered-but-unspooled messages here
        self.on_close = on_close
        self._sock: Optional[BufferedSock] = None
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.error: Optional[BaseException] = None  # set if the loop dies

    # -- handshake

    def _connect(self) -> BufferedSock:
        u = urlparse(self.uri)
        if u.scheme not in ("ws",):
            raise ValueError(f"unsupported websocket scheme: {u.scheme} (wss needs TLS wrap)")
        host, port = u.hostname, u.port or 80
        path = u.path or "/"
        if u.query:
            path += "?" + u.query
        sock = socket.create_connection((host, port), timeout=self.connect_timeout)
        key = base64.b64encode(os.urandom(16)).decode()
        req = (
            f"GET {path} HTTP/1.1\r\n"
            f"Host: {host}:{port}\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        )
        sock.sendall(req.encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = sock.recv(4096)
            if not chunk:
                raise ConnectionError("websocket server closed during handshake")
            resp += chunk
        head_bytes, residue = resp.split(b"\r\n\r\n", 1)
        head = head_bytes.decode("latin-1")
        status = head.splitlines()[0]
        if " 101 " not in status + " ":
            raise ConnectionError(f"websocket handshake rejected: {status}")
        headers = {
            k.strip().lower(): v.strip()
            for k, v in (ln.split(":", 1) for ln in head.splitlines()[1:] if ":" in ln)
        }
        if headers.get("sec-websocket-accept") != ws_accept_key(key):
            raise ConnectionError("websocket handshake: bad Sec-WebSocket-Accept")
        sock.settimeout(None)
        return BufferedSock(sock, residue)

    # -- read loop

    def run_once(self):
        """Connect and consume until the server closes (or stop())."""
        self._sock = self._connect()
        sock = self._sock
        buf = bytearray()
        first_opcode = OP_TEXT
        try:
            while not self._stop.is_set():
                opcode, fin, payload = read_frame(sock, self.max_frame_size)
                if opcode == OP_PING:
                    sock.sendall(encode_frame(OP_PONG, payload, masked=True))
                    continue
                if opcode == OP_CLOSE:
                    try:
                        sock.sendall(encode_frame(OP_CLOSE, b"", masked=True))
                    except OSError:
                        pass
                    break
                if opcode in (OP_TEXT, OP_BINARY):
                    first_opcode = opcode
                    buf = bytearray(payload)
                elif opcode == OP_CONT:
                    buf.extend(payload)
                else:  # pong / reserved: ignore
                    continue
                if fin:
                    self.on_message(bytes(buf))
                    buf = bytearray()
        finally:
            try:
                sock.close()
            except OSError:
                pass

    def _run_guarded(self):
        try:
            self.run_once()
        except BaseException as e:  # surfaced via .error for the owner
            if self._stop.is_set():
                # a deliberate stop() closes the socket under the read
                # loop; the resulting OSError is not a failure signal
                logger.debug("websocket client closed on stop(): %s", e)
            else:
                self.error = e
                logger.warning("websocket client terminated: %s", e)
        finally:
            if self.on_close is not None:
                try:
                    self.on_close()
                except Exception:
                    logger.exception("websocket on_close hook failed")

    def start(self) -> "WebsocketClient":
        self._thread = threading.Thread(target=self._run_guarded, name="ws-client", daemon=True)
        self._thread.start()
        return self

    def stop(self, timeout: float = 5.0):
        self._stop.set()
        if self._sock:
            try:
                self._sock.close()
            except OSError:
                pass
        if self._thread:
            self._thread.join(timeout=timeout)

    def join(self, timeout: float | None = None):
        if self._thread:
            self._thread.join(timeout=timeout)
