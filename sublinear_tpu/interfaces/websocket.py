"""Minimal RFC 6455 WebSocket support (stdlib-only) for the HTTP server.

The reference serves a WebSocket endpoint at /ws with a small JSON message
protocol (/root/reference/server/index.js:449-596): a `welcome` on connect,
`solve` -> `solve_started` + streamed `session_update` messages, `subscribe`
to an existing session, and `ping` -> `pong`.  This module implements the
wire protocol (handshake + framing) so the stdlib HTTP server can speak it
without external dependencies; the message protocol lives in http_server.
"""
from __future__ import annotations

import base64
import hashlib
import json
import struct
import threading

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_TEXT = 0x1
OP_BINARY = 0x2
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA


def accept_key(client_key: str) -> str:
    digest = hashlib.sha1((client_key + _GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def perform_handshake(handler) -> bool:
    """Upgrade `handler`'s connection; returns False (+ 400 reply) on a bad
    request.  `handler` is a BaseHTTPRequestHandler inside do_GET."""
    key = handler.headers.get("Sec-WebSocket-Key")
    upgrade = (handler.headers.get("Upgrade") or "").lower()
    if upgrade != "websocket" or not key:
        handler.send_response(400)
        handler.end_headers()
        return False
    handler.send_response(101, "Switching Protocols")
    handler.send_header("Upgrade", "websocket")
    handler.send_header("Connection", "Upgrade")
    handler.send_header("Sec-WebSocket-Accept", accept_key(key))
    handler.end_headers()
    handler.wfile.flush()
    return True


class WebSocketConnection:
    """Frame-level reader/writer over the handler's rfile/wfile.

    ``client=True`` masks outgoing frames (RFC 6455 §5.1: client->server
    frames MUST be masked; server->client MUST NOT be)."""

    def __init__(self, rfile, wfile, client: bool = False):
        self.rfile = rfile
        self.wfile = wfile
        self.client = client
        self.send_lock = threading.Lock()
        self.open = True

    # ------------------------------------------------------------- sending
    def send_frame(self, payload: bytes, opcode: int = OP_TEXT):
        header = bytes([0x80 | opcode])
        n = len(payload)
        mask_bit = 0x80 if self.client else 0
        if n < 126:
            header += bytes([mask_bit | n])
        elif n < (1 << 16):
            header += bytes([mask_bit | 126]) + struct.pack(">H", n)
        else:
            header += bytes([mask_bit | 127]) + struct.pack(">Q", n)
        if self.client:
            import os

            mask = os.urandom(4)
            payload = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
            header += mask
        with self.send_lock:
            self.wfile.write(header + payload)
            self.wfile.flush()

    def send_json(self, obj):
        if not self.open:
            return
        try:
            self.send_frame(json.dumps(obj).encode())
        except (BrokenPipeError, ConnectionResetError, OSError):
            self.open = False

    def close(self, code: int = 1000):
        if not self.open:
            return
        try:
            self.send_frame(struct.pack(">H", code), OP_CLOSE)
        except OSError:
            pass
        self.open = False

    # ------------------------------------------------------------ receiving
    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.rfile.read(n - len(buf))
            if not chunk:
                raise ConnectionError("websocket peer closed")
            buf += chunk
        return buf

    # Reject frames/messages above this size with a 1009 close instead of
    # trusting the client-declared 64-bit length (remote memory-exhaustion
    # guard; the reference caps request bodies at the express layer,
    # server/index.js:70-75).
    MAX_MESSAGE_BYTES = 16 * 1024 * 1024

    def read_message(self):
        """Returns (opcode, payload bytes) for the next complete message;
        transparently answers pings.  None once the connection closes."""
        payload = bytearray()
        opcode = None
        while True:
            try:
                b1, b2 = self._read_exact(2)
            except (ConnectionError, OSError):
                self.open = False
                return None
            fin = b1 & 0x80
            op = b1 & 0x0F
            masked = b2 & 0x80
            n = b2 & 0x7F
            if n == 126:
                (n,) = struct.unpack(">H", self._read_exact(2))
            elif n == 127:
                (n,) = struct.unpack(">Q", self._read_exact(8))
            if n + len(payload) > self.MAX_MESSAGE_BYTES:
                try:
                    self.send_frame(struct.pack(">H", 1009), OP_CLOSE)
                finally:
                    self.close()
                return None
            mask = self._read_exact(4) if masked else None
            data = self._read_exact(n)
            if mask:
                data = bytes(c ^ mask[i % 4] for i, c in enumerate(data))
            if op == OP_CLOSE:
                self.close()
                return None
            if op == OP_PING:
                try:
                    self.send_frame(data, OP_PONG)
                except OSError:
                    self.open = False
                    return None
                continue
            if op == OP_PONG:
                continue
            if op in (OP_TEXT, OP_BINARY):
                opcode = op
            payload += data
            if fin:
                return opcode, bytes(payload)


def connect(url: str, headers: dict | None = None, timeout: float = 10.0):
    """Open a client WebSocket to ``ws://host:port/path`` (stdlib sockets).

    Returns (WebSocketConnection, socket).  The reference uses the npm `ws`
    client for its swarm channel (integrations/flow-nexus.js:127-160); this
    is the equivalent handshake: GET upgrade with a random Sec-WebSocket-Key,
    101 response validated against the accept digest."""
    import os
    import socket
    from urllib.parse import urlparse

    u = urlparse(url)
    if u.scheme not in ("ws", "http"):
        raise ValueError(f"unsupported websocket scheme {u.scheme!r}")
    host = u.hostname or "127.0.0.1"
    port = u.port or 80
    path = u.path or "/"
    if u.query:
        path += "?" + u.query
    key = base64.b64encode(os.urandom(16)).decode()
    sock = socket.create_connection((host, port), timeout=timeout)
    req = [
        f"GET {path} HTTP/1.1",
        f"Host: {host}:{port}",
        "Upgrade: websocket",
        "Connection: Upgrade",
        f"Sec-WebSocket-Key: {key}",
        "Sec-WebSocket-Version: 13",
    ]
    for k, v in (headers or {}).items():
        req.append(f"{k}: {v}")
    sock.sendall(("\r\n".join(req) + "\r\n\r\n").encode())

    rfile = sock.makefile("rb")
    status = rfile.readline().decode("latin-1")
    if " 101 " not in status:
        sock.close()
        raise ConnectionError(f"websocket upgrade refused: {status.strip()}")
    resp_headers = {}
    while True:
        line = rfile.readline().decode("latin-1").strip()
        if not line:
            break
        if ":" in line:
            k, v = line.split(":", 1)
            resp_headers[k.strip().lower()] = v.strip()
    if resp_headers.get("sec-websocket-accept") != accept_key(key):
        sock.close()
        raise ConnectionError("websocket accept-key mismatch")
    sock.settimeout(None)
    ws = WebSocketConnection(rfile, sock.makefile("wb"), client=True)
    return ws, sock


def client_frame(payload: bytes, opcode: int = OP_TEXT, mask: bytes = b"\x12\x34\x56\x78") -> bytes:
    """Build a masked client->server frame (test helper; clients MUST mask)."""
    header = bytes([0x80 | opcode])
    n = len(payload)
    if n < 126:
        header += bytes([0x80 | n])
    elif n < (1 << 16):
        header += bytes([0x80 | 126]) + struct.pack(">H", n)
    else:
        header += bytes([0x80 | 127]) + struct.pack(">Q", n)
    masked = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    return header + mask + masked
