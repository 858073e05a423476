"""Boot-phase instrumentation + early port bind for scripts/serve.py.

Round-3 finding: a chip-side serve.py restart spent 20-22.6 s between
process start and port bind with no phase breakdown — the AOT cache had
fixed the warmup segment (15.2 -> 3.0 s) but the dominant boot cost was
unmeasured (evidence/realchip_aot_boot.json). This module fixes both
halves:

* :class:`BootTimer` — wall-clock phase ledger anchored at the PROCESS
  start (``/proc/self/stat`` starttime, so interpreter+import time is
  visible, not just time-since-``main``).
* :func:`bind_boot_server` — binds the listening socket with a
  stdlib-only handler BEFORE any heavy import or backend touch: an
  orchestrator's readiness probe sees ``{"status": "booting",
  "phases": ...}`` within ~1 s of exec instead of connection-refused
  for the whole boot; /enhance answers 503 + Retry-After until
  :func:`attach_service` swaps in the real handler (the same
  ``ThreadingHTTPServer`` instance keeps the socket — per-connection
  handler classes make the swap safe for in-flight requests).

This module must import ONLY the stdlib (that is the point: binding
cannot wait for jax/flax). The reference has no daemon at all; this is
the ops half of beating its zero-boot cold CLI story.
"""

from __future__ import annotations

import json
import os
import threading
import time
from contextlib import contextmanager
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def process_start_time() -> float:
    """POSIX wall-clock time this process was exec'd (before the
    interpreter booted), from /proc/self/stat starttime + /proc/stat
    btime. Falls back to ``time.time()`` (phase durations stay right,
    the interpreter segment collapses to 0) off Linux."""
    try:
        with open("/proc/self/stat", "rb") as f:
            # starttime is field 22; split after the parenthesised comm,
            # which may itself contain spaces
            after_comm = f.read().rsplit(b") ", 1)[1].split()
        ticks = int(after_comm[19])
        with open("/proc/stat") as f:
            btime = next(int(line.split()[1]) for line in f
                         if line.startswith("btime "))
        return btime + ticks / os.sysconf("SC_CLK_TCK")
    except Exception:
        return time.time()


class BootTimer:
    """Thread-safe named-phase ledger. Phases may overlap (backend init
    runs in a thread concurrently with the checkpoint read)."""

    def __init__(self):
        self.t0 = process_start_time()
        self._lock = threading.Lock()
        self._phases: dict[str, list] = {}   # name -> [start, end|None]
        self._marks: dict[str, float] = {}
        self.mark("interpreter_start", at=self.t0)

    def mark(self, name: str, at: float | None = None) -> None:
        with self._lock:
            self._marks[name] = (at if at is not None else time.time())

    def mark_once(self, name: str) -> bool:
        """Atomic mark-if-absent: the check and the write happen under one
        lock, so two racing markers (serve.py's ready-via-AOT block on the
        main thread vs _warm_done on the warmup thread) cannot overwrite
        an earlier mark with a later time — the ledger keeps the FIRST
        ready, which is the number the boot evidence records. Returns
        True iff this call placed the mark."""
        with self._lock:
            if name in self._marks:
                return False
            self._marks[name] = time.time()
            return True

    def start(self, name: str) -> None:
        with self._lock:
            self._phases[name] = [time.time(), None]

    def end(self, name: str) -> None:
        with self._lock:
            if name in self._phases:
                self._phases[name][1] = time.time()

    @contextmanager
    def phase(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            self.end(name)

    def snapshot(self) -> dict:
        """JSON-ready view: per-phase {start_s, dur_s} relative to process
        start, marks as offsets, open phases listed as ``in_progress``."""
        now = time.time()
        with self._lock:
            phases = {
                n: {"start_s": round(s - self.t0, 2),
                    "dur_s": round((e if e is not None else now) - s, 2),
                    **({} if e is not None else {"running": True})}
                for n, (s, e) in self._phases.items()
            }
            marks = {n: round(t - self.t0, 2)
                     for n, t in self._marks.items() if n != "interpreter_start"}
            current = [n for n, (s, e) in self._phases.items() if e is None]
        return {"phases": phases, "marks": marks,
                "in_progress": current,
                "elapsed_s": round(now - self.t0, 2)}


class _BootHandler(BaseHTTPRequestHandler):
    """Answers for the server between bind and :func:`attach_service`."""

    boot: BootTimer = None  # injected by bind_boot_server
    protocol_version = "HTTP/1.1"
    timeout = 65

    def log_message(self, fmt, *args):  # quiet (matches RequestHandler)
        pass

    def _json(self, code: int, obj, retry: bool = False) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        if retry:
            self.send_header("Retry-After", "2")
        # request bodies are never read here: the connection must close or
        # keep-alive would parse the unread body as the next request —
        # and the client must be TOLD (the base class never emits the
        # header from the flag), or it reuses a closing socket
        self.close_connection = True
        self.send_header("Connection", "close")
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path.split("?", 1)[0] == "/healthz":
            self._json(200, {"status": "booting", "ready": False,
                             "boot": self.boot.snapshot()})
        else:
            self._json(503, {"error": "server is booting",
                             "boot": self.boot.snapshot()}, retry=True)

    def do_POST(self):
        self._json(503, {"error": "server is booting; retry shortly"},
                   retry=True)


def bind_boot_server(host: str, port: int, boot: BootTimer) -> ThreadingHTTPServer:
    """Bind the listening socket NOW with the boot handler and start
    accepting connections on a daemon thread. The returned server is the
    one, permanent server instance — :func:`attach_service` later swaps
    its per-connection handler class in place; ``serve_forever`` keeps
    running throughout (the caller joins it at the end of ``main``)."""
    handler = type("BoundBootHandler", (_BootHandler,), {"boot": boot})
    server = ThreadingHTTPServer((host, port), handler)
    server.daemon_threads = False   # see http.make_server: joins on close
    t = threading.Thread(target=server.serve_forever, daemon=True,
                         name="serve-http")
    t.start()
    server._serve_thread = t        # main joins this until shutdown()
    boot.mark("port_bound")
    return server


def attach_service(server: ThreadingHTTPServer, service, verbose: bool = False,
                   admin_token: str | None = None) -> None:
    """Swap the real request handler onto the already-listening server.

    Imported lazily (dvae_tpu.serving.http pulls in the full stack) —
    that import cost is part of the caller's instrumented phases, never
    of the bind. In-flight boot-handler connections finish on the old
    class; every connection accepted after this line gets the service."""
    from dvae_tpu.serving.http import bound_handler

    server.RequestHandlerClass = bound_handler(service, verbose, admin_token)
