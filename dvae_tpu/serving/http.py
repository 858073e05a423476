"""The HTTP layer of the serving package: request parsing/validation,
status-code mapping, streaming response delivery, keep-alive hygiene.
All actual enhancement work is delegated to :class:`EnhanceService`
(service.py); wire formats come from wire.py."""

from __future__ import annotations

import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from dvae_tpu.serving.metrics import _prometheus_text
from dvae_tpu.serving.service import (EnhanceService, EnhancementError,
                                      ServiceOverloaded)
from dvae_tpu.serving.wire import (_parse_wav_bytes, _pcm_seg_bytes,
                                   _riff_header, _riff_stream_info,
                                   _pcm_to_float_mono, _wav_bytes)


class RequestHandler(BaseHTTPRequestHandler):
    """Bound to a service via ``make_server`` (class attribute injection)."""

    service: EnhanceService = None  # set by make_server
    admin_token: str | None = None  # set by make_server; gates /reload
    max_content_length = 256 * 1024 * 1024
    protocol_version = "HTTP/1.1"
    # per-recv socket timeout: caps how long an idle keep-alive connection
    # (or a stalled client) can hold its handler thread, which bounds the
    # non-daemon thread join in server_close() at shutdown
    timeout = 65

    # quiet by default; scripts/serve.py re-enables logging with --verbose
    def log_message(self, fmt, *args):
        pass

    def _send(self, code: int, body: bytes, ctype: str, headers=()):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in headers:
            self.send_header(k, v)
        if self.close_connection:
            # paths that set the flag themselves (reject-unread, malformed
            # framing) must SAY so: the base class only derives the flag
            # FROM a request header, so without this an HTTP/1.1 client
            # assumes the socket is reusable and writes its next request
            # into a closing connection
            self.send_header("Connection", "close")
        self.end_headers()
        self.wfile.write(body)

    def _json(self, code: int, obj, headers=()):
        self._send(code, json.dumps(obj).encode(), "application/json",
                   headers)

    def _body_length(self):
        """Parsed Content-Length, or None after answering an error (a
        malformed header must not crash the handler thread). Chunked
        uploads are refused with 411: this server never reads chunked
        framing, so answering anything else on a keep-alive connection
        would leave the chunk frames in the socket to be parsed as the
        next request."""
        if self.headers.get("Transfer-Encoding"):
            self._reject_unread(
                411, {"error": "Transfer-Encoding not supported; send a "
                               "Content-Length body"})
            return None
        raw = self.headers.get("Content-Length", 0)
        try:
            return int(raw)
        except (TypeError, ValueError):
            self.close_connection = True
            self._json(400, {"error": f"bad Content-Length {raw!r}"})
            return None

    def _reject_unread(self, code: int, obj, headers=()):
        """Error response WITHOUT having consumed the request body: the
        connection must close, or the unread body bytes would be parsed as
        the next request on this HTTP/1.1 keep-alive connection. After the
        response, a short bounded drain of the unread body keeps the
        kernel from answering the client's in-flight upload with RST —
        which on most stacks would discard the queued error response, so
        the client would see 'connection reset' instead of the 413/400."""
        self.close_connection = True
        self._json(code, obj, headers)
        try:
            self.wfile.flush()
            self.connection.settimeout(1.0)
            remaining = min(int(self.headers.get("Content-Length") or 0),
                            1 << 20)  # best-effort: cap the drain at 1 MB
            while remaining > 0:
                got = self.rfile.read(min(65536, remaining))
                if not got:
                    break
                remaining -= len(got)
        except Exception:
            pass  # drain is best-effort; the response was already sent

    def do_GET(self):
        svc = self.service
        path = urlparse(self.path).path
        if path == "/healthz":
            import jax

            ready = svc.ready.is_set()
            body = {
                "status": ("ok" if ready else
                           "warmup failed" if svc.warmup_error is not None
                           else "warming"),
                "ready": ready,   # the readiness-probe bit (warmup_async)
                # warmed=False with ready=True: readiness came from the
                # AOT restore probe (--ready-on-aot-validate) and the
                # background warmup's first executions haven't finished —
                # early requests pay the device touch
                "warmed": getattr(svc, "warmed", True),
                "model_class": svc.model_class,
                "platform": jax.devices()[0].platform,
                "warm_buckets": svc.warm_buckets,
                "checkpoint": svc.checkpoint,
                "uptime_seconds": round(time.time() - svc.started, 1),
            }
            if getattr(svc, "ready_via_aot", False):
                body["ready_via_aot"] = True
            if svc.warmup_error is not None:
                body["warmup_error"] = str(svc.warmup_error)
            if getattr(svc.enhancer, "_aot_enabled", False):
                # loaded vs compiled per bucket — lets an operator verify a
                # boot actually hit the AOT cache (the whole point of it)
                body["aot"] = dict(svc.enhancer.aot_stats)
            boot = getattr(svc, "boot", None)
            if boot is not None:
                # the boot-phase ledger (serving/boot.py): where the start
                # time went — imports, backend init, model load, service
                # init, warmup — and the ready mark. Kept after boot so a
                # slow restart is diagnosable post-hoc.
                body["boot"] = boot.snapshot()
            self._json(200, body)
        elif path == "/stats":
            # "pending" (live queue pressure, admitted-but-unanswered) is
            # what an autoscaler or a load-shedding probe actually wants,
            # distinct from the completed-work counters
            self._json(200, svc.stats_snapshot())
        elif path == "/metrics":
            self._send(200, _prometheus_text(svc).encode(),
                       "text/plain; version=0.0.4; charset=utf-8")
        else:
            self._json(404, {"error": f"unknown path {path}"})

    def do_POST(self):
        svc = self.service
        url = urlparse(self.path)
        length = self._body_length()
        if length is None:
            return
        if url.path == "/reload":
            if length:  # a stray body must not desync the connection
                self.close_connection = True
            q = parse_qs(url.query)
            if self.admin_token is not None and \
                    q.get("token", [None])[0] != self.admin_token:
                self._json(403, {"error": "reload requires ?token= (the "
                                          "server's --admin-token)"})
                return
            path = q.get("checkpoint", [None])[0]
            if not path:
                self._json(400, {"error": "pass ?checkpoint=<path> (msgpack "
                                          "or reference .pt)"})
                return
            try:
                svc.reload_checkpoint(path)
            except (RuntimeError, TimeoutError) as e:
                self._json(503, {"error": str(e)},
                           headers=(("Retry-After", "1"),))
                return
            except Exception as e:
                self._json(400, {"error": f"reload failed: {e}"})
                return
            self._json(200, {"status": "reloaded", "checkpoint": path})
            return
        if url.path != "/enhance":
            self._reject_unread(404, {"error": f"unknown path {url.path}"})
            return
        q = parse_qs(url.query)
        want = q.get("return", ["speech"])[0]
        if want not in ("speech", "noise", "stereo"):
            self._reject_unread(400, {"error": f"bad return={want!r}"})
            return
        y_source = q.get("y_source", [None])[0]
        if length <= 0:
            self._json(400, {"error": "empty body (POST a RIFF/WAVE file)"})
            return
        if length > self.max_content_length:
            self._reject_unread(413, {"error": "request too large"})
            return
        stream = q.get("stream", ["0"])[0] in ("1", "true")
        model_fs = svc.enh_cfg.stft.fs
        prefix = b""
        if stream and svc.cfg.chunk_seconds > 0:
            # full-duplex fast path: parse only the RIFF prefix; when the
            # body is model-rate PCM we can decode incrementally, enhance
            # it WHILE it uploads. Anything else falls back to buffering.
            prefix, info = _riff_stream_info(self.rfile, length)
            if info is not None and info["fs"] == model_fs:
                self._stream_duplex(info, length - len(prefix), y_source,
                                    want, model_fs)
                return
        body = prefix + self.rfile.read(length - len(prefix))
        try:
            wav, fs = _parse_wav_bytes(body)
        except Exception as e:
            self._json(400, {"error": f"cannot parse wav: {e}"})
            return
        if fs != model_fs:
            if q.get("resample", ["0"])[0] not in ("1", "true"):
                self._json(400, {"error": f"{fs} Hz != model rate {model_fs} "
                                          "Hz (pass ?resample=1 to convert; "
                                          "the response stays at the model "
                                          "rate)"})
                return
            from dvae_tpu.data.io import resample

            wav = resample(wav, fs, model_fs)
        if stream:
            self._stream_enhance(wav.astype(np.float32), y_source, want,
                                 model_fs)
            return
        try:
            s, n = svc.submit(wav.astype(np.float32), y_source)
        except Exception as e:
            self._enhance_error(e)
            return
        chans = {"speech": [s], "noise": [n], "stereo": [s, n]}[want]
        self._send(200, _wav_bytes(chans, model_fs), "audio/wav")

    def _enhance_error(self, e: Exception) -> None:
        """Map an enhancement failure to its wire code: overload signals
        (reject-at-admission and gave-up-waiting alike) -> 503 + backoff
        hint; invalid client input -> 400; worker faults -> 500 (server's
        fault, monitorable — never blame the client for an operator's
        wrong --y-dim)."""
        if isinstance(e, (ServiceOverloaded, TimeoutError)):
            self._json(503, {"error": str(e)}, headers=(("Retry-After", "1"),))
        elif isinstance(e, ValueError):
            self._json(400, {"error": str(e)})
        elif isinstance(e, EnhancementError):  # already prefixed
            self._json(500, {"error": str(e)})
        else:
            self._json(500, {"error": f"enhancement failed: {e}"})

    def _stream_enhance(self, wav: np.ndarray, y_source: str | None,
                        want: str, model_fs: int) -> None:
        """`?stream=1`, fully-buffered body: stream the response as chunks
        finalize (see :meth:`_stream_response` for the wire mechanics)."""
        try:
            gen = self.service.submit_stream(wav, y_source)
        except Exception as e:
            self._enhance_error(e)
            return
        self._stream_response(gen, len(wav), want, model_fs)

    def _stream_duplex(self, info: dict, body_remaining: int,
                       y_source: str | None, want: str,
                       model_fs: int) -> None:
        """`?stream=1` on an incrementally-decodable model-rate PCM body:
        FULL-DUPLEX. The body is decoded and fed to the service as it
        arrives (submit_stream_from's feeder thread pulls the block
        iterator below), so device work on early chunks overlaps the
        client's upload of the tail, and the response streams back on the
        same socket while the body is still being received — a long
        request costs max(upload, enhance), not their sum. Pre-stream
        failures close the connection (the body was not consumed — the
        unread bytes would desync keep-alive); on success any trailer
        bytes after the audio (post-data metadata chunks) are drained so
        the next request on the connection parses from a clean
        boundary."""
        svc = self.service
        block_align = info["channels"] * info["bits"] // 8
        n_samples = min(info["data_bytes"], body_remaining) // block_align
        audio_bytes = n_samples * block_align
        consumed = [0]

        def blocks():
            pend = b""
            while consumed[0] < audio_bytes:
                # read1: whatever the socket has (>=1 byte), so a slow
                # uploader's samples reach the device as they arrive
                # instead of waiting to fill a block
                raw = self.rfile.read1(min(65536, audio_bytes - consumed[0]))
                if not raw:
                    raise ValueError("request body ended early")
                consumed[0] += len(raw)
                pend += raw
                cut = len(pend) // block_align * block_align
                if cut == 0:
                    continue  # mid-frame: wait for the rest of the sample
                chunk, pend = pend[:cut], pend[cut:]
                yield _pcm_to_float_mono(chunk, info["fmt"], info["bits"],
                                         info["channels"])

        try:
            gen = svc.submit_stream_from(blocks(), n_samples, y_source)
        except Exception as e:
            self.close_connection = True  # body unread
            self._enhance_error(e)
            return
        if self._stream_response(gen, n_samples, want, model_fs,
                                 pre_error_close=True):
            left = body_remaining - consumed[0]
            while left > 0:  # drain the trailer for keep-alive sync
                got = self.rfile.read(min(65536, left))
                if not got:
                    self.close_connection = True
                    break
                left -= len(got)

    def _stream_response(self, gen, n_samples: int, want: str,
                         model_fs: int, pre_error_close: bool = False) -> bool:
        """Write one `?stream=1` response from a (s_seg, n_seg) generator;
        True = the full body was delivered.

        The output length is known up front (input samples at the model
        rate), so the response is a STANDARD fixed-size wav delivered with
        an exact Content-Length — a client can play (or pipe) it as it
        arrives; time-to-first-audio on a chunked long request is one
        chunk's latency, not the whole file's. Errors BEFORE the first
        segment still map to their proper status codes (the first device
        result is awaited before committing headers); after that the only
        correct wire signal is a short body + closed connection, which any
        length-checking client detects."""
        try:
            first = next(gen)
        except Exception as e:
            if pre_error_close:  # duplex: the request body was not consumed
                self.close_connection = True
            self._enhance_error(e)
            return False
        n_ch = 2 if want == "stereo" else 1
        data_bytes = 2 * n_ch * n_samples
        self.send_response(200)
        self.send_header("Content-Type", "audio/wav")
        self.send_header("Content-Length", str(44 + data_bytes))
        self.end_headers()
        try:
            self.wfile.write(_riff_header(data_bytes, n_ch, model_fs))
            self.wfile.write(_pcm_seg_bytes(first, want))
            self.wfile.flush()   # first audio leaves NOW, not at a buffer
            for seg in gen:      # boundary
                self.wfile.write(_pcm_seg_bytes(seg, want))
                self.wfile.flush()
            return True
        except Exception:
            # device fault mid-request or the client went away: either way
            # the committed 200 cannot be amended — truncate + close
            self.close_connection = True
            return False
        finally:
            gen.close()          # abandons any not-yet-served chunks


def bound_handler(service: EnhanceService, verbose: bool = False,
                  admin_token: str | None = None) -> type:
    """The RequestHandler subclass bound to ``service`` — the ONE
    definition shared by :func:`make_server` and the early-bind boot path
    (serving/boot.py::attach_service), so a handler knob added here can
    never silently diverge between the two server constructions."""
    handler = type("BoundHandler", (RequestHandler,),
                   {"service": service, "admin_token": admin_token})
    if verbose:
        handler.log_message = BaseHTTPRequestHandler.log_message
    return handler


def make_server(service: EnhanceService, host: str = "127.0.0.1",
                port: int = 0, verbose: bool = False,
                admin_token: str | None = None) -> ThreadingHTTPServer:
    """A ThreadingHTTPServer bound to ``service`` (port 0 = auto-assign;
    the chosen port is ``server.server_address[1]``). Call
    ``serve_forever()`` (blocking) or drive it from a thread in tests.
    ``admin_token`` gates POST /reload (pass ?token=...) — set it whenever
    the bind address is not loopback, since /reload loads
    operator-supplied filesystem paths."""
    server = ThreadingHTTPServer(
        (host, port), bound_handler(service, verbose, admin_token))
    # NON-daemon handler threads: server_close() joins them, so process
    # exit after a drain cannot truncate a response still being written to
    # a slow client (the handler `timeout` bounds the join)
    server.daemon_threads = False
    return server
