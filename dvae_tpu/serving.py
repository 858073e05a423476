"""Persistent enhancement service: warm compiled engine, micro-batched HTTP.

Beyond-reference serving surface. The reference's deployment story is "run
the eval script over the corpus tree" — a cold process per sweep
(evaluate_ntcd_M1.py:222-259); `scripts/enhance_wav.py` gives dvae-tpu a
one-shot CLI over arbitrary wavs, but every invocation still pays the cold
jit compile (~minutes over a remote-attached chip). This module keeps ONE
process bound to the chip with the compiled MCEM program warm and answers
enhancement requests over plain HTTP (stdlib `http.server` — no framework
dependencies).

The TPU-serving shape:

* **Micro-batching.** Concurrent requests are drained from a queue for up
  to ``batch_window_ms`` and enhanced as one device batch — single
  requests don't leave the MXU at batch-1 utilization when traffic
  overlaps. The batch is padded to a FIXED ``batch_size`` with 1-frame
  silent utterances, so the jitted program is keyed only by the frame
  bucket (Enhancer pads frames to multiples of 64), not by how many
  requests happened to coincide: a warm server never recompiles.
* **Warmup.** ``EnhanceService.warmup()`` pushes dummy batches through the
  chosen frame buckets at startup, paying every expected compile before
  the first request arrives.
* **Self-labeling.** Conditional models (v3/v4/v5) label requests with
  their own x->y classifier on the mixture spectrogram, like
  `enhance_wav.py --y-source self-soft`; ``ones``/``zeros`` are the
  constant ablations. m2/m2v2 (no classifier) must be served with a
  constant y_source.

Wire protocol (see ``RequestHandler``):
  POST /enhance?return=speech|noise|stereo&resample=1&y_source=...&stream=1
      body: a RIFF/WAVE file -> 200 with an audio/wav body (16 kHz PCM16;
      stereo = channel 0 speech, channel 1 noise — they sum to the input
      by the Wiener partition). With ``stream=1`` the (standard, exact
      Content-Length) wav body is DELIVERED INCREMENTALLY as chunk
      cross-fades finalize — on a chunked long request, first audio
      arrives after one chunk's latency instead of the whole file's.
      When the request body is itself model-rate PCM (the common case),
      ``stream=1`` additionally goes FULL-DUPLEX: the body is decoded and
      admitted chunk-by-chunk AS IT UPLOADS, so device work overlaps the
      transfer and a long request costs max(upload, enhance) instead of
      their sum (other encodings/rates fall back to buffering the body
      first — same response, same semantics).
  GET /healthz    -> {"status": "ok", ...}
  GET /stats      -> request/batch/audio-seconds counters, rtf, and
      p50/p90/p99 request latency over the last ``latency_window`` requests.
  GET /metrics    -> the same counters in Prometheus text exposition
      format (counters + gauges + a latency summary), so a standard
      scrape job / autoscaler can watch the server without a JSON shim.
  POST /reload?checkpoint=<path> -> hot-swap to a new checkpoint of the
      SAME model (msgpack or reference .pt) with zero downtime: params are
      per-call arguments of the compiled programs, so the swap reuses every
      warm compile; the worker applies it between device batches, so each
      request is answered by exactly one params epoch.

Overload behavior: the admission queue is bounded (``max_queue``); beyond
it requests fail fast with 503 + Retry-After rather than queueing
unboundedly, and waiters that time out mark their items abandoned so the
worker never burns a device batch on a client that already gave up.

Shutdown: ``EnhanceService.drain()`` stops admission (new requests get 503
— the signal a load-balancer needs to fail over), answers everything
already admitted, then stops the worker; ``scripts/serve.py`` wires it to
SIGTERM so an orchestrator's stop never truncates an in-flight response.
"""

from __future__ import annotations

import dataclasses
import io as _io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from dvae_tpu.enhance.labeling import (classify_method_of, constant_labels,
                                       self_soft_labels)
from dvae_tpu.enhance.pipeline import Enhancer, EnhancerConfig
from dvae_tpu.ops.stft import n_stft_frames_clamped, samples_for_frames

_Y_SOURCES = ("self-soft", "ones", "zeros")


class ServiceOverloaded(RuntimeError):
    """Raised by ``submit`` when the admission queue is full — the caller
    should back off (the HTTP layer maps it to 503). Bounding the queue
    keeps worst-case latency proportional to ``max_queue/batch_size``
    device batches instead of letting a burst build unbounded backlog that
    every later request waits behind."""


class EnhancementError(RuntimeError):
    """A WORKER-side failure (device batch raised) — distinct from the
    ValueErrors submit() raises for invalid client input, so the HTTP
    layer reports it as a 500 (server's fault, monitorable), never a 400
    blaming the client for e.g. an operator's wrong --y-dim."""


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    batch_size: int = 8            # fixed device batch (pad with silence)
    batch_window_ms: float = 25.0  # max wait to fill a micro-batch
    y_source: str = "self-soft"    # default labels for conditional models
    y_dim: int = 1
    seed: int = 0
    max_audio_seconds: float = 600.0   # reject oversized requests up front
    warmup_buckets: tuple = (64, 256)  # frame buckets to pre-compile
    max_queue: int = 64            # admission cap; beyond it submit raises
    #                                ServiceOverloaded (HTTP 503)
    latency_window: int = 512      # last-N request latencies kept for /stats
    chunk_seconds: float = 0.0     # >0: requests longer than this split into
    #                                hop-aligned chunk items that ride the
    #                                SAME micro-batch queue (fixed buckets,
    #                                no recompile) and cross-fade on the
    #                                caller's thread (enhance/longform.py)


class EnhanceService:
    """Owns the Enhancer, the request queue, and the micro-batching worker.

    ``model_class`` is the enhance_wav.py family name (m1/m2/m2v2/v3/v4/v5);
    it decides label handling. Thread-safe: ``submit`` may be called from
    any number of HTTP handler threads.
    """

    def __init__(self, model, params, model_class: str,
                 enh_cfg: EnhancerConfig = EnhancerConfig(),
                 cfg: ServeConfig = ServeConfig(), mesh=None):
        if cfg.y_source not in _Y_SOURCES:
            raise ValueError(f"bad y_source {cfg.y_source!r}")
        self.model = model
        self.params = params
        self.model_class = model_class
        self.cfg = cfg
        self.enh_cfg = enh_cfg
        self.conditional = model_class != "m1"
        self.classify_method = classify_method_of(model_class)
        if (self.conditional and self.classify_method is None
                and cfg.y_source == "self-soft"):
            raise ValueError(f"{model_class} has no classifier; serve with "
                             "y_source ones/zeros")
        self.enhancer = Enhancer(model, params, enh_cfg, mesh=mesh)
        self.max_queue = max(1, cfg.max_queue)  # the ACTUAL admission bound
        self._q: queue.Queue = queue.Queue(maxsize=self.max_queue)
        self._lock = threading.Lock()
        self._latencies: list[float] = []  # ring buffer, latency_window deep
        self.stats = {"requests": 0, "failed": 0, "rejected": 0, "batches": 0,
                      "utterances": 0, "audio_seconds": 0.0,
                      "busy_seconds": 0.0, "warmup_seconds": 0.0,
                      "reloads": 0, "timeouts": 0}
        self._latency_window = max(1, cfg.latency_window)  # 0 would make
        #                          the del-slice trim a no-op (unbounded)
        self.checkpoint = None           # last hot-reloaded checkpoint path
        self._pending_reload = None      # (params, path, done, error-slot)
        self._draining = False           # drain(): stop admitting work
        self._unfinished = 0             # admitted items not yet answered
        self._chunked_inflight = 0       # chunked requests mid-admission
        self.started = time.time()
        self.ready = threading.Event()   # cleared only by warmup_async
        self.ready.set()
        self.warmup_error: Exception | None = None
        self.warm_buckets: list[int] = []
        self._batch_counter = 0
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="enhance-worker")
        self._worker.start()

    # -- labels ---------------------------------------------------------------
    def _labels_for_batch(self, batch: list["_Item"]) -> list[np.ndarray]:
        """Per-item (n_frames, y_dim) labels: constants per item; every
        self-soft item answered by ONE batched classifier call
        (labeling.self_soft_labels — shared with scripts/enhance_wav.py)."""
        ys: list = [None] * len(batch)
        soft = [i for i, it in enumerate(batch) if it.y_source == "self-soft"]
        for i, it in enumerate(batch):
            if it.y_source in ("ones", "zeros"):
                n = n_stft_frames_clamped(len(it.wav), self.enh_cfg.stft)
                ys[i] = constant_labels(n, self.cfg.y_dim, it.y_source)
        if soft:
            # enhancer.params, NOT self.params: the Enhancer canonicalizes
            # to device arrays — host checkpoint leaves here would re-cross
            # the link on every conditional batch (self.params stays the
            # host-side reload template)
            labels = self_soft_labels(
                self.model, self.enhancer.params, [batch[i].wav for i in soft],
                self.enh_cfg.stft, self.cfg.y_dim, self.classify_method,
                norm=self.enh_cfg.norm, norm_eps=self.enh_cfg.norm_eps)
            for i, lab in zip(soft, labels):
                ys[i] = lab
        return ys

    # -- request path ---------------------------------------------------------
    def _admit(self, wav: np.ndarray, y_source: str, count: bool,
               bypass_drain: bool = False,
               count_reject: bool = True) -> "_Item":
        """Queue one work item. Admission is ATOMIC with drain(): the
        draining check and the unfinished-work increment happen under the
        same lock drain() reads, so a request is either refused or
        guaranteed to be answered before drain() reports the service
        empty. ``bypass_drain`` is for the remaining chunks of an
        already-started chunked request — drain() waits for those via
        ``_chunked_inflight``, honoring 'everything admitted is
        answered'."""
        item = _Item(wav, y_source, count)
        with self._lock:
            if self._draining and not bypass_drain:
                raise ServiceOverloaded(
                    "server is draining for shutdown; retry against "
                    "another replica")
            self._unfinished += 1
        try:
            self._q.put_nowait(item)
        except queue.Full:
            with self._lock:
                self._unfinished -= 1
                if count_reject:
                    self.stats["rejected"] += 1
            raise ServiceOverloaded(
                f"admission queue full ({self.max_queue} pending); "
                "retry with backoff") from None
        return item

    def _await(self, item: "_Item", timeout: float) -> tuple[np.ndarray, np.ndarray]:
        if not item.done.wait(timeout):
            # mark abandoned so the worker drops it instead of burning a
            # device batch for a waiter that already gave up — exactly the
            # overload situation that caused the timeout. Counted, so the
            # 503s this produces are visible in /stats during the very
            # overload they signal.
            item.abandoned = True
            with self._lock:
                self.stats["timeouts"] += 1
            raise TimeoutError("enhancement timed out (server overloaded "
                               "or device stalled)")
        if item.error is not None:
            raise item.error
        return item.result

    def _count_request(self, n_samples: int, t0: float) -> None:
        with self._lock:
            self.stats["requests"] += 1
            self.stats["audio_seconds"] += n_samples / self.enh_cfg.stft.fs
            self._latencies.append(time.monotonic() - t0)
            if len(self._latencies) > self._latency_window:
                del self._latencies[:-self._latency_window]

    def _check_scalars(self, n_samples: int, y_source: str | None) -> str:
        """Shared admission validation for submit/submit_stream[_from] —
        raises ValueError (HTTP 400) before any work is queued or any body
        byte beyond the header is read."""
        y_source = y_source or self.cfg.y_source
        if y_source not in _Y_SOURCES:
            raise ValueError(f"bad y_source {y_source!r}")
        if self.conditional and y_source == "self-soft" \
                and self.classify_method is None:
            raise ValueError(f"{self.model_class} has no classifier; use "
                             "y_source ones/zeros")
        limit = self.cfg.max_audio_seconds * self.enh_cfg.stft.fs
        if n_samples > limit:
            raise ValueError(f"request audio {n_samples / self.enh_cfg.stft.fs:.1f}s"
                             f" exceeds the {self.cfg.max_audio_seconds:.0f}s cap")
        if n_samples == 0:
            raise ValueError("empty audio")
        return y_source

    def _check_request(self, wav: np.ndarray,
                       y_source: str | None) -> tuple[np.ndarray, str]:
        y_source = self._check_scalars(len(wav), y_source)
        return np.asarray(wav, np.float32), y_source

    def submit(self, wav: np.ndarray, y_source: str | None = None,
               timeout: float = 900.0,
               _count_stats: bool = True) -> tuple[np.ndarray, np.ndarray]:
        """Enhance one waveform (float, 16 kHz). Blocks until its micro-batch
        returns; raises on worker-side failure. Returns (s_hat, n_hat).

        With ``cfg.chunk_seconds > 0``, longer requests split into
        hop-aligned chunk items riding the same queue (they coalesce with
        other traffic into the fixed compiled buckets) and cross-fade back
        on this thread — the ``max_audio_seconds`` cap stays as the
        admission guard, but any capped length serves in bounded device
        memory."""
        wav, y_source = self._check_request(wav, y_source)
        t0 = time.monotonic()
        chunk_samples = int(self.cfg.chunk_seconds * self.enh_cfg.stft.fs)
        # warmup traffic (_count_stats=False) must hit its bucket in ONE
        # item — chunking it would compile the wrong shapes
        if _count_stats and 0 < chunk_samples < len(wav):
            segs = list(self._stream_chunked(wav, y_source, timeout))
            out = (np.concatenate([s for s, _ in segs]),
                   np.concatenate([n for _, n in segs]))
        else:
            out = self._await(self._admit(wav, y_source, _count_stats),
                              timeout)
        if _count_stats:
            self._count_request(len(wav), t0)
        return out

    def submit_stream(self, wav: np.ndarray, y_source: str | None = None,
                      timeout: float = 900.0):
        """Enhance one waveform INCREMENTALLY: returns a generator of
        ``(s_seg, n_seg)`` float32 pairs, in order, whose concatenations
        are exactly :meth:`submit`'s ``(s_hat, n_hat)``.

        With chunking enabled (``cfg.chunk_seconds > 0``) and a request
        longer than one chunk, each chunk's samples are yielded as soon as
        they FINALIZE under the cross-fade (enhance/longform.py's streaming
        overlap-add) — time-to-first-audio is one chunk's latency instead
        of the whole file's. Short requests (or chunking off) yield exactly
        once. Validation errors raise HERE, before the generator runs or
        anything is admitted; overload/timeout/worker errors raise from the
        generator. Abandoning the generator (``close()`` — e.g. the HTTP
        client disconnected) marks the not-yet-served chunks abandoned so
        the worker never burns device batches for a gone consumer; an
        abandoned request is not counted in request stats (its served
        chunk items are)."""
        wav, y_source = self._check_request(wav, y_source)
        chunk_samples = int(self.cfg.chunk_seconds * self.enh_cfg.stft.fs)

        def run():
            t0 = time.monotonic()
            if 0 < chunk_samples < len(wav):
                yield from self._stream_chunked(wav, y_source, timeout)
            else:
                yield self._await(self._admit(wav, y_source, True), timeout)
            self._count_request(len(wav), t0)
        return run()

    def _admit_chunk_with_retry(self, chunk, y_source: str,
                                deadline: float) -> "_Item":
        """Admission for one chunk of a started long request: transient
        queue-full (concurrent traffic holding the queue) retries with
        backoff until the request's own deadline instead of aborting work
        already done; drain is bypassed (covered by _chunked_inflight)."""
        while True:
            try:
                # count=True: chunk items ARE device work (utterances/
                # batches/busy_seconds); request-level stats are counted
                # once by submit()
                return self._admit(chunk, y_source, True,
                                   bypass_drain=True, count_reject=False)
            except ServiceOverloaded:
                if time.monotonic() >= deadline:
                    with self._lock:
                        self.stats["rejected"] += 1
                    raise
                time.sleep(0.02)

    def _stream_chunked(self, wav, y_source: str, timeout: float):
        """(generator) Long request -> chunk items on the shared queue ->
        incrementally cross-faded (s_seg, n_seg) pairs, yielded as samples
        finalize (enhance/longform.py's streaming overlap-add). ``submit``
        concatenates it, ``submit_stream`` forwards it. Delegates to
        :meth:`_stream_chunked_core` (the ONE chunked implementation) with
        an already-complete buffer — no feeder thread.

        On any failure (or generator close) mid-flight the remaining
        chunks are marked abandoned — the worker drops them instead of
        burning device batches for a caller that already errored out or
        disconnected. A request that started admitting before drain() is
        allowed to finish (drain waits on ``_chunked_inflight``) — SIGTERM
        never truncates it."""
        feed = {"received": len(wav), "error": None}
        yield from self._stream_chunked_core(wav, len(wav), y_source,
                                             timeout, feed,
                                             threading.Condition())

    def submit_stream_from(self, blocks, n_samples: int,
                           y_source: str | None = None,
                           timeout: float = 900.0):
        """FULL-DUPLEX enhancement: :meth:`submit_stream` semantics, but
        the INPUT arrives incrementally too. ``blocks`` is an iterator of
        float32 mono sample blocks (model rate) totaling ``n_samples``.

        With chunking enabled, each chunk is admitted to the device queue
        the moment its samples have arrived (a feeder thread drains
        ``blocks`` so a slow upload never blocks result delivery and a
        busy device never stalls the upload) — on a long request, device
        work on early chunks overlaps the client's upload of the tail, and
        output segments stream back while the body is still being
        received. Upload and compute cost max() instead of sum().

        Validation raises HERE, before ``blocks`` is touched. A feed that
        ends early (fewer samples than promised) raises ValueError from
        the generator; abandonment semantics match :meth:`submit_stream`.
        Without chunking (or for a feed no longer than one chunk) the
        single device item needs the whole signal, so the generator
        buffers the feed and yields once. NOTE: ``timeout`` is ONE shared
        deadline over upload + device work — a client that spends nearly
        all of it uploading surfaces as a device TimeoutError (503) on the
        tail chunks, not as a bad request."""
        y_source = self._check_scalars(int(n_samples), y_source)
        chunk_samples = int(self.cfg.chunk_seconds * self.enh_cfg.stft.fs)

        def run():
            t0 = time.monotonic()
            if 0 < chunk_samples < n_samples:
                yield from self._stream_chunked_from(blocks, n_samples,
                                                     y_source, timeout)
            else:
                buf = _collect_feed(blocks, n_samples)
                yield self._await(self._admit(buf, y_source, True), timeout)
            self._count_request(n_samples, t0)
        return run()

    def _stream_chunked_from(self, blocks, n_samples: int, y_source: str,
                             timeout: float):
        """(generator) Duplex chunking: a feeder thread fills one shared
        float32 buffer left-to-right from ``blocks`` (publishing its write
        frontier under ``cond``) while :meth:`_stream_chunked_core` admits
        each chunk the moment its span is fully buffered. The feeder never
        writes backwards and a span is only admitted once the frontier has
        passed its end, so the worker always reads finalized samples.

        Admission (drain check + inflight count) happens HERE, before the
        feeder thread starts: a request rejected during drain must not
        leave a daemon feeder consuming the request socket behind the 503
        (the handler assumes a pre-stream failure left the body unread)."""
        self._enter_chunked()
        try:
            buf = np.zeros(n_samples, np.float32)
            cond = threading.Condition()
            feed = {"received": 0, "error": None}

            def feeder():
                def publish(got):
                    with cond:
                        feed["received"] = got
                        cond.notify_all()
                try:
                    _feed_into(blocks, buf, n_samples, publish)
                except BaseException as e:  # surface upload failures to the consumer
                    with cond:
                        if feed["error"] is None:
                            feed["error"] = e
                        cond.notify_all()

            threading.Thread(target=feeder, daemon=True,
                             name="stream-feeder").start()
        except BaseException:
            # the count is handed to the core's finally only once the core
            # runs; a failure before that must release it here
            with self._lock:
                self._chunked_inflight -= 1
            raise
        yield from self._stream_chunked_core(buf, n_samples, y_source,
                                             timeout, feed, cond,
                                             preadmitted=True)

    def _enter_chunked(self) -> None:
        """Chunked-request admission: reject while draining, else count the
        request into ``_chunked_inflight`` (drain() waits on it — 'everything
        admitted is answered'). Every successful call must be paired with the
        decrement in :meth:`_stream_chunked_core`'s ``finally``."""
        with self._lock:
            if self._draining:
                raise ServiceOverloaded(
                    "server is draining for shutdown; retry against "
                    "another replica")
            self._chunked_inflight += 1

    def _stream_chunked_core(self, buf, n_samples: int, y_source: str,
                             timeout: float, feed: dict,
                             cond: "threading.Condition",
                             preadmitted: bool = False):
        """(generator) The ONE chunked-request implementation: admits each
        chunk of ``buf`` as soon as (a) its span is below ``feed``'s
        published write frontier, (b) the sliding window has room — then
        awaits/cross-fades/yields (s_seg, n_seg) pairs as samples finalize.
        A complete buffer (``feed['received'] == n_samples``, no feeder)
        degenerates to eager windowed admission with no waiting."""
        from dvae_tpu.enhance.longform import StreamingOverlapAdd, chunk_spans

        if not preadmitted:
            self._enter_chunked()
        items, n_done = [], 0
        try:
            # everything below the admission sits inside the try so the
            # ``finally`` decrement is unconditional — a setup failure must
            # not leave drain() waiting on a request that already died
            stft = self.enh_cfg.stft
            spans = chunk_spans(n_samples, stft.fs, stft.hop,
                                self.cfg.chunk_seconds,
                                min(1.0, self.cfg.chunk_seconds / 4))
            acc_s = StreamingOverlapAdd(spans, n_samples)
            acc_n = StreamingOverlapAdd(spans, n_samples)
            deadline = time.monotonic() + timeout
            # sliding-window admission: at most `window` chunks outstanding,
            # so (a) a request with more chunks than max_queue still serves,
            # and (b) one long request cannot hog the admission queue against
            # concurrent short requests
            window = max(1, min(self.max_queue // 2, 4 * self.cfg.batch_size))

            def admissible(received):
                return (len(items) < len(spans)
                        and len(items) - n_done < window
                        and received >= spans[len(items)][1])

            while n_done < len(spans):
                with cond:
                    while True:
                        if feed["error"] is not None:
                            raise feed["error"]
                        received = feed["received"]
                        # progress = admit a data-complete chunk, or await
                        # an already-admitted one; otherwise wait for bytes
                        if admissible(received) or n_done < len(items):
                            break
                        if not cond.wait(max(0.0, deadline - time.monotonic())):
                            raise TimeoutError(
                                "request body stalled (upload slower than "
                                "the request timeout)")
                while admissible(received):
                    a, b = spans[len(items)]
                    items.append(self._admit_chunk_with_retry(
                        buf[a:b], y_source, deadline))
                if n_done < len(items):
                    s_p, n_p = self._await(
                        items[n_done], max(0.0, deadline - time.monotonic()))
                    n_done += 1
                    seg = (acc_s.add(s_p), acc_n.add(n_p))
                    if len(seg[0]):
                        yield seg
        except BaseException:
            # includes GeneratorExit: a closed consumer abandons its tail
            for it in items:
                if not it.done.is_set():
                    it.abandoned = True
            raise
        finally:
            with self._lock:
                self._chunked_inflight -= 1

    # -- hot reload -----------------------------------------------------------
    def reload_checkpoint(self, path, timeout: float = 60.0) -> None:
        """Swap to a new checkpoint of the SAME model without downtime.

        Loads ``path`` (msgpack or a reference ``.pt``) against the current
        params as template, then hands the swap to the worker thread, which
        applies it BETWEEN device batches — every single-item request is
        answered entirely by one params epoch, and the compiled programs
        are reused (params are per-call arguments,
        :meth:`Enhancer.reload`). A CHUNKED request whose chunks span the
        swap boundary may have its halves answered by the two epochs
        (both valid models; the cross-fade blends them at one seam).
        Raises on structure mismatch or load failure; the running params
        are untouched on any error."""
        from dvae_tpu.train.checkpoint import load_checkpoint

        params = load_checkpoint(path, self.params)
        done = threading.Event()
        swap = {"params": params, "path": str(path), "done": done,
                "error": None}
        with self._lock:
            if self._pending_reload is not None:
                raise RuntimeError("another reload is already in flight")
            self._pending_reload = swap
        if not done.wait(timeout):
            # withdraw the swap so a reported timeout MEANS not-applied
            # (and later reloads aren't blocked by a dead one). If the
            # worker already took it, it is being applied right now —
            # give that a moment rather than lying either way.
            with self._lock:
                if self._pending_reload is swap:
                    self._pending_reload = None
                    raise TimeoutError(
                        "reload not applied in time (device busy?); "
                        "the previous params remain live")
            if not done.wait(5.0):
                raise TimeoutError("reload application stalled mid-swap")
        if swap["error"] is not None:
            raise swap["error"]

    def _apply_pending_reload(self):
        with self._lock:
            swap = self._pending_reload
            self._pending_reload = None
        if swap is None:
            return
        try:
            self.enhancer.reload(swap["params"])
            self.params = swap["params"]   # self-labeling classifier too
            self.checkpoint = swap["path"]
            with self._lock:
                self.stats["reloads"] += 1
        except Exception as e:
            swap["error"] = e
        finally:
            swap["done"].set()

    # -- worker ---------------------------------------------------------------
    def _run(self):
        while not self._stop.is_set():
            self._apply_pending_reload()
            try:
                first = self._q.get(timeout=0.2)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.cfg.batch_window_ms / 1e3
            while len(batch) < self.cfg.batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            live = [it for it in batch if not it.abandoned]
            dropped = len(batch) - len(live)
            if dropped:
                with self._lock:
                    self._unfinished -= dropped
            if live:
                self._process(live)

    def _process(self, batch: list["_Item"]):
        import jax

        t0 = time.monotonic()
        try:
            wavs = [it.wav for it in batch]
            ys = None
            if self.conditional:
                ys = self._labels_for_batch(batch)
            # pad to the FIXED batch size with 1-frame silence so the jitted
            # program's shape is (batch_size, bucket) — no recompile on the
            # number of coinciding requests
            n_pad = self.cfg.batch_size - len(batch)
            if n_pad > 0:
                silence = np.zeros(self.enh_cfg.stft.nfft, np.float32)
                wavs = wavs + [silence] * n_pad
                if ys is not None:
                    ys = ys + [np.zeros((1, self.cfg.y_dim), np.float32)] * n_pad
            with self._lock:
                key_idx = self._batch_counter
                self._batch_counter += 1
            out = self.enhancer.enhance_batch(
                wavs, ys,
                key=jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed),
                                       key_idx))
            for it, (s, n) in zip(batch, out):
                it.result = (s, n)
                it.done.set()
            # warmup batches (count=False) are tracked separately so the
            # cold jit compiles never pollute the serving rtf/throughput
            # counters an operator or autoscaler reads from /stats
            counted = [it for it in batch if it.count]
            with self._lock:
                if counted:
                    self.stats["batches"] += 1
                    self.stats["utterances"] += len(counted)
                    self.stats["busy_seconds"] += time.monotonic() - t0
                else:
                    self.stats["warmup_seconds"] += time.monotonic() - t0
        except Exception as e:  # surface to every waiter, keep serving
            err = EnhancementError(f"enhancement failed: {e}")
            err.__cause__ = e
            for it in batch:
                it.error = err
                it.done.set()
            with self._lock:
                self.stats["failed"] += sum(1 for it in batch if it.count)
        finally:
            with self._lock:
                self._unfinished -= len(batch)

    # -- lifecycle --------------------------------------------------------------
    def warmup(self, buckets=None, timeout: float = 1800.0):
        """Compile the device program for each frame bucket before serving.

        The timeout is deliberately ABOVE submit's serving default: cold
        compiles over a remote-attached chip take minutes, and the tunnel's
        compile path can degrade to ~800 s independently of execution
        (CLAUDE.md 2026-08-19) — startup must outwait that, not die."""
        buckets = tuple(buckets if buckets is not None else self.cfg.warmup_buckets)
        for b in buckets:
            if self._draining:  # shutdown won the race: stand down quietly
                return
            t = samples_for_frames(int(b), self.enh_cfg.stft)
            wav = np.zeros(t, np.float32)
            try:
                self.submit(wav, "zeros" if (self.conditional and
                                             self.classify_method is None)
                            else None, timeout=timeout, _count_stats=False)
            except ServiceOverloaded:
                if self._draining:
                    # drain() flipped between the check and the submit — an
                    # operator stop mid-warmup is a clean exit, not a
                    # warmup failure
                    return
                raise
            self.warm_buckets.append(int(b))

    def warmup_async(self, buckets=None, timeout: float = 1800.0,
                     on_done=None) -> None:
        """Run :meth:`warmup` on a background thread so the HTTP listener
        binds IMMEDIATELY: over a remote-attached chip the cold compiles
        take minutes, and a blocking warmup leaves the port unbound that
        whole time (load balancers see connection-refused, not a health
        state). With this, /healthz answers "warming" from the first
        second, requests admit and queue normally behind the warmup items
        (they are served once their bucket compiles — or 503 at their own
        deadline), and ``ready`` flips only when every bucket is warm.

        A warmup failure means the model cannot run at all: it lands in
        ``warmup_error`` (healthz status "warmup failed"), ``ready`` stays
        unset, and ``on_done(error)`` lets the caller decide to exit."""
        self.ready.clear()

        def run():
            err = None
            try:
                self.warmup(buckets, timeout)
            except Exception as e:  # surface via healthz + on_done
                err = e
                self.warmup_error = e
            else:
                self.ready.set()
            if on_done is not None:
                on_done(err)

        threading.Thread(target=run, daemon=True, name="warmup").start()

    def drain(self, timeout: float = 600.0) -> bool:
        """Graceful shutdown: stop admitting (new ``submit``s raise
        ``ServiceOverloaded`` -> HTTP 503, the load-balancer signal), wait
        for every already-admitted request to be answered, then stop the
        worker. Returns False if in-flight work outlived ``timeout``
        (the worker is stopped regardless)."""
        self._draining = True
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            with self._lock:
                # chunked requests that started admitting before the flag
                # flipped keep admitting their remaining chunks
                # (bypass_drain) — wait for them too
                if self._unfinished == 0 and self._chunked_inflight == 0:
                    break
            time.sleep(0.05)
        with self._lock:
            drained = self._unfinished == 0 and self._chunked_inflight == 0
        self.close()
        return drained

    def stats_snapshot(self) -> dict:
        """Counters + live gauges as one consistent dict (the /stats body):
        the cumulative ``stats`` counters, ``pending`` (admitted but not yet
        answered — live queue pressure), ``rtf`` (busy/audio seconds), and a
        p50/p90/p99 latency summary over the last ``latency_window``
        requests."""
        with self._lock:
            stats = dict(self.stats)
            lat = list(self._latencies)
            stats["pending"] = self._unfinished
        stats["rtf"] = (round(stats["busy_seconds"] / stats["audio_seconds"], 5)
                        if stats["audio_seconds"] else None)
        if lat:
            q = np.quantile(lat, [0.5, 0.9, 0.99])
            stats["latency_seconds"] = {
                "p50": round(float(q[0]), 4), "p90": round(float(q[1]), 4),
                "p99": round(float(q[2]), 4),
                "mean": round(float(np.mean(lat)), 4),
                "window": len(lat)}
        return stats

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)


class _Item:
    __slots__ = ("wav", "y_source", "done", "result", "error", "count",
                 "abandoned")

    def __init__(self, wav, y_source, count=True):
        self.wav = wav
        self.y_source = y_source
        self.done = threading.Event()
        self.result = None
        self.error = None
        self.count = count        # False for warmup traffic (stats-exempt)
        self.abandoned = False    # set by a timed-out waiter; worker drops it


# -- HTTP layer ----------------------------------------------------------------


def _wav_bytes(channels: list[np.ndarray], fs: int) -> bytes:
    """Float waveform(s) -> in-memory 16-bit PCM RIFF. Delegates to
    data.io.write_wav (scipy accepts file-like targets), so the PCM
    quantization contract has exactly one implementation."""
    from dvae_tpu.data.io import write_wav

    x = channels[0] if len(channels) == 1 else np.stack(channels, axis=-1)
    buf = _io.BytesIO()
    write_wav(buf, x, fs)
    return buf.getvalue()


def _riff_header(data_bytes: int, n_channels: int, fs: int) -> bytes:
    """The 44-byte PCM16 RIFF/WAVE header (same layout scipy writes) with
    the final sizes — streaming responses know their exact output length
    up front (= input samples at the model rate), so the wire carries a
    fully standard wav, not a 0xFFFFFFFF streaming hack."""
    import struct

    return (b"RIFF" + struct.pack("<I", 36 + data_bytes) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_channels, fs,
                                    fs * 2 * n_channels, 2 * n_channels, 16)
            + b"data" + struct.pack("<I", data_bytes))


def _pcm_seg_bytes(seg: tuple[np.ndarray, np.ndarray], want: str) -> bytes:
    """One streamed (s_seg, n_seg) pair -> wire PCM16 bytes (stereo
    interleaves speech/noise per frame, like the one-shot response)."""
    from dvae_tpu.data.io import pcm16

    s, n = seg
    if want == "speech":
        x = pcm16(s)
    elif want == "noise":
        x = pcm16(n)
    else:
        x = np.stack([pcm16(s), pcm16(n)], axis=-1)
    return x.astype("<i2").tobytes()


def _parse_wav_bytes(body: bytes) -> tuple[np.ndarray, int]:
    """RIFF bytes -> (float64 mono samples in [-1, 1), rate) via
    data.io.read_wav; multi-channel inputs are downmixed like
    enhance_wav.py."""
    from dvae_tpu.data.io import read_wav

    data, fs = read_wav(_io.BytesIO(body))
    if data.ndim > 1:
        data = data.mean(axis=-1)
    return data, int(fs)


def _feed_into(blocks, buf: np.ndarray, n_samples: int,
               on_progress=None) -> None:
    """Accumulate a sample-block feed into ``buf`` left-to-right (float32
    ravel, clamp past n_samples), calling ``on_progress(got)`` after each
    block; raises ValueError if the feed ends before ``n_samples``. The
    one feed-accumulation contract shared by the duplex feeder thread and
    the buffered no-chunking path."""
    got = 0
    for blk in blocks:
        blk = np.asarray(blk, np.float32).ravel()
        take = min(len(blk), n_samples - got)
        buf[got:got + take] = blk[:take]
        got += take
        if on_progress is not None:
            on_progress(got)
        if got >= n_samples:
            return
    raise ValueError(f"request body ended early: got {got} of "
                     f"{n_samples} samples")


def _collect_feed(blocks, n_samples: int) -> np.ndarray:
    """Gather a sample-block feed into one float32 buffer (the no-chunking
    path of submit_stream_from: a single device item needs the whole
    signal before admission)."""
    buf = np.zeros(n_samples, np.float32)
    _feed_into(blocks, buf, n_samples)
    return buf


# PCM encodings the duplex path can decode incrementally, as
# (format_code, bits_per_sample): 1 = integer PCM, 3 = IEEE float. 24-bit
# and exotic codecs fall back to the buffered scipy parser.
_STREAMABLE_PCM = {(1, 8), (1, 16), (1, 32), (3, 32), (3, 64)}


def _riff_stream_info(rfile, remaining: int):
    """Incrementally parse a RIFF prefix up to the START of the 'data'
    payload, reading nothing beyond it.

    Returns ``(consumed, info)``: ``consumed`` is every byte read (a
    caller that decides not to stream reassembles the body as
    ``consumed + rest`` for the buffered parser) and ``info`` is ``None``
    when the prefix is not an incrementally-decodable PCM wav, else a dict
    of ``fmt``/``bits``/``channels``/``fs``/``data_bytes``. ``data_bytes``
    is bounded by both the data-chunk size and the request's remaining
    Content-Length — writers that emit wavs as they record leave the
    RIFF/data sizes 0 or 0xFFFFFFFF, which resolves to the HTTP length."""
    import struct

    out = bytearray()

    def take(n: int) -> bytes:
        nonlocal remaining
        n = min(n, remaining)
        raw = rfile.read(n) if n > 0 else b""
        out.extend(raw)
        remaining -= len(raw)
        if len(raw) < n:
            raise EOFError
        return raw

    try:
        head = take(12)
        if len(head) < 12 or head[:4] != b"RIFF" or head[8:12] != b"WAVE":
            return bytes(out), None
        fmt = None
        while True:
            cid, size = struct.unpack("<4sI", take(8))
            if cid == b"fmt ":
                body = take(size + (size & 1))
                fmt_code, channels, fs = struct.unpack("<HHI", body[:8])
                bits = struct.unpack("<H", body[14:16])[0]
                if fmt_code == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                    fmt_code = struct.unpack("<H", body[24:26])[0]
                fmt = (fmt_code, channels, fs, bits)
            elif cid == b"data":
                if fmt is None:
                    return bytes(out), None
                fmt_code, channels, fs, bits = fmt
                if (fmt_code, bits) not in _STREAMABLE_PCM or channels < 1:
                    return bytes(out), None
                data_bytes = size if 0 < size < 0xFFFFFFFF else remaining
                return bytes(out), {
                    "fmt": fmt_code, "bits": bits, "channels": channels,
                    "fs": int(fs), "data_bytes": min(data_bytes, remaining)}
            else:  # LIST/fact/JUNK/...: buffer and move on (word-aligned)
                take(size + (size & 1))
    except (EOFError, struct.error):
        return bytes(out), None


def _pcm_to_float_mono(raw: bytes, fmt_code: int, bits: int,
                       channels: int) -> np.ndarray:
    """Decode whole PCM frames exactly like the buffered path
    (data.io.read_wav + channel downmix + float32 cast): integer PCM
    scales by 1/2**(bits-1) in float64, uint8 offsets by 128,
    multi-channel downmixes by mean, then casts to float32."""
    if fmt_code == 3:
        x = np.frombuffer(raw, "<f4" if bits == 32 else "<f8").astype(np.float64)
    elif bits == 16:
        x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif bits == 32:
        x = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    else:  # (1, 8): unsigned with a 128 offset, like scipy reads it
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=-1)
    return x.astype(np.float32)


_PROM_COUNTERS = (
    # (stats key, metric name, help) — cumulative-since-start counters
    ("requests", "dvae_requests_total", "Answered enhancement requests"),
    ("failed", "dvae_requests_failed_total", "Requests answered with an error"),
    ("rejected", "dvae_requests_rejected_total",
     "Requests refused at admission (queue full or draining)"),
    ("timeouts", "dvae_requests_timeout_total",
     "Requests abandoned by their waiter before the device answered"),
    ("batches", "dvae_device_batches_total", "Device batches dispatched"),
    ("utterances", "dvae_utterances_total",
     "Utterances/chunks enhanced (>= requests under chunking)"),
    ("reloads", "dvae_checkpoint_reloads_total", "Hot checkpoint swaps applied"),
    ("audio_seconds", "dvae_audio_seconds_total", "Audio seconds enhanced"),
    ("busy_seconds", "dvae_device_busy_seconds_total",
     "Wall seconds the worker spent on device batches"),
    ("warmup_seconds", "dvae_warmup_seconds_total",
     "Wall seconds spent compiling/warming buckets"),
)


def _prometheus_text(svc: EnhanceService) -> str:
    """The /stats counters in Prometheus text exposition format (0.0.4).

    Same numbers as ``stats_snapshot`` — counters as counters, live queue
    pressure / readiness / RTF as gauges, and the rolling-window latency
    quantiles as quantile-labelled gauges (the window is a ring buffer of
    the last ``latency_window`` requests, not a cumulative summary, so a
    true summary type would be a lie)."""
    st = svc.stats_snapshot()
    out = []
    for key, name, help_ in _PROM_COUNTERS:
        out.append(f"# HELP {name} {help_}.")
        out.append(f"# TYPE {name} counter")
        out.append(f"{name} {st[key]}")
    out.append("# HELP dvae_pending_requests Admitted but not yet answered.")
    out.append("# TYPE dvae_pending_requests gauge")
    out.append(f"dvae_pending_requests {st['pending']}")
    out.append("# HELP dvae_ready 1 once warmup finished (readiness probe).")
    out.append("# TYPE dvae_ready gauge")
    out.append(f"dvae_ready {int(svc.ready.is_set())}")
    if st["rtf"] is not None:
        out.append("# HELP dvae_rtf Device real-time factor "
                   "(busy seconds per audio second).")
        out.append("# TYPE dvae_rtf gauge")
        out.append(f"dvae_rtf {st['rtf']}")
    lat = st.get("latency_seconds")
    if lat:
        name = "dvae_request_latency_seconds"
        out.append(f"# HELP {name} Request latency over the last "
                   f"{lat['window']} requests (rolling window).")
        out.append(f"# TYPE {name} gauge")
        for q, k in (("0.5", "p50"), ("0.9", "p90"), ("0.99", "p99")):
            out.append(f'{name}{{quantile="{q}"}} {lat[k]}')
        out.append(f"{name}_window {lat['window']}")
    out.append("# HELP dvae_uptime_seconds Seconds since service start.")
    out.append("# TYPE dvae_uptime_seconds gauge")
    out.append(f"dvae_uptime_seconds {round(time.time() - svc.started, 1)}")
    return "\n".join(out) + "\n"


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
        self.end_headers()
        self.wfile.write(body)

    def _json(self, code: int, obj, headers=()):
        self._send(code, json.dumps(obj).encode(), "application/json",
                   headers)

    def _body_length(self):
        """Parsed Content-Length, or None after answering 400 (a malformed
        header must not crash the handler thread)."""
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
        the next request on this HTTP/1.1 keep-alive connection."""
        self.close_connection = True
        self._json(code, obj, headers)

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
                "model_class": svc.model_class,
                "platform": jax.devices()[0].platform,
                "warm_buckets": svc.warm_buckets,
                "checkpoint": svc.checkpoint,
                "uptime_seconds": round(time.time() - svc.started, 1),
            }
            if svc.warmup_error is not None:
                body["warmup_error"] = str(svc.warmup_error)
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


def make_server(service: EnhanceService, host: str = "127.0.0.1",
                port: int = 0, verbose: bool = False,
                admin_token: str | None = None) -> ThreadingHTTPServer:
    """A ThreadingHTTPServer bound to ``service`` (port 0 = auto-assign;
    the chosen port is ``server.server_address[1]``). Call
    ``serve_forever()`` (blocking) or drive it from a thread in tests.
    ``admin_token`` gates POST /reload (pass ?token=...) — set it whenever
    the bind address is not loopback, since /reload loads
    operator-supplied filesystem paths."""
    handler = type("BoundHandler", (RequestHandler,),
                   {"service": service, "admin_token": admin_token})
    if verbose:
        handler.log_message = BaseHTTPRequestHandler.log_message
    server = ThreadingHTTPServer((host, port), handler)
    # NON-daemon handler threads: server_close() joins them, so process
    # exit after a drain cannot truncate a response still being written to
    # a slow client (the handler `timeout` bounds the join)
    server.daemon_threads = False
    return server
