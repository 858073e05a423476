"""The serving core: :class:`EnhanceService` — warm compiled engine,
admission queue, micro-batching worker, hot reload, warmup, drain.
Long-request chunking/streaming lives in chunking.py (mixed in); the
HTTP layer in http.py; wire formats in wire.py; Prometheus text in
metrics.py. ``dvae_tpu.serving``'s package __init__ re-exports the
public names, so importers never see this layout."""

from __future__ import annotations

import queue
import threading
import time

import numpy as np

from dvae_tpu.enhance.labeling import (classify_method_of, constant_labels,
                                       self_soft_labels)
from dvae_tpu.enhance.pipeline import Enhancer, EnhancerConfig
from dvae_tpu.ops.stft import n_stft_frames_clamped, samples_for_frames
from dvae_tpu.serving.chunking import _ChunkedStreamingMixin
from dvae_tpu.serving.types import (EnhancementError, ServeConfig,
                                    ServiceOverloaded, _Item,
                                    _Y_SOURCES)


class EnhanceService(_ChunkedStreamingMixin):
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
        self._warmup_inflight = 0        # the count=False subset: warmup
        #                                  traffic is stats-exempt, so the
        #                                  /stats pending gauge excludes it
        self._chunked_inflight = 0       # chunked requests mid-admission
        self.started = time.time()
        self.ready = threading.Event()   # cleared only by warmup_async
        self.ready.set()
        self.warmup_error: Exception | None = None
        self.warm_buckets: list[int] = []
        self.warmed = True               # False between warmup_async start
        #                                  and its completed executions
        self.ready_via_aot = False       # ready flipped by the AOT restore
        #                                  probe before warmup finished
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
            if not count:
                self._warmup_inflight += 1
        try:
            self._q.put_nowait(item)
        except queue.Full:
            with self._lock:
                self._unfinished -= 1
                if not count:
                    self._warmup_inflight -= 1
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
        """The micro-batching worker loop, with 2-DEEP PIPELINED DISPATCH:
        while batch k's device program runs, batch k+1 is assembled,
        labeled, and DISPATCHED before k's results are collected — under
        sustained load the per-dispatch link RTT (~25 ms on a
        remote-attached chip — ~33% of a PEEM batch, ~7% of MCEM) hides
        behind device compute instead of serializing between batches. With
        no follow-up traffic the in-flight batch is collected immediately,
        so an isolated request pays zero extra latency. Disable with
        ``cfg.pipeline_dispatch=False`` (strictly sequential, the
        pre-pipelining behavior)."""
        pending = None  # (live_items, dispatch_handle, t0) in flight
        while not self._stop.is_set():
            # reloads apply BETWEEN dispatches: a pending batch already
            # bound the old params at its dispatch, so every request is
            # still answered by exactly one params epoch
            self._apply_pending_reload()
            batch = self._gather_batch(block=pending is None)
            nxt = self._dispatch_batch(batch) if batch else None
            if pending is not None:
                self._finish_batch(*pending)
            pending = nxt
            if pending is not None and not self.cfg.pipeline_dispatch:
                self._finish_batch(*pending)
                pending = None
        if pending is not None:  # stop raced an in-flight batch: answer it
            self._finish_batch(*pending)

    def _gather_batch(self, block: bool) -> list["_Item"]:
        """Drain up to ``batch_size`` live items (micro-batch window).
        ``block=False`` (a batch is already in flight) polls instead of
        waiting so the in-flight batch's results are never delayed."""
        try:
            first = self._q.get(timeout=0.2) if block else self._q.get_nowait()
        except queue.Empty:
            return []
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
        dropped = [it for it in batch if it.abandoned]
        if dropped:
            with self._lock:
                self._unfinished -= len(dropped)
                self._warmup_inflight -= sum(
                    1 for it in dropped if not it.count)
        return live

    def _dispatch_batch(self, batch: list["_Item"]):
        """Label + pad + DISPATCH one batch (async); returns the in-flight
        (batch, handle, t0) triple, or None if dispatch itself failed (the
        waiters are answered with the error here)."""
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
                pad_wavs, pad_ys = self._pad_fillers(n_pad)
                wavs = wavs + pad_wavs
                if ys is not None:
                    ys = ys + pad_ys
            with self._lock:
                key_idx = self._batch_counter
                self._batch_counter += 1
            handle = self.enhancer.dispatch(
                wavs, ys,
                key=jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed),
                                       key_idx))
            return batch, handle, t0
        except Exception as e:
            self._fail_batch(batch, e)
            with self._lock:
                self._unfinished -= len(batch)
                self._warmup_inflight -= sum(
                    1 for it in batch if not it.count)
            return None

    def _finish_batch(self, batch: list["_Item"], handle, t0: float) -> None:
        """Collect a dispatched batch's results and answer its waiters.
        ``busy_seconds`` spans dispatch-start -> results-fetched per batch;
        under pipelining consecutive spans overlap by design (the sum can
        exceed wall time at full load — it measures device occupancy
        pressure, not wall)."""
        try:
            out = self.enhancer.collect(handle)
            for it, (s, n) in zip(batch, out):
                it.result = (s, n)
                it.done.set()
            # warmup batches (count=False) are tracked separately so the
            # cold jit compiles never pollute the serving rtf/throughput
            # counters an operator or autoscaler reads from /stats. A
            # MIXED batch (a client request coalesced into a warmup
            # item's window) charges its span to warmup_seconds too: the
            # span is dominated by the cold compile, and minutes of it in
            # busy_seconds would wreck the rtf the gauge exists for.
            counted = [it for it in batch if it.count]
            span = time.monotonic() - t0
            with self._lock:
                if counted:
                    self.stats["batches"] += 1
                    self.stats["utterances"] += len(counted)
                if len(counted) == len(batch):
                    self.stats["busy_seconds"] += span
                else:
                    self.stats["warmup_seconds"] += span
        except Exception as e:
            self._fail_batch(batch, e)
        finally:
            with self._lock:
                self._unfinished -= len(batch)
                self._warmup_inflight -= sum(
                    1 for it in batch if not it.count)

    def _fail_batch(self, batch: list["_Item"], e: Exception) -> None:
        """Answer every waiter of a failed batch with an EnhancementError
        (worker-side fault -> HTTP 500) and count it; keep serving."""
        err = EnhancementError(f"enhancement failed: {e}")
        err.__cause__ = e
        for it in batch:
            it.error = err
            it.done.set()
        with self._lock:
            self.stats["failed"] += sum(1 for it in batch if it.count)

    # -- lifecycle --------------------------------------------------------------
    def warmup(self, buckets=None, timeout: float = 1800.0):
        """Compile the device program for each frame bucket before serving.

        The timeout is deliberately ABOVE submit's serving default: cold
        compiles over a remote-attached chip take minutes, and the tunnel's
        compile path can degrade to ~800 s independently of execution
        (CLAUDE.md 2026-08-19) — startup must outwait that, not die."""
        buckets = tuple(buckets if buckets is not None else self.cfg.warmup_buckets)
        deadline = time.monotonic() + timeout
        for b in buckets:
            t = samples_for_frames(int(b), self.enh_cfg.stft)
            wav = np.zeros(t, np.float32)
            while True:
                if self._draining:  # shutdown won the race: stand down
                    return
                try:
                    self.submit(wav, "zeros" if (self.conditional and
                                                 self.classify_method is None)
                                else None,
                                timeout=max(1.0, deadline - time.monotonic()),
                                _count_stats=False)
                    break
                except ServiceOverloaded:
                    if self._draining:
                        # drain() flipped between the check and the submit
                        # — an operator stop mid-warmup is a clean exit,
                        # not a warmup failure
                        return
                    # the admission queue is full of CLIENT traffic (they
                    # admit during warmup by design) — that is load, not a
                    # broken model, and a fatal warmup_error here would
                    # let client traffic shut the server down
                    # (serve.py exits nonzero on warmup failure). Retry
                    # until the warmup deadline.
                    if time.monotonic() >= deadline:
                        raise
                    time.sleep(0.2)
            self.warm_buckets.append(int(b))

    def aot_restored(self, buckets=None) -> bool:
        """True iff the AOT cache restores an executable for EVERY warmup
        bucket's exact device program — by constructing each bucket's
        warmup batch (same silence padding / label shapes the worker
        builds) and running :meth:`Enhancer.aot_probe` on it. Pure
        host+runtime deserialization: no device program executes, so this
        cannot be blocked by a degraded tunnel's execute path. The
        restored executables are staged; their first real dispatch still
        pays the one-shot run-to-completion validation."""
        if not getattr(self.enhancer, "_aot_enabled", False):
            return False
        buckets = tuple(buckets if buckets is not None
                        else self.cfg.warmup_buckets)
        if not buckets:
            return False
        for b in buckets:
            t = samples_for_frames(int(b), self.enh_cfg.stft)
            pad_wavs, pad_ys = self._pad_fillers(self.cfg.batch_size - 1)
            wavs = [np.zeros(t, np.float32)] + pad_wavs
            ys = None
            if self.conditional:
                ys = [np.zeros((1, self.cfg.y_dim), np.float32)] + pad_ys
            if not self.enhancer.aot_probe(wavs, ys):
                return False
        return True

    def _pad_fillers(self, n: int):
        """The (wav, label) fillers a short batch is padded with — ONE
        definition shared by the worker (:meth:`_dispatch_batch`) and the
        AOT restore probe (:meth:`aot_restored`), because the probe's
        whole correctness is byte-for-byte signature equivalence with
        what the worker later dispatches: a filler change that touched
        only one of the two would silently desynchronize them."""
        wavs = [np.zeros(self.enh_cfg.stft.nfft, np.float32)] * n
        ys = ([np.zeros((1, self.cfg.y_dim), np.float32)] * n
              if self.conditional else None)
        return wavs, ys

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
        unset, and ``on_done(error)`` lets the caller decide to exit.

        With ``cfg.ready_on_aot`` and an AOT cache that restores an
        executable for EVERY bucket (:meth:`aot_restored`), ``ready``
        flips IMMEDIATELY — host-side deserialization only — and
        ``warmed`` stays False until the background warmup's executions
        (which also validate the restored blobs) complete. A warmup
        failure in that mode WITHDRAWS readiness: the restored programs
        demonstrably cannot run."""
        self.ready.clear()
        self.warmed = False
        self.ready_via_aot = False
        if self.cfg.ready_on_aot and self.aot_restored(buckets):
            self.ready_via_aot = True
            self.ready.set()

        def run():
            err = None
            try:
                self.warmup(buckets, timeout)
            except Exception as e:  # surface via healthz + on_done
                err = e
                self.warmup_error = e
                self.ready.clear()  # withdraw an aot-granted ready: the
                #                     restored programs cannot actually run
                self.ready_via_aot = False  # and stop advertising the
                #                     restore as the readiness source
            else:
                self.warmed = True
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
            # warmup items are stats-exempt everywhere else; excluding
            # them here keeps a cold boot from showing phantom queue
            # pressure to an autoscaler for the whole compile
            stats["pending"] = self._unfinished - self._warmup_inflight
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
        # Answer everything still queued: each item's waiter is a
        # NON-daemon HTTP handler thread blocked in _await — without this
        # it sits out its full submit timeout (900 s default) after the
        # worker is gone, and server_close() joins those threads, hanging
        # process exit for minutes after a drain-timeout shutdown.
        leftovers = []
        while True:
            try:
                leftovers.append(self._q.get_nowait())
            except queue.Empty:
                break
        if leftovers:
            err = EnhancementError(
                "server closed before this request was served")
            for it in leftovers:
                it.error = err
                it.done.set()
            with self._lock:
                self._unfinished -= len(leftovers)
                self._warmup_inflight -= sum(
                    1 for it in leftovers if not it.count)
                self.stats["failed"] += sum(
                    1 for it in leftovers if it.count)

