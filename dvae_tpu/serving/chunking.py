"""Chunked / streaming request handling for :class:`EnhanceService` —
split out as a mixin so the queue/worker core (service.py) and the
long-request decomposition logic read independently. Everything here
rides the service's admission queue and locks; no state of its own
beyond the ``_chunked_inflight`` counter the service initializes.

Mechanism: a long request is decomposed into hop-aligned, EQUAL-length
chunk spans (enhance/longform.py's ``chunk_spans`` — every chunk shares
one compiled bucket, so the path is recompile-free for any length), the
chunks ride the SAME micro-batch queue as short requests, and the
results cross-fade back together on the caller's thread with samples
yielded as they finalize."""

from __future__ import annotations

import threading
import time

import numpy as np

from dvae_tpu.serving.wire import _collect_feed, _feed_into


class _ChunkedStreamingMixin:
    """The chunked-request half of EnhanceService (see service.py for the
    attributes this relies on: ``_admit``/``_await``/``_lock``/``cfg``/
    ``enh_cfg``/``max_queue``/``stats``/``_chunked_inflight``)."""

    def _admit_chunk_with_retry(self, chunk, y_source: str,
                                deadline: float) -> "object":
        """Admission for one chunk of a started long request: transient
        queue-full (concurrent traffic holding the queue) retries with
        backoff until the request's own deadline instead of aborting work
        already done; drain is bypassed (covered by _chunked_inflight)."""
        from dvae_tpu.serving.types import ServiceOverloaded

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
        from dvae_tpu.serving.types import ServiceOverloaded

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
