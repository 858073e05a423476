"""Persistent enhancement service: warm compiled engine, micro-batched HTTP.

Beyond-reference serving surface. The reference's deployment story is "run
the eval script over the corpus tree" — a cold process per sweep
(evaluate_ntcd_M1.py:222-259); `scripts/enhance_wav.py` gives dvae-tpu a
one-shot CLI over arbitrary wavs, but every invocation still pays the cold
jit compile (~minutes over a remote-attached chip). This package keeps ONE
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

Wire protocol (see ``http.RequestHandler``):
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

Package layout (split for maintainability; this __init__ re-exports the
whole public surface so ``dvae_tpu.serving`` keeps its historical names):

  service.py   EnhanceService core — queue, worker, reload, warmup, drain
  chunking.py  long-request decomposition / streaming / full-duplex mixin
  http.py      RequestHandler + make_server (wire status mapping)
  wire.py      RIFF/PCM encode/decode + feed accumulation
  metrics.py   Prometheus text exposition of the stats snapshot
  boot.py      boot-phase ledger + early port bind (stdlib-only)

Re-exports are LAZY (PEP 562): ``boot.py`` must be importable before the
heavy jax/flax stack loads (serve.py binds its port off it within ~1 s of
exec), so this __init__ cannot eagerly import the submodules that pull
jax in. ``from dvae_tpu.serving import EnhanceService`` still works —
resolved on first attribute access."""

_EXPORTS = {
    "RequestHandler": "http", "make_server": "http",
    "_PROM_COUNTERS": "metrics", "_prometheus_text": "metrics",
    "EnhancementError": "service", "EnhanceService": "service",
    "ServeConfig": "service", "ServiceOverloaded": "service",
    "_Item": "service", "_Y_SOURCES": "service",
    "_collect_feed": "wire", "_feed_into": "wire",
    "_parse_wav_bytes": "wire", "_pcm_seg_bytes": "wire",
    "_pcm_to_float_mono": "wire", "_riff_header": "wire",
    "_riff_stream_info": "wire", "_wav_bytes": "wire",
    "_STREAMABLE_PCM": "wire",
    "BootTimer": "boot", "bind_boot_server": "boot",
    "attach_service": "boot",
}

__all__ = [
    "EnhanceService", "ServeConfig", "ServiceOverloaded", "EnhancementError",
    "RequestHandler", "make_server",
    "BootTimer", "bind_boot_server", "attach_service",
]


def __getattr__(name):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(f"{__name__}.{mod}"), name)


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
