#!/usr/bin/env python
"""Persistent enhancement server — the warm-engine deployment surface.

`enhance_wav.py` is the one-shot CLI; every invocation pays the cold jit
compile (~minutes over a remote-attached chip). This daemon binds the chip
once and pre-compiles the MCEM program for the expected utterance-length
buckets IN THE BACKGROUND — the port binds immediately, /healthz reports
"warming" (ready:false) until every bucket is compiled, and requests
arriving mid-warmup queue behind the warmup items. It serves enhancement
over plain HTTP with micro-batching:
concurrent requests are merged into fixed-size device batches (padded with
silence), so the compiled program is reused forever and overlapping
traffic fills the MXU instead of running at batch-1. See
dvae_tpu/serving.py for the protocol; the reference has no serving story
at all (its eval scripts walk the corpus tree, evaluate_ntcd_M1.py).

    python scripts/serve.py --model-dir models/ntcd_M1_... --port 8571
    curl -s --data-binary @noisy.wav 'localhost:8571/enhance' > s_est.wav
    curl -s --data-binary @noisy.wav 'localhost:8571/enhance?return=stereo' \\
        > both.wav   # ch0 speech + ch1 noise, sums to the input
    curl -sN --data-binary @long.wav 'localhost:8571/enhance?stream=1' \\
        | aplay      # with --chunk-seconds: the (standard, exact-length)
                     # wav body STREAMS as chunks finalize — first audio
                     # after one chunk's latency, not the whole file's
    curl -s localhost:8571/healthz; curl -s localhost:8571/stats
    curl -s localhost:8571/metrics   # same counters, Prometheus text format
    curl -s -X POST 'localhost:8571/reload?checkpoint=/path/M1_...msgpack'
        # hot-swap to a newer checkpoint of the same model: zero downtime,
        # zero recompiles (params are per-call args of the warm programs)
"""

import argparse

from _lib import (add_mcem_budgets, add_model_family, load_family_model,
                  make_mesh_if, maybe_force_platform, mcem_config_of)


def main():
    # BootTimer first: it anchors at the PROCESS start (/proc starttime),
    # so the interpreter+light-import segment is measured, not lost.
    # boot.py is stdlib-only — importing it costs nothing.
    from dvae_tpu.serving.boot import (BootTimer, attach_service,
                                       bind_boot_server)

    boot = BootTimer()
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    add_model_family(ap)
    add_mcem_budgets(ap)
    ap.add_argument("--host", default="127.0.0.1",
                    help="bind address (0.0.0.0 to accept remote clients)")
    ap.add_argument("--port", type=int, default=8571)
    ap.add_argument("--batch-size", type=int, default=8,
                    help="fixed device batch; concurrent requests micro-"
                         "batch up to this, the rest is silence padding")
    ap.add_argument("--batch-window-ms", type=float, default=25.0,
                    help="max wait to fill a micro-batch before dispatching")
    ap.add_argument("--y-source", default="self-soft",
                    choices=["self-soft", "ones", "zeros"],
                    help="default labels for conditional classes (per-request "
                         "override via ?y_source=...)")
    ap.add_argument("--std-norm", action="store_true",
                    help="the model was trained with --std-norm; requires "
                         "--norm-h5")
    ap.add_argument("--norm-h5", default=None)
    ap.add_argument("--warmup-buckets", type=int, nargs="*", default=[64, 256],
                    help="frame buckets (multiples of 64) to pre-compile "
                         "before accepting traffic; 64 frames = 1 s, 256 = "
                         "4.1 s of audio. Empty = no warmup (first requests "
                         "pay the compiles)")
    ap.add_argument("--max-audio-seconds", type=float, default=600.0)
    ap.add_argument("--chunk-seconds", type=float, default=0.0,
                    help=">0: requests longer than this split into chunk "
                         "items on the same micro-batch queue (fixed "
                         "compiled buckets, bounded device memory) and "
                         "cross-fade back — lets --max-audio-seconds rise "
                         "without growing the device footprint")
    ap.add_argument("--max-queue", type=int, default=64,
                    help="admission cap: pending requests beyond this are "
                         "rejected with 503 + Retry-After instead of "
                         "building unbounded backlog")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard each device batch over all visible devices")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--no-jit-cache", action="store_true")
    ap.add_argument("--aot-cache", default=None, metavar="DIR",
                    help="directory of Ahead-Of-Time-serialized device "
                         "executables: warmup saves each bucket's compiled "
                         "program there, and the NEXT boot restores it "
                         "instead of recompiling — the cold-boot fix for "
                         "remote-attached chips where the HLO jit cache "
                         "does not help a fresh process. Keyed by the full "
                         "program identity (jax/backend/config/shapes); "
                         "stale entries fall back to compiling. Blobs are "
                         "unpickled: use an operator-controlled directory "
                         "(same trust as --checkpoint). Ignored with "
                         "--data-parallel")
    ap.add_argument("--ready-on-aot-validate", action="store_true",
                    help="with --aot-cache: report ready on /healthz as "
                         "soon as every warmup bucket's executable has "
                         "RESTORED from the AOT cache (host-side "
                         "deserialization, seconds) instead of waiting "
                         "for the warmup EXECUTIONS a degraded tunnel "
                         "can hold hostage for minutes. /healthz carries "
                         "warmed:false until the background warmup "
                         "finishes (it also validates the restored "
                         "blobs); the first requests pay the device "
                         "touch they would have paid cold anyway. A "
                         "warmup failure withdraws readiness.")
    ap.add_argument("--admin-token", default=None,
                    help="require ?token=<value> on POST /reload — set this "
                         "whenever --host is not loopback (/reload loads "
                         "operator-supplied checkpoint paths)")
    ap.add_argument("--verbose", action="store_true",
                    help="log every HTTP request")
    args = ap.parse_args()
    if not (args.checkpoint or args.model_dir):
        ap.error("need --checkpoint or --model-dir")
    if args.std_norm and not args.norm_h5:
        ap.error("--std-norm requires --norm-h5")
    if args.ready_on_aot_validate and not args.aot_cache:
        ap.error("--ready-on-aot-validate needs --aot-cache DIR (there is "
                 "nothing to restore readiness from without one)")
    if args.model_class in ("m2", "m2v2") and args.y_source == "self-soft":
        ap.error(f"{args.model_class} has no classifier; use --y-source "
                 "ones/zeros")

    # Bind the listening socket NOW — before the heavy imports, before any
    # backend touch. A readiness probe sees {"status": "booting", phases}
    # within ~1 s of exec instead of connection-refused for the whole boot
    # (round-3: 20-22.6 s of unexplained bind_s on a chip restart).
    server = bind_boot_server(args.host, args.port, boot)

    with boot.phase("platform_select"):
        maybe_force_platform(args)           # first `import jax`

    with boot.phase("imports"):
        from dvae_tpu.enhance.pipeline import EnhancerConfig
        from dvae_tpu.serving import EnhanceService, ServeConfig

        from _lib import norm_stats_if, warn_peem_family

    warn_peem_family(args, args.model_class, args.y_dim)

    # Backend init (over a remote-attached chip: the tunnel handshake,
    # seconds) overlaps the host-side checkpoint read below. jax
    # serializes concurrent backend touches internally, so model_load's
    # first device op simply joins the in-flight init instead of paying
    # it twice.
    import threading

    def _backend_init():
        with boot.phase("backend_init"):
            import jax

            jax.devices()

    backend_thread = threading.Thread(target=_backend_init, daemon=True)
    backend_thread.start()

    with boot.phase("model_load"):
        # abstract=True: the checkpoint-load template comes from
        # jax.eval_shape — no init program is compiled or run (measured
        # 6 s of this phase), the checkpoint's own arrays are the params
        model, params, path = load_family_model(args, abstract=True)
        print(f"loaded {path}")

        # the shared norm-stats path (reads --norm-h5; --std-norm gate
        # inside) — serve.py must not keep its own copy of the h5 contract
        norm = norm_stats_if(args)
    backend_thread.join()

    y_mode = {"m1": "none", "m2": "enc_dec"}.get(args.model_class, "dec_only")
    with boot.phase("service_init"):
        svc = EnhanceService(
            model, params, args.model_class,
            enh_cfg=EnhancerConfig(mcem=mcem_config_of(args), y_mode=y_mode,
                                   norm=norm, engine=args.engine,
                                   aot_dir=args.aot_cache),
            cfg=ServeConfig(batch_size=args.batch_size,
                            batch_window_ms=args.batch_window_ms,
                            y_source=args.y_source, y_dim=args.y_dim,
                            seed=args.seed,
                            max_audio_seconds=args.max_audio_seconds,
                            max_queue=args.max_queue,
                            chunk_seconds=args.chunk_seconds,
                            warmup_buckets=tuple(args.warmup_buckets),
                            ready_on_aot=args.ready_on_aot_validate),
            mesh=make_mesh_if(args))
    svc.boot = boot                          # /healthz carries the ledger
    from dvae_tpu.ops.stft import StftConfig, n_stft_frames_clamped

    if args.chunk_seconds:
        # every chunk item is EXACTLY chunk-length (longform.chunk_spans
        # slides the final span back), so warming the chunk bucket makes
        # the whole chunked path recompile-free — add it automatically
        stft = StftConfig()
        chunk = max(stft.hop,
                    round(args.chunk_seconds * stft.fs / stft.hop) * stft.hop)
        bucket = -(-n_stft_frames_clamped(chunk, stft) // 64) * 64
        if args.warmup_buckets and bucket not in args.warmup_buckets:
            args.warmup_buckets = list(args.warmup_buckets) + [bucket]
            print(f"auto-warming the {bucket}-frame chunk bucket "
                  f"(--chunk-seconds {args.chunk_seconds:g})")
    else:
        # operator heads-up: with chunking off, an admissible request
        # longer than the largest warmed bucket stalls ALL traffic behind
        # its inline compile (minutes over a remote chip) and pads the
        # whole batch to its giant bucket (HBM amplification — see
        # enhance/longform.py)
        max_frames = n_stft_frames_clamped(
            int(args.max_audio_seconds * StftConfig().fs), StftConfig())
        max_bucket = -(-max_frames // 64) * 64
        warmest = max(args.warmup_buckets, default=0)
        if max_bucket > warmest:
            print(f"WARNING: --max-audio-seconds {args.max_audio_seconds:.0f}"
                  f" admits requests up to the {max_bucket}-frame bucket but "
                  f"only {args.warmup_buckets or 'no'} bucket(s) are warmed "
                  "and --chunk-seconds is off: one long request will stall "
                  "all traffic behind its inline compile and pad the whole "
                  "batch to its bucket. Pass --chunk-seconds (e.g. 60) or "
                  "lower --max-audio-seconds.", flush=True)

    # Swap the real handler onto the already-listening socket: from here
    # every new connection reaches the service (requests arriving
    # mid-warmup queue behind the warmup items and are answered once
    # their bucket compiles, or 503 at their own deadline).
    if args.warmup_buckets:
        # the service constructs ready+warmed (no-warmup embedders use it
        # directly); clear BEFORE the handler goes live or a readiness
        # probe landing in the attach→warmup_async gap would see
        # ready:true on a stone-cold boot and route traffic into the
        # cold compile
        svc.ready.clear()
        svc.warmed = False
    attach_service(server, svc, verbose=args.verbose,
                   admin_token=args.admin_token)
    boot.mark("service_attached")

    import signal
    import threading

    warmup_failed = threading.Event()
    if args.warmup_buckets:
        print(f"warming {len(args.warmup_buckets)} bucket(s) in the "
              "background (cold compile — minutes on a remote-attached "
              "chip); /healthz reports \"warming\" until done...", flush=True)
        boot.start("warmup")

        def _warm_done(err):
            boot.end("warmup")
            if err is None:
                boot.mark("warmed")
                boot.mark_once("ready")  # atomic: never overwrites the
                #                          AOT block's earlier mark
                print(f"warm: {svc.warm_buckets} "
                      f"(ready {boot.snapshot()['marks']['ready']:.1f}s, "
                      f"warmed {boot.snapshot()['marks']['warmed']:.1f}s "
                      "after process start)", flush=True)
            else:
                # the model cannot run at all — stop serving, exit nonzero
                print(f"warmup FAILED: {err!r}", flush=True)
                warmup_failed.set()
                server.shutdown()

        # pass the list explicitly: the auto-added chunk bucket lands in
        # args AFTER the ServeConfig snapshot above
        svc.warmup_async(args.warmup_buckets, on_done=_warm_done)
        if svc.ready_via_aot and boot.mark_once("ready"):
            # --ready-on-aot-validate and every bucket restored: readiness
            # is host-side; the background warmup will flip `warmed`
            print(f"ready via AOT restore "
                  f"({boot.snapshot()['marks']['ready']:.1f}s after "
                  "process start; warmup executions continue in the "
                  "background)", flush=True)
    else:
        boot.mark("ready")

    def _drain_and_stop():
        drained = svc.drain()
        print("drained, stopping" if drained
              else "drain timed out, stopping", flush=True)
        server.shutdown()

    def _on_sigterm(signum, frame):
        # answer everything already admitted (503 for new arrivals), THEN
        # stop — an orchestrator's stop never truncates a response.
        # shutdown() must come from another thread (serve_forever's own
        # thread would deadlock on it).
        print("SIGTERM: draining...", flush=True)
        threading.Thread(target=_drain_and_stop, daemon=True).start()

    signal.signal(signal.SIGTERM, _on_sigterm)
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(model_class={args.model_class}, batch={args.batch_size}, "
          f"window={args.batch_window_ms}ms)", flush=True)
    try:
        # serve_forever has been running on its own thread since the early
        # bind; main just waits for shutdown() (SIGTERM drain / warmup
        # failure / Ctrl-C)
        server._serve_thread.join()
    except KeyboardInterrupt:
        server.shutdown()
        server._serve_thread.join()
    finally:
        server.server_close()
        svc.close()
    if warmup_failed.is_set():
        raise SystemExit(1)


if __name__ == "__main__":
    main()
