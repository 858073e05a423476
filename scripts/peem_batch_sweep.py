#!/usr/bin/env python
"""PEEM device-batch sweep: settle max_device_batch for the fast engine.

MCEM's sweep settled B=32 (XLA's fusion of the MH scan degrades past ~32
utterances — EnhancerConfig.max_device_batch docstring), but PEEM is a
different program: ~75 ms/batch at B=32, where the ~25 ms per-dispatch
fetch RTT of the remote-attached link is ~33% of the reading (vs 7% for
MCEM). This sweep measures, per batch size:

  * t_batch — min wall of (dispatch one batch + fetch the cost vector),
    the same enqueue-then-fetch discipline as bench.py::measure_device_time
  * t_rtt   — min wall of (dispatch + fetch) of a TRIVIAL one-element
    program, i.e. one link round trip with ~zero device work
  * device  — t_batch - t_rtt: the engine's own per-batch device time,
    reported as utt/s alongside the RTT-inclusive number

so the batch-size decision is made on device time, not on link overhead
that pipelining (serving's 2-deep dispatch, enhance_stream's depth-2)
already hides under load.

Usage: python scripts/peem_batch_sweep.py [--engine peem] [--batches 32 48 64 96 128]
"""

import argparse
import json
import time

from _lib import enable_jit_cache

SUBSET = "/root/reference/data/subset/processed/ntcd_timit"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--engine", choices=("mcem", "peem", "peem-wf"), default="peem")
    ap.add_argument("--niter", type=int, default=100)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[16, 32, 48, 64, 96, 128])
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--out", default=None, metavar="JSON")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    enable_jit_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvae_tpu.data.io import read_wav
    from dvae_tpu.enhance.mcem import McemConfig
    from dvae_tpu.enhance.pipeline import Enhancer, EnhancerConfig
    from dvae_tpu.models import VAE

    model = VAE()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.ones((4, 513)))
    wavs = []
    for spk_utt in ("Babble/-5/test/34M/sa1", "Car/-5/test/34M/sa2",
                    "LR/-5/test/34M/si494"):
        x, _ = read_wav(f"{SUBSET}/Noisy/{spk_utt}.wav")
        wavs.append(x.astype(np.float32))

    dev = jax.devices()[0]
    # one link round trip with ~zero device work: dispatch + fetch of a
    # one-element add (fresh operand each rep so nothing is host-cached)
    one = jax.device_put(jnp.ones(()), dev)
    tiny = jax.jit(lambda a, b: a + b)
    np.asarray(tiny(one, 0.0))  # compile
    t_rtt = min(
        (lambda t0: (np.asarray(tiny(one, float(r))), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for r in range(16))

    rows = []
    for b in args.batches:
        batch = [wavs[i % len(wavs)] for i in range(b)]
        enh = Enhancer(model, params, EnhancerConfig(
            mcem=McemConfig(niter=args.niter), engine=args.engine,
            max_device_batch=max(args.batches)))
        xw, x_scale, _, _, mask, y, n_pad, _ = enh._prepare(batch, None, None)
        arg_x = jax.device_put(xw, dev)
        arg_s = jax.device_put(x_scale, dev)
        mask_d = jax.device_put(mask, dev)
        run = lambda k: enh._core(enh.params, arg_x, arg_s, None, None,
                                  mask_d, None, k, n_frames=n_pad)
        np.asarray(run(jax.random.PRNGKey(999))[-1])  # compile + warm
        t_batch = float("inf")
        for r in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(run(jax.random.PRNGKey(1000 + r))[-1])
            t_batch = min(t_batch, time.perf_counter() - t0)
        device = max(1e-9, t_batch - t_rtt)
        rows.append({
            "batch": b, "n_frames": n_pad,
            "t_batch_ms": round(t_batch * 1e3, 1),
            "t_rtt_ms": round(t_rtt * 1e3, 1),
            "device_ms": round(device * 1e3, 1),
            "device_utt_per_sec": round(b / device, 1),
            "incl_rtt_utt_per_sec": round(b / t_batch, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    best = max(rows, key=lambda r: r["device_utt_per_sec"])
    result = {
        "engine": args.engine, "niter": args.niter,
        "platform": jax.devices()[0].platform,
        "date": time.strftime("%Y-%m-%d"),
        "t_rtt_ms": round(t_rtt * 1e3, 1),
        "rows": rows,
        "best_batch_by_device_time": best["batch"],
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}")
    print(f"best by device time: B={best['batch']} "
          f"({best['device_utt_per_sec']} utt/s device)")


if __name__ == "__main__":
    main()
