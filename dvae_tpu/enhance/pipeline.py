"""End-to-end batched enhancement: noisy waveforms in, enhanced waveforms out.

Replaces the reference's per-utterance, per-process evaluation harness
(evaluate_ntcd_M1.py:75-182, evaluate_ntcd_M2.py) with a single-device (or
mesh-sharded) program:

  device (one jit per shape bucket):
      pad batch -> STFT (matmul DFT) -> |X|^2 -> encoder mean -> MCEM
      (lax.scan EM) -> Wiener masks -> S_hat = WFs*X, N_hat = WFn*X
      -> batched mask-normalized ISTFT -> (B, T) waveforms
  host:
      per-utterance truncation to exact length + wav write
  (keeping the ISTFT on device makes the host<->device traffic two (B, T)
  waveforms instead of four (B, N, F) spectrogram planes — ~8x less)

Utterances are padded to shape buckets (frame counts rounded up to
``frame_bucket``) so jit recompilations stay bounded while padding waste
stays low; frame masks make padded frames mathematically inert (see
tests/test_mcem.py::test_masked_batch_matches_trimmed_runs).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dvae_tpu.enhance.mcem import (
    McemConfig,
    run_em_fixed_z,
    run_mcem,
    run_peem,
    run_peem_wf,
    run_pmcem,
)
from dvae_tpu.enhance.pallas_mcem import extract_decoder_mlp
from dvae_tpu.ops.stft import (
    StftConfig,
    istft_realimag_masked,
    n_stft_frames_clamped,
    samples_for_frames,
    stft_realimag,
)


def _slice(seq, a, b):
    """None-tolerant sub-batch slice (shared by enhance_batch and
    enhance_stream's splitter)."""
    return None if seq is None else seq[a:b]


def _aval_tree_str(tree) -> str:
    """Stable shape:dtype string of a pytree (None leaves kept) — the
    per-argument half of the AOT program-identity hash."""
    def aval(x):
        if x is None:
            return "None"
        return f"{jnp.shape(x)}:{jnp.result_type(x)}"

    return str(jax.tree.map(aval, tree, is_leaf=lambda x: x is None))


# jax_enable_compilation_cache is PROCESS-GLOBAL: the bypass window in
# _compile_validated must be serialized across Enhancers/threads, or an
# interleaved save/restore could leave the persistent cache disabled for
# every later compile in the process
import threading as _threading_mod

_CACHE_BYPASS_LOCK = _threading_mod.Lock()


def _quantize_pcm16(x, xp=jnp):
    """Per-utterance symmetric PCM16 quantization: (B, T) f32 -> (int16, scale).

    One formula for BOTH wire directions (xp=jnp on device for outputs,
    xp=np on host for inputs) so the encode and decode sides of the wire
    format cannot drift apart."""
    peak = xp.maximum(xp.max(xp.abs(x), axis=-1), 1e-9)
    scale = (peak / 32767.0).astype(xp.float32)
    q = xp.clip(xp.round(x / scale[:, None]), -32768, 32767).astype(xp.int16)
    return q, scale


@dataclasses.dataclass(frozen=True)
class EnhancerConfig:
    stft: StftConfig = StftConfig()
    mcem: McemConfig = McemConfig()
    # how the model consumes the label y:
    #   "none"     — M1 (mcem.py:182): unconditional
    #   "enc_dec"  — M2 (mcem.py:332): encoder([x;y]), decoder([z;y])
    #   "dec_only" — M2v2/M2v3 (mcem.py:504/:676): encoder(x), decoder([z;y])
    y_mode: str = "none"
    frame_bucket: int = 64  # frame counts rounded up to a multiple of this
    # Wire format between host and device. "int16" sends/receives PCM16 +
    # per-utterance scales: half the bytes of float32 on a link where the
    # waveforms dominate traffic. NOT bit-exact — the per-utterance
    # peak/32767 grid only coincides with a PCM source's own grid when the
    # peak is exactly full-scale; in general inputs are re-quantized with
    # error <= half an LSB of the rescaled grid (~ -96 dBFS, far below the
    # enhancement noise floor, and the outputs are written as 16-bit PCM
    # wavs anyway). "float32" for exact float round-trips.
    wire_dtype: str = "int16"
    # Reconstruct n_est on the host as x - s_est instead of pulling a second
    # waveform from the device. Exact by the Wiener partition identity
    # (WFs + WFn = (g*Vs + Vb)/Vx = 1, so S_hat + N_hat = X bit-for-bit up
    # to float addition), and halves device->host traffic. The uncovered
    # tail beyond the (possibly video-trimmed) frame range is zeroed to
    # match the reference's N_hat (which is synthesized from those frames
    # only). Tested against the device-computed n_est.
    noise_from_partition: bool = True
    # Largest per-dispatch utterance count. XLA's fusion of the MCEM scan
    # degrades past ~32 utterances of ~320 frames on v5e (settled sweep,
    # bare-engine best windows: B=32 56.6, B=40 54.8, B=48 49.0, B=64
    # 45.3 utt/s — the cliff starts past B≈48) — oversized requests
    # are split into sub-dispatches that pipeline like separate batches.
    max_device_batch: int = 32
    # Pipeline depth for enhance_stream: the oldest dispatch is collected
    # once MORE than this many are in flight, i.e. up to depth+1 batches
    # are buffered on device at the peak (budget device memory for
    # depth+1, not depth). 1 = dispatch k+1, then collect k (hides host
    # prep only); deeper pipelines also hide the host<->device transfer +
    # dispatch round-trips of a remote-attached link behind device
    # compute.
    pipeline_depth: int = 2
    # Oracle-latent ablations (the reference's commented experiment modes,
    # whose golden outputs it ships under data/subset/models/):
    #   "none"           — normal MCEM on the mixture.
    #   "clean_z"        — the latent chain is INITIALIZED from the clean
    #                      spectrogram's encoding instead of the mixture's
    #                      (reference mcem.py:218/:368 commented
    #                      `self.Z = torch.t(Zclean)`); MCEM runs normally.
    #   "clean_z_nomcem" — the latent is PINNED at the clean encoding and the
    #                      Monte-Carlo machinery is skipped entirely: EM fits
    #                      only the NMF noise model against the fixed speech
    #                      variance (reference mcem.py:297/:307 commented
    #                      E_step/compute_WF overrides; golden wavs
    #                      `*_clean_z_nomcem_*`). Deterministic masks.
    # Both need the CLEAN waveforms passed to enhance_batch/enhance_stream.
    ablation: str = "none"
    # (mean, std) train statistics for std_norm-trained models: the encoder
    # input is normalized to (x - mean)/(std + norm_eps) for the latent init,
    # exactly as the training step fed the model (train/steps._normalizer —
    # the ELBO compared raw x, so the decoder's output variance models RAW
    # power and the MCEM math itself is unchanged). This COMPLETES the
    # reference's eval-side std_norm support, which loads the statistics but
    # never applies them ("#TODO: if std_norm, include mean & std",
    # reference evaluate_ntcd_M1.py:145,198-208). None = no normalization.
    norm: tuple | None = None
    norm_eps: float = 1e-8
    # Inference engine for the E-step:
    #   "mcem" — the reference's Metropolis-Hastings Monte-Carlo EM
    #            (statistical parity with the reference at matched budgets).
    #   "peem-wf" — PEEM's EM loop + MCEM's Monte-Carlo Wiener expectation
    #            (run_peem_wf): recovers the posterior-averaged masks pure
    #            PEEM gives up on strong checkpoints, at ~PEEM cost
    #            (one ~100-step MH chain instead of ~4100).
    #   "peem" — gradient-based point-estimate EM (run_peem): MAP latent via
    #            cfg.mcem.peem_steps Adam steps/iter instead of the MH chain,
    #            deterministic Wiener masks. Several-fold fewer decoder/HBM
    #            passes; bitwise-reproducible. Beyond-reference (the
    #            reference only ships the pinned-latent degenerate form as
    #            its clean_z_nomcem ablation).
    #   "pmcem" — parallel-chain MCEM (run_pmcem): cfg.mcem.pmcem_chains
    #            independent MH chains advanced together, one batched
    #            decoder pass per MH step; same chain-eval budget as mcem
    #            at the defaults with ~10x fewer sequential HBM sweeps of
    #            the stat planes. Statistical like mcem.
    # The clean_z_nomcem ablation pins the latent outright and ignores this.
    engine: str = "mcem"
    # Directory for Ahead-Of-Time-serialized device executables. When set
    # (and no mesh is attached), the Enhancer manages its own compile cache
    # INSTEAD of jax.jit dispatch: per input signature it deserializes a
    # previously-saved executable from disk (jax.experimental.
    # serialize_executable) or lower+compile+saves on first sight. This is
    # the serving cold-boot fix: over a remote-attached chip the persistent
    # HLO jit cache was observed NOT to help a fresh serve.py process
    # (522 s warmup despite a warm cache entry — axon-side deserialization/
    # recompile miss), while an executable blob restored in-process skips
    # the compile path entirely. Entries are keyed by a hash of the full
    # program identity (jax version, backend, config, param/arg avals) and
    # fall back to a normal compile on any mismatch or load failure.
    # Trust note: blobs are unpickled — point this only at an
    # operator-controlled directory (same trust level as --checkpoint).
    aot_dir: str | None = None


class Enhancer:
    """Binds a trained model's params to the jitted enhancement program.

    Pass a ``jax.sharding.Mesh`` to shard the utterance batch over its
    ``data`` axis — the multi-chip replacement for the reference's
    utterance-sharding process pool (evaluate_ntcd_M1.py:248-259): one SPMD
    program, params replicated, batch split over ICI-connected chips, no
    host fan-out. Batch sizes must be divisible by the mesh size (the
    sweep's bucketing pads utterance counts, not the mesh divisor — keep
    batch_size a multiple of the mesh size).
    """

    def __init__(self, model, params, cfg: EnhancerConfig = EnhancerConfig(), mesh=None):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        if cfg.y_mode not in ("none", "enc_dec", "dec_only"):
            raise ValueError(f"bad y_mode {cfg.y_mode!r}")
        if cfg.wire_dtype not in ("int16", "float32"):
            raise ValueError(f"bad wire_dtype {cfg.wire_dtype!r}")
        if cfg.ablation not in ("none", "clean_z", "clean_z_nomcem"):
            raise ValueError(f"bad ablation {cfg.ablation!r}")
        if cfg.engine not in ("mcem", "peem", "peem-wf", "pmcem"):
            raise ValueError(f"bad engine {cfg.engine!r}")
        self.params = self._device_params(params)
        self._core = self._build_core()
        self._aot: dict = {}
        self._aot_staged: dict = {}  # aot_probe restores; first use validates
        self.aot_stats = {"loaded": 0, "compiled": 0}
        self._aot_enabled = bool(cfg.aot_dir) and mesh is None
        self._aot_static = self._aot_static_sig() if self._aot_enabled else ""
        # load/stage/publish + aot_stats are touched from two threads in
        # serve.py (the worker dispatching vs the boot thread's
        # aot_restored probe) — serialize them; compiles/validation runs
        # happen OUTSIDE the lock
        self._aot_lock = _threading_mod.Lock()
        # params avals are Enhancer-lifetime-invariant (reload() enforces
        # shape/dtype equality), so their share of the program-identity
        # hash is computed once here and on reload, not per dispatch
        self._aot_params_aval = _aval_tree_str(self.params)
        if self._aot_enabled:
            self._aot_check_dir_trust()
        if cfg.aot_dir and mesh is not None:
            import warnings

            warnings.warn("aot_dir is ignored under a mesh (serialized "
                          "executables bake in single-device shardings)")

    def _device_params(self, params):
        """Params as device arrays (replicated under a mesh). Checkpoint
        loads hand back host numpy leaves — left as-is they would re-upload
        on EVERY dispatch and key a second jit-cache entry (host arrays
        carry a different call signature than device arrays)."""
        if self.mesh is not None:
            from dvae_tpu.parallel import replicate

            return replicate(params, self.mesh)
        return jax.tree.map(jnp.asarray, params)

    def reload(self, params) -> None:
        """Swap in same-structure params (e.g. a newer checkpoint of the
        same model). Params are a per-call argument of the jitted core, so
        a same-shape swap reuses every compiled program — no recompile, no
        warmup. Raises ValueError on any structure/shape/dtype mismatch
        (a different architecture needs a new Enhancer)."""
        old_leaves, old_def = jax.tree_util.tree_flatten(self.params)
        new_leaves, new_def = jax.tree_util.tree_flatten(params)
        if old_def != new_def:
            raise ValueError(
                f"param tree structure mismatch: {new_def} != {old_def}")
        for o, n in zip(old_leaves, new_leaves):
            # host-side checks only — jnp.asarray here would upload every
            # leaf to the device once just to read its dtype, doubling
            # reload transfer on a remote-attached chip. Dtypes compare
            # post-canonicalization (what the device will actually hold,
            # e.g. a float64 msgpack leaf lands as float32)
            n_dtype = jax.dtypes.canonicalize_dtype(np.result_type(n))
            if np.shape(o) != np.shape(n) or o.dtype != n_dtype:
                raise ValueError(
                    f"param leaf mismatch: {np.shape(n)}/{n_dtype} != "
                    f"{np.shape(o)}/{o.dtype}")
        self.params = self._device_params(params)
        # invariant by the checks above, but keep the cached AOT identity
        # derived from the live tree rather than trusting the proof
        self._aot_params_aval = _aval_tree_str(self.params)

    def _shard(self, arr):
        """Device-put a batch-leading array sharded over the mesh (or as-is)."""
        if self.mesh is None or arr is None:
            return jnp.asarray(arr) if arr is not None else None
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(arr, NamedSharding(self.mesh, P("data")))

    # -- device program ------------------------------------------------------
    def _build_core(self) -> Callable:
        cfg = self.cfg
        model = self.model
        z_dim = model.z_dim

        @functools.partial(jax.jit, static_argnames=("n_frames",))
        def core(params, x_batch, x_scale, s_batch, s_scale, mask, y, key,
                 n_frames: int):
            # x_batch: (B, T_padded) float32 or int16 (+ per-utt x_scale);
            # s_batch: clean waveforms, same layout (only for the clean-z
            # ablations, else None); mask: (B, N); y: (B, N, Y) | None
            # NOTE: everything stays real — some TPU runtimes (incl. the axon
            # tunnel) have no complex64; the matmul DFT is real-native anyway.
            if cfg.wire_dtype == "int16":
                x_batch = x_batch.astype(jnp.float32) * x_scale[:, None]
            re, im = stft_realimag(x_batch, cfg.stft)
            re, im = re[:, :n_frames], im[:, :n_frames]  # (B, N, F)
            x2 = re * re + im * im
            if cfg.ablation == "none":
                enc_src = x2  # encoder sees the mixture (mcem.py:201/:365)
            else:
                # clean-z ablations: the chain starts from (or is pinned at)
                # the CLEAN spectrogram's encoding — `Zclean`, mcem.py:203/:366
                if cfg.wire_dtype == "int16":
                    s_batch = s_batch.astype(jnp.float32) * s_scale[:, None]
                sre, sim = stft_realimag(s_batch, cfg.stft)
                sre, sim = sre[:, :n_frames], sim[:, :n_frames]
                enc_src = sre * sre + sim * sim
            if cfg.norm is not None:
                mean = jnp.asarray(cfg.norm[0], jnp.float32).reshape(-1)
                std = jnp.asarray(cfg.norm[1], jnp.float32).reshape(-1)
                enc_src = (enc_src - mean) / (std + cfg.norm_eps)
            if cfg.y_mode == "enc_dec":
                enc_in = jnp.concatenate([enc_src, y], axis=-1)
            else:
                enc_in = enc_src
            _, z0, _ = model.apply(params, enc_in, method="encode", sample=False)
            dec = lambda zin: model.apply(params, zin, method="decode")
            y_dec = None if cfg.y_mode == "none" else y
            if cfg.ablation == "clean_z_nomcem":
                res = run_em_fixed_z(
                    dec, x2, z0, mask, cfg.mcem, y=y_dec,
                    decoder_mats=extract_decoder_mlp(params, z_dim), key=key,
                )
            elif cfg.engine == "peem":
                res = run_peem(
                    dec, x2, z0, mask, cfg.mcem, y=y_dec,
                    decoder_mats=extract_decoder_mlp(params, z_dim), key=key,
                )
            elif cfg.engine == "peem-wf":
                res = run_peem_wf(
                    dec, x2, z0, mask, cfg.mcem, y=y_dec,
                    decoder_mats=extract_decoder_mlp(params, z_dim), key=key,
                )
            elif cfg.engine == "pmcem":
                res = run_pmcem(
                    dec, x2, z0, mask, key, cfg.mcem, y=y_dec,
                    decoder_mats=extract_decoder_mlp(params, z_dim),
                )
            else:
                # use_pallas=False: measured on v5e, the XLA scan engine wins
                # (19.7 vs 12.4 utt/s at B=16) — the VMEM-resident chain
                # forces 64-row tiles whose tiny decoder matmuls underutilize
                # the MXU, while the scan batches all B*N rows per step. The
                # kernel stays available (and tested) via
                # run_mcem(use_pallas=True).
                res = run_mcem(
                    dec, x2, z0, mask, key, cfg.mcem, y=y_dec,
                    decoder_mats=extract_decoder_mlp(params, z_dim),
                    use_pallas=False,
                )
            s = istft_realimag_masked(res.wfs * re, res.wfs * im, mask, cfg.stft)
            if cfg.noise_from_partition:
                n = None
            else:
                n = istft_realimag_masked(res.wfn * re, res.wfn * im, mask, cfg.stft)
            if cfg.wire_dtype == "int16":
                s, s_scale = _quantize_pcm16(s)
                if n is None:
                    return s, s_scale, res.cost
                n, n_scale = _quantize_pcm16(n)
                return s, s_scale, n, n_scale, res.cost
            one = jnp.ones((s.shape[0],), jnp.float32)
            if n is None:
                return s, one, res.cost
            return s, one, n, one, res.cost

        return core

    # -- AOT executable cache --------------------------------------------------
    def _call_core(self, *args, n_frames: int):
        """Run the device program for one batch: the jitted core by
        default; under ``cfg.aot_dir`` an explicitly-managed compile cache
        whose executables round-trip through disk, so a FRESH PROCESS
        (serve.py cold boot) restores yesterday's compile in seconds
        instead of re-paying minutes of XLA time per bucket."""
        if not self._aot_enabled:
            return self._core(*args, n_frames=n_frames)
        import time as _time

        sig = self._aot_sig(args, n_frames)
        fn = self._aot.get(sig)
        if fn is None:
            # an executable aot_probe already deserialized skips the disk
            # load but NOT the first-use validation below — a staged blob
            # is exactly as untrusted as a freshly loaded one
            with self._aot_lock:
                fn = self._aot_staged.pop(sig, None)
                if fn is None:
                    fn = self._aot_load(sig)
            # per-segment wall timings (visible in /healthz "aot"):
            # deserialize vs first-use validation vs compile — the
            # axon tunnel has shown each of these degrading
            # independently, and without the split a slow boot is
            # undiagnosable (round-4: a restore boot spent 11 min in
            # ONE of them with only the warmup total to go on).
            # load_s accrues inside _aot_load (misses too, and probe-time
            # deserializes); compile_s/validate_s inside _compile_validated
            # and the validation block below (failed runs included).
            if fn is None:
                # fresh miss: compile AND validate before the blob is
                # saved — compile() may be satisfied by a poisoned
                # persistent-HLO-cache entry (see the validation note
                # below), and saving unvalidated would publish a bad blob
                # to disk before its first execution ever runs
                fn, out = self._compile_validated(sig, args, n_frames)
                with self._aot_lock:
                    self._aot[sig] = fn
                return out
            # VALIDATE a disk-restored executable by running it once to
            # completion before trusting it: XLA's persistent HLO cache
            # is not reliably topology-keyed, and an executable that
            # compile() once satisfied from a foreign-topology entry
            # serializes fine but MISEXECUTES at run time ('Buffer
            # Definition Event ... not found') — a failure the
            # deserialize try/except cannot see. One forced sync on the
            # first use of each loaded signature; a bad blob is
            # quarantined and recompiled.
            tv = _time.time()
            try:
                out = fn(*args)
                jax.block_until_ready(out)
                self._accrue("validate_s", tv)
                with self._aot_lock:
                    self._aot[sig] = fn
                return out
            except Exception as e:
                import warnings

                # the failed run's minutes must land in the ledger too,
                # or the /healthz segments sum to far less than warmup
                self._accrue("validate_s", tv)
                warnings.warn(
                    f"AOT cache entry for {sig} failed VALIDATION ({e});"
                    " quarantining and recompiling")
                self.aot_stats["loaded"] -= 1
                try:
                    self._aot_path(sig).rename(
                        self._aot_path(sig).with_suffix(".bad"))
                except OSError:
                    pass
                fn, out = self._compile_validated(sig, args, n_frames)
                with self._aot_lock:
                    self._aot[sig] = fn
                return out
        return fn(*args)

    def _accrue(self, key: str, t0: float) -> None:
        import time as _time

        self.aot_stats[key] = round(
            self.aot_stats.get(key, 0.0) + _time.time() - t0, 2)

    def _compile_validated(self, sig: str, args, n_frames: int):
        """Compile for ``sig`` and VALIDATE (run to completion) before the
        blob is saved or published — for BOTH the fresh-miss path and a
        quarantined blob's replacement: if ``compile()`` is satisfied by a
        foreign-topology persistent-HLO-cache entry (the poisoned-cache
        case), the executable misexecutes identically whether it is the
        first compile or the recompile — saving it unvalidated would
        publish a bad blob. On a failed validation, retry once with the
        persistent compilation cache bypassed; if that also fails the
        program is genuinely broken and the error propagates.

        Returns ``(fn, out)`` — the validated executable AND the output of
        the validation run, so the caller answers the in-flight batch from
        it instead of paying a second device dispatch."""
        import time as _time

        t_c = _time.time()
        fn = self._core.lower(*args, n_frames=n_frames).compile()
        self.aot_stats["compiled"] += 1
        self._accrue("compile_s", t_c)
        tv = _time.time()
        try:
            out = fn(*args)
            jax.block_until_ready(out)
            self._accrue("validate_s", tv)
        except Exception:
            import warnings

            self._accrue("validate_s", tv)
            warnings.warn(
                f"compiled executable for {sig} failed validation — "
                "likely a stale persistent-compilation-cache entry; "
                "recompiling with the persistent cache bypassed")
            # the flag is process-global: serialize the bypass window so
            # concurrent compiles elsewhere cannot interleave with the
            # save/restore and lose the persistent cache for the process
            with _CACHE_BYPASS_LOCK:
                prev = jax.config.jax_enable_compilation_cache
                jax.config.update("jax_enable_compilation_cache", False)
                try:
                    t_c = _time.time()
                    fn = self._core.lower(*args, n_frames=n_frames).compile()
                    self.aot_stats["compiled"] += 1
                    self._accrue("compile_s", t_c)
                finally:
                    jax.config.update("jax_enable_compilation_cache", prev)
            tv = _time.time()
            out = fn(*args)
            jax.block_until_ready(out)
            self._accrue("validate_s", tv)
        self._aot_save(sig, fn)
        return fn, out

    def _aot_static_sig(self) -> str:
        """The Enhancer-lifetime-invariant half of the program identity,
        computed ONCE (hashing it per dispatch would put repr/sha256 work
        on the serving worker's hot path). Includes the device TOPOLOGY:
        executables compiled under a different addressable-device set must
        never share a key (see _call_core's validation note)."""
        import hashlib

        devs = jax.devices()
        norm = self.cfg.norm
        norm_id = ("none" if norm is None else
                   hashlib.sha256(np.asarray(norm[0]).tobytes()
                                  + np.asarray(norm[1]).tobytes()).hexdigest())
        return "|".join([
            jax.__version__, devs[0].platform,
            getattr(devs[0], "device_kind", "?"), str(len(devs)),
            # aot_dir is excluded: the cache directory's own location does
            # not affect the compiled program, and hashing it would silently
            # invalidate every saved executable on a dir move/rename.
            repr(dataclasses.replace(self.cfg, norm=None, aot_dir=None)),
            norm_id,
            repr(self.model),
        ])

    def _aot_check_dir_trust(self) -> None:
        """AOT blobs are restored with pickle.load — executing a blob is
        equivalent to executing code as this process. The directory must
        therefore be writable only by the operator (same trust level as
        ``--checkpoint``); warn loudly if it is group/world-writable."""
        import os
        import stat

        try:
            st = os.stat(self.cfg.aot_dir)
        except OSError:
            return  # not created yet — mkdir later inherits the umask
        if st.st_mode & (stat.S_IWGRP | stat.S_IWOTH):
            import warnings

            warnings.warn(
                f"aot_dir {self.cfg.aot_dir!r} is group/world-writable; "
                "cached executables are unpickled on load, so anyone who "
                "can write there can execute code in this process. "
                "chmod 755 (or tighter) the directory.")

    def aot_probe(self, wavs, ys=None, max_frames=None,
                  clean_wavs=None) -> bool:
        """Restore-without-execute probe: compute the EXACT program
        signature a :meth:`dispatch` of this batch would use and attempt
        to deserialize its executable from ``aot_dir``. True = the blob
        restored and is STAGED for the first real dispatch of that
        signature (which still pays the one-shot run-to-completion
        validation — a staged blob is as untrusted as a loaded one).

        Deserialization is host+runtime work; no device program executes,
        so the probe cannot be held hostage by a degraded tunnel's
        execute path the way a warmup execution can (round-4 measured a
        restore boot blocked 678 s in warmup EXECUTION alone). This is
        the mechanism behind serve.py --ready-on-aot-validate. The only
        device traffic is _prepare's small label upload (conditional
        models).

        Clean-z ablation configs condition every real dispatch on
        ``clean_wavs`` (a different program signature): pass the clean
        batch to probe the real signature, else the probe returns False
        rather than staging a blob no legal dispatch would ever use."""
        if not self._aot_enabled:
            return False
        if self.cfg.ablation != "none" and clean_wavs is None:
            return False
        xw, x_scale, sw, s_scale, mask, y, n_pad, _ = self._prepare(
            wavs, ys, max_frames, clean_wavs)
        args = (self.params, xw, x_scale, sw, s_scale, mask, y,
                jax.random.PRNGKey(0))
        sig = self._aot_sig(args, n_pad)
        with self._aot_lock:
            if sig in self._aot or sig in self._aot_staged:
                return True
            fn = self._aot_load(sig)
            if fn is None:
                return False
            self._aot_staged[sig] = fn
        return True

    def _aot_sig(self, args, n_frames: int) -> str:
        """Hash of the full program identity: anything that changes the
        compiled executable must change the key (else a stale blob would be
        silently loaded for the wrong program). Static material is cached
        (:meth:`_aot_static_sig`) and so are the params avals
        (``_aot_params_aval`` — invariant across reload(), and hashing
        hundreds of leaves per dispatch would put repr/sha256 work on the
        serving worker's hot path); only the small data-arg avals hash per
        call."""
        import hashlib

        parts = [
            self._aot_static, str(n_frames), self._aot_params_aval,
            _aval_tree_str(args[1:]),
        ]
        return hashlib.sha256("|".join(parts).encode()).hexdigest()[:24]

    def _aot_path(self, sig: str):
        import pathlib

        return pathlib.Path(self.cfg.aot_dir) / f"core_{sig}.aotx"

    def _aot_load(self, sig: str):
        """Deserialize a saved executable; None on any miss/failure (a
        corrupt or stale blob must degrade to a normal compile, never
        crash serving startup). Accrues its own wall time to
        ``aot_stats["load_s"]`` — including failed deserializes — so the
        per-segment boot split stays honest no matter who calls it
        (``_call_core`` inline or :meth:`aot_probe` during a
        ready-on-aot-validate boot)."""
        import pickle
        import time as _time

        from jax.experimental.serialize_executable import deserialize_and_load

        t0 = _time.time()
        try:
            path = self._aot_path(sig)
            if not path.exists():
                return None
            try:
                with open(path, "rb") as f:
                    blob = pickle.load(f)
                # pin execution to the default device: the program was
                # jitted single-device, and the default load would span
                # every addressable device (breaks under a multi-device
                # topology)
                fn = deserialize_and_load(
                    blob["payload"], blob["in_tree"], blob["out_tree"],
                    execution_devices=(jax.devices()[0],))
            except Exception as e:
                import warnings

                warnings.warn(f"AOT cache entry {path.name} failed to load "
                              f"({e}); recompiling")
                return None
            self.aot_stats["loaded"] += 1
            return fn
        finally:
            self.aot_stats["load_s"] = round(
                self.aot_stats.get("load_s", 0.0) + _time.time() - t0, 2)

    def _aot_save(self, sig: str, compiled) -> None:
        import os
        import pickle
        import tempfile

        from jax.experimental.serialize_executable import serialize

        try:
            payload, in_tree, out_tree = serialize(compiled)
            os.makedirs(self.cfg.aot_dir, exist_ok=True)
            # atomic publish: a concurrent boot must never read a half-
            # written blob (it would fall back to compiling, but noisily)
            fd, tmp = tempfile.mkstemp(dir=self.cfg.aot_dir, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                pickle.dump({"payload": payload, "in_tree": in_tree,
                             "out_tree": out_tree}, f)
            os.replace(tmp, self._aot_path(sig))
        except Exception as e:
            import warnings

            warnings.warn(f"could not save AOT cache entry ({e}); "
                          "serving continues uncached")

    # -- host orchestration ----------------------------------------------------
    def _prepare(self, wavs, ys, max_frames, clean_wavs=None):
        """Host-side batch assembly: pad/bucket the wavs into the wire arrays
        the jitted core consumes. Returns (xw, x_scale, sw, s_scale, mask, y,
        n_pad, frames) — sw/s_scale are None unless ``clean_wavs`` is given
        (clean-z ablations). Split out of :meth:`_dispatch` so bench.py can
        time the pure device program on pre-uploaded inputs
        (tunnel-independent number)."""
        cfg = self.cfg
        b = len(wavs)
        # without the sub-frame clamp, a negative frame count becomes a
        # wraparound mask slice marking padding as valid
        frames = [n_stft_frames_clamped(len(w), cfg.stft) for w in wavs]
        if max_frames is not None:
            frames = [max(1, min(f, int(mf)))
                      for f, mf in zip(frames, max_frames)]
        n_max = max(frames)
        n_pad = -(-n_max // cfg.frame_bucket) * cfg.frame_bucket
        # samples needed so that the padded batch yields >= n_pad frames
        t_pad = samples_for_frames(n_pad, cfg.stft)

        def pack(ws):
            # a wav can exceed t_pad when max_frames (video trimming) cut its
            # frame count below what its sample count implies — the trimmed
            # frames make the excess samples unused anyway (the reference
            # trims the spectrogram the same way, evaluate_ntcd_M1.py:140-142)
            x = np.zeros((b, t_pad), dtype=np.float32)
            for i, w in enumerate(ws):
                t_use = min(len(w), t_pad)
                x[i, :t_use] = np.asarray(w[:t_use], dtype=np.float32)
            if cfg.wire_dtype == "int16":
                return _quantize_pcm16(x, xp=np)
            return x, np.ones((b,), np.float32)

        mask = np.zeros((b, n_pad), dtype=np.float32)
        for i in range(b):
            mask[i, : frames[i]] = 1.0
        xw, x_scale = pack(wavs)
        sw, s_scale = pack(clean_wavs) if clean_wavs is not None else (None, None)

        y = None
        if cfg.y_mode != "none":
            if ys is None:
                raise ValueError(f"y_mode={cfg.y_mode} requires labels")
            ydim = np.asarray(ys[0]).shape[-1]
            y = np.zeros((b, n_pad, ydim), dtype=np.float32)
            for i, yi in enumerate(ys):
                yi = np.asarray(yi, dtype=np.float32)
                n = min(len(yi), frames[i])
                y[i, :n] = yi[:n]
            y = jnp.asarray(y)
        return xw, x_scale, sw, s_scale, mask, y, n_pad, frames

    def _dispatch(self, wavs, ys, key, max_frames, clean_wavs=None):
        """Pad + upload one batch and enqueue the device program (async).

        Returns an opaque handle for :meth:`_collect`."""
        cfg = self.cfg
        if cfg.ablation != "none" and clean_wavs is None:
            raise ValueError(
                f"ablation={cfg.ablation} needs the clean waveforms "
                "(clean_wavs=...) to encode Zclean"
            )
        n_real = len(wavs)
        if self.mesh is not None and n_real % self.mesh.devices.size:
            # pad the batch to a mesh-divisible size with 1-frame silent
            # utterances (dropped again in _collect)
            pad_n = -(-n_real // self.mesh.devices.size) * self.mesh.devices.size - n_real
            wavs = list(wavs) + [np.zeros(cfg.stft.nfft, np.float32)] * pad_n
            if clean_wavs is not None:
                clean_wavs = list(clean_wavs) + [
                    np.zeros(cfg.stft.nfft, np.float32)
                ] * pad_n
            if ys is not None:
                y_dim = np.asarray(ys[0]).shape[-1]
                ys = list(ys) + [np.zeros((1, y_dim), np.float32)] * pad_n
            if max_frames is not None:
                max_frames = list(max_frames) + [1] * pad_n
        xw, x_scale, sw, s_scale, mask, y, n_pad, frames = self._prepare(
            wavs, ys, max_frames, clean_wavs
        )

        out_dev = self._call_core(
            self.params, self._shard(xw), self._shard(x_scale),
            self._shard(sw) if sw is not None else None,
            self._shard(s_scale) if s_scale is not None else None,
            self._shard(mask),
            self._shard(y) if y is not None else None,
            key if key is not None else jax.random.PRNGKey(0), n_frames=n_pad,
        )
        if cfg.noise_from_partition:
            # coverage: samples synthesizable from each utterance's frames
            cover = [samples_for_frames(fi, cfg.stft) for fi in frames[:n_real]]
            return out_dev, (
                [len(w) for w in wavs[:n_real]],
                [np.asarray(w, np.float32) for w in wavs[:n_real]],
                cover,
            )
        return out_dev, [len(w) for w in wavs[:n_real]]

    def _collect(self, handle) -> list[tuple[np.ndarray, np.ndarray]]:
        """Pull a dispatched batch back to the host and finalize lengths."""
        if self.cfg.noise_from_partition:
            (s_dev, s_sc, cost), (lengths, xs, cover) = handle
            s_all = np.asarray(s_dev).astype(np.float32) * np.asarray(s_sc)[:, None]
            out = []
            for i, t_i in enumerate(lengths):
                s = np.zeros(t_i, np.float32)
                t_have = min(t_i, s_all.shape[-1])
                s[:t_have] = s_all[i, :t_have]
                # Wiener partition: N_hat = X - S_hat on covered samples;
                # zero beyond frame coverage (matches reference istft output)
                n = xs[i][:t_i] - s
                n[min(cover[i], t_i):] = 0.0
                s[min(cover[i], t_i):] = 0.0
                out.append((s, n))
            self.last_cost = np.asarray(cost)
            return out
        (s_dev, s_sc, n_dev, n_sc, cost), lengths = handle
        s_all = np.asarray(s_dev).astype(np.float32) * np.asarray(s_sc)[:, None]
        n_all = np.asarray(n_dev).astype(np.float32) * np.asarray(n_sc)[:, None]
        out = []
        for i, t_i in enumerate(lengths):
            # librosa truncates to the signal length, padding zeros if short
            s = np.zeros(t_i, np.float32)
            n = np.zeros(t_i, np.float32)
            t_have = min(t_i, s_all.shape[-1])
            s[:t_have] = s_all[i, :t_have]
            n[:t_have] = n_all[i, :t_have]
            out.append((s, n))
        self.last_cost = np.asarray(cost)
        return out

    def enhance_batch(
        self,
        wavs: Sequence[np.ndarray],
        ys: Sequence[np.ndarray] | None = None,
        key: jax.Array | None = None,
        max_frames: Sequence[int] | None = None,
        clean_wavs: Sequence[np.ndarray] | None = None,
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Enhance a batch of (possibly ragged) utterances.

        Args:
            wavs: float waveforms at cfg.stft.fs.
            ys:  per-utterance (n_frames, y_dim) labels for M2 modes.
            max_frames: optional per-utterance frame cap (the reference trims
                the spectrogram to the video frame count,
                evaluate_ntcd_M1.py:140-142).
            clean_wavs: per-utterance clean waveforms — required when
                cfg.ablation is a clean-z mode, ignored otherwise.
        Returns:
            list of (s_hat, n_hat) float32 waveforms, each len(wavs[i]).
        """
        return self.collect(self.dispatch(wavs, ys, key, max_frames,
                                          clean_wavs))

    def dispatch(
        self,
        wavs: Sequence[np.ndarray],
        ys: Sequence[np.ndarray] | None = None,
        key: jax.Array | None = None,
        max_frames: Sequence[int] | None = None,
        clean_wavs: Sequence[np.ndarray] | None = None,
    ) -> list:
        """The ASYNC half of :meth:`enhance_batch`: upload + enqueue the
        device program(s) and return an opaque handle for :meth:`collect`
        without blocking on the results. Splitting at ``max_device_batch``
        and key folding are identical to enhance_batch (which is literally
        ``collect(dispatch(...))``), so the split API is bitwise the same.

        Lets a caller overlap the next batch's host prep + dispatch with
        the device's work on this one — the serving worker uses it to hide
        the per-dispatch link RTT (~25 ms, which is ~33% of a PEEM batch)
        behind device compute under sustained load."""
        mdb = self.cfg.max_device_batch
        if len(wavs) == 0:
            return []
        if len(wavs) <= mdb:
            return [self._dispatch(wavs, ys, key, max_frames, clean_wavs)]
        # oversized request: split into sub-dispatches, enqueue all before
        # collecting (they pipeline like separate stream batches)
        if key is None:
            key = jax.random.PRNGKey(0)
        handles = []
        for j, a in enumerate(range(0, len(wavs), mdb)):
            b = a + mdb
            handles.append(self._dispatch(
                wavs[a:b], _slice(ys, a, b), jax.random.fold_in(key, j),
                _slice(max_frames, a, b), _slice(clean_wavs, a, b),
            ))
        return handles

    def collect(self, handles: list) -> list[tuple[np.ndarray, np.ndarray]]:
        """Block on a :meth:`dispatch` handle and return its
        ``[(s_hat, n_hat), ...]`` (enhance_batch's return value)."""
        out = []
        for h in handles:
            out.extend(self._collect(h))
        return out

    def enhance_stream(self, batches, key: jax.Array | None = None):
        """Pipelined enhancement over an iterable of batches.

        ``batches`` yields ``(wavs, ys_or_None, max_frames_or_None)`` tuples,
        optionally extended with a fourth ``clean_wavs`` element (clean-z
        ablations). The oldest batch's outputs are pulled back once MORE
        than ``cfg.pipeline_depth`` dispatches are in flight — up to
        depth+1 batches are buffered on device at the peak — overlapping
        host<->device transfers and dispatch round-trips with device
        compute (jax dispatch is async). Yields one result list per
        input batch, in order.
        """
        import collections

        if key is None:
            key = jax.random.PRNGKey(0)
        mdb = self.cfg.max_device_batch
        depth = max(1, self.cfg.pipeline_depth)

        def sub_batches():
            # split oversized batches here so the device never sees more
            # than max_device_batch utterances (same contract as
            # enhance_batch); sub-batches of one input batch share an index
            # so results regroup below
            for i, tup in enumerate(batches):
                wavs, ys, max_frames = tup[:3]
                clean_wavs = tup[3] if len(tup) > 3 else None
                if len(wavs) == 0:
                    # an empty input batch still owes the caller one (empty)
                    # result list — a no-dispatch sentinel keeps the
                    # one-yield-per-batch contract (and zip alignment) intact
                    yield (i, 0, True, None, None, None, None)
                    continue
                for j, a in enumerate(range(0, len(wavs), mdb)):
                    last = a + mdb >= len(wavs)
                    yield (i, j, last, wavs[a:a + mdb],
                           _slice(ys, a, a + mdb),
                           _slice(max_frames, a, a + mdb),
                           _slice(clean_wavs, a, a + mdb))

        acc = []

        def emit(i, handle, last):
            nonlocal acc
            if handle is not None:
                acc.extend(self._collect(handle))
            if last:
                out, acc = acc, []
                return out
            return None

        pending = collections.deque()  # (batch_index, handle_or_None, last)
        for i, j, last, wavs, ys, max_frames, clean_wavs in sub_batches():
            handle = None if wavs is None else self._dispatch(
                wavs, ys, jax.random.fold_in(jax.random.fold_in(key, i), j),
                max_frames, clean_wavs,
            )
            pending.append((i, handle, last))
            if len(pending) > depth:
                out = emit(*pending.popleft())
                if out is not None:
                    yield out
        while pending:
            out = emit(*pending.popleft())
            if out is not None:
                yield out
