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

from dvae_tpu.enhance.mcem import McemConfig, run_mcem
from dvae_tpu.ops.stft import (
    StftConfig,
    istft_realimag_masked,
    n_stft_frames,
    stft_realimag,
)


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


class Enhancer:
    """Binds a trained model's params to the jitted enhancement program."""

    def __init__(self, model, params, cfg: EnhancerConfig = EnhancerConfig()):
        self.model = model
        self.params = params
        self.cfg = cfg
        if cfg.y_mode not in ("none", "enc_dec", "dec_only"):
            raise ValueError(f"bad y_mode {cfg.y_mode!r}")
        self._core = self._build_core()

    # -- device program ------------------------------------------------------
    def _build_core(self) -> Callable:
        cfg = self.cfg
        model = self.model

        @functools.partial(jax.jit, static_argnames=("n_frames",))
        def core(params, x_batch, mask, y, key, n_frames: int):
            # x_batch: (B, T_padded) float32; mask: (B, N); y: (B, N, Y) | None
            # NOTE: everything stays real — some TPU runtimes (incl. the axon
            # tunnel) have no complex64; the matmul DFT is real-native anyway.
            re, im = stft_realimag(x_batch, cfg.stft)
            re, im = re[:, :n_frames], im[:, :n_frames]  # (B, N, F)
            x2 = re * re + im * im
            if cfg.y_mode == "enc_dec":
                enc_in = jnp.concatenate([x2, y], axis=-1)
            else:
                enc_in = x2
            _, z0, _ = model.apply(params, enc_in, method="encode", sample=False)
            dec = lambda zin: model.apply(params, zin, method="decode")
            y_dec = None if cfg.y_mode == "none" else y
            res = run_mcem(dec, x2, z0, mask, key, cfg.mcem, y=y_dec)
            s = istft_realimag_masked(res.wfs * re, res.wfs * im, mask, cfg.stft)
            n = istft_realimag_masked(res.wfn * re, res.wfn * im, mask, cfg.stft)
            return s, n, res.cost

        return core

    # -- host orchestration ----------------------------------------------------
    def enhance_batch(
        self,
        wavs: Sequence[np.ndarray],
        ys: Sequence[np.ndarray] | None = None,
        key: jax.Array | None = None,
        max_frames: Sequence[int] | None = None,
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Enhance a batch of (possibly ragged) utterances.

        Args:
            wavs: float waveforms at cfg.stft.fs.
            ys:  per-utterance (n_frames, y_dim) labels for M2 modes.
            max_frames: optional per-utterance frame cap (the reference trims
                the spectrogram to the video frame count,
                evaluate_ntcd_M1.py:140-142).
        Returns:
            list of (s_hat, n_hat) float32 waveforms, each len(wavs[i]).
        """
        cfg = self.cfg
        if key is None:
            key = jax.random.PRNGKey(0)
        b = len(wavs)
        frames = [n_stft_frames(len(w), cfg.stft) for w in wavs]
        if max_frames is not None:
            frames = [min(f, int(mf)) for f, mf in zip(frames, max_frames)]
        n_max = max(frames)
        n_pad = -(-n_max // cfg.frame_bucket) * cfg.frame_bucket
        # samples needed so that the padded batch yields >= n_pad frames
        t_pad = (n_pad - 1) * cfg.stft.hop + cfg.stft.nfft
        if cfg.stft.center:
            t_pad = max(t_pad - 2 * (cfg.stft.nfft // 2), 1)

        x = np.zeros((b, t_pad), dtype=np.float32)
        mask = np.zeros((b, n_pad), dtype=np.float32)
        for i, w in enumerate(wavs):
            x[i, : len(w)] = np.asarray(w, dtype=np.float32)
            mask[i, : frames[i]] = 1.0

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

        s_dev, n_dev, cost = self._core(
            self.params, jnp.asarray(x), jnp.asarray(mask), y, key, n_frames=n_pad
        )
        s_all, n_all = np.asarray(s_dev), np.asarray(n_dev)

        out = []
        for i, w in enumerate(wavs):
            t_i = len(wavs[i])
            # librosa truncates to the signal length, padding zeros if short
            s = np.zeros(t_i, np.float32)
            n = np.zeros(t_i, np.float32)
            t_have = min(t_i, s_all.shape[-1])
            s[:t_have] = s_all[i, :t_have]
            n[:t_have] = n_all[i, :t_have]
            out.append((s, n))
        self.last_cost = np.asarray(cost)
        return out
