"""Label helpers shared by the serving surfaces.

``scripts/enhance_wav.py`` (one-shot CLI) and ``dvae_tpu/serving.py``
(persistent daemon) both label conditional models outside the corpus tree:
constant ablations, or the model's OWN x->y classifier run on the NOISY
mixture spectrogram (the corpus CLI's self-soft uses the clean wav,
reference evaluate_ntcd_M2_info_vad.py:174-176 — a serving run has no
clean side). One home so the two surfaces cannot drift: before this module
they carried duplicate copies whose normalization eps had already diverged
(1e-8 hard-coded vs ``EnhancerConfig.norm_eps``).
"""

from __future__ import annotations

import numpy as np

from dvae_tpu.ops.stft import StftConfig, n_stft_frames_clamped

#: model family -> the Flax method that computes y from the input
#: spectrogram (reference models.py: _v3.classify :245, _v4/_v5
#: classify_fromX :299/:418). m2/m2v2 have no classifier.
CLASSIFY_METHOD = {"v3": "classify", "v4": "classify_from_x",
                   "v5": "classify_from_x"}


def classify_method_of(model_class: str) -> str | None:
    """The self-labeling method name for a family, or None (m1/m2/m2v2)."""
    return CLASSIFY_METHOD.get(model_class)


def constant_labels(n_frames: int, y_dim: int, kind: str) -> np.ndarray:
    """The ``ones``/``zeros`` constant-label ablations (reference golden
    suffixes ``*_oracle_1``/``*_oracle_0``) as an (n_frames, y_dim) array."""
    if kind not in ("ones", "zeros"):
        raise ValueError(f"bad constant label kind {kind!r}")
    return np.full((n_frames, y_dim), 1.0 if kind == "ones" else 0.0,
                   np.float32)


def self_soft_labels(model, params, wavs, stft_cfg: StftConfig, y_dim: int,
                     method: str, norm=None,
                     norm_eps: float = 1e-8) -> list[np.ndarray]:
    """ŷ_soft from the model's own classifier on the noisy mixtures.

    Takes a ragged list of waveforms and makes ONE batched eager call
    (waveforms zero-padded to the longest — the STFT's own end-pad is
    zeros, so every frame of the true length is unchanged; the classifier
    is frame-wise, so the padded tail is simply sliced off). One
    host->device round trip per batch instead of one per utterance — on a
    remote-attached chip each eager call costs ~the link RTT, which
    otherwise serializes in front of the enhancement batch.

    ``norm``/``norm_eps`` follow ``EnhancerConfig``: std_norm-trained
    models see (x2 - mean) / (std + norm_eps), exactly as training fed
    the classifier (train/steps._normalizer).
    """
    import jax.numpy as jnp

    from dvae_tpu.ops.stft import power_spectrogram

    ns = [n_stft_frames_clamped(len(w), stft_cfg) for w in wavs]
    t_max = max(len(w) for w in wavs)
    batch = np.stack([
        np.pad(np.asarray(w, np.float32), (0, t_max - len(w)))
        for w in wavs])
    x2 = power_spectrogram(jnp.asarray(batch), stft_cfg)   # (B, n, bins)
    if norm is not None:
        mean = jnp.asarray(norm[0], jnp.float32).reshape(-1)
        std = jnp.asarray(norm[1], jnp.float32).reshape(-1)
        x2 = (x2 - mean) / (std + norm_eps)
    b, n, f = x2.shape
    y = model.apply(params, x2.reshape(b * n, f), method=method)
    y = np.asarray(y, np.float32).reshape(b, n, -1)
    return [y[i, :ns[i]].reshape(-1, y_dim) for i in range(len(wavs))]
