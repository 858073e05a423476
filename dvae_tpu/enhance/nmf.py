"""Masked multiplicative NMF updates for the MCEM noise model.

Functional, batched re-design of the reference's in-place M-step
(/root/reference/packages/models/mcem.py:91-153). Layouts are TPU-native
(frames-major): X2 (B, N, F); W (B, F, K); H (B, N, K); g (B, N);
per-latent-sample variances Vs (R, B, N, F). The frame mask (B, N) excludes
padded frames from every reduction over N (the reference instead processes
exact-length utterances one at a time).

Update order matches mcem.py:91-153 exactly: W (with Vx refresh), H (with
Vx refresh), joint W/H column renormalization, then the gain g.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DEFAULT = jax.lax.Precision.DEFAULT

# Absolute floor on the mixture-variance model Vx = g*Vs + Vb. Healthy values
# are orders of magnitude above this; it only guards all-zero (digitally
# silent) frames, where multiplicative updates drive g and H to exactly 0.
VX_FLOOR = 1e-10


def init_nmf(key, batch: int, n_frames: int, n_freq: int, rank: int, eps: float):
    """Random-uniform W/H (floored at eps) and unit gains (mcem.py:42-44)."""
    kw, kh = jax.random.split(key)
    w = jnp.maximum(jax.random.uniform(kw, (batch, n_freq, rank)), eps)
    h = jnp.maximum(jax.random.uniform(kh, (batch, n_frames, rank)), eps)
    g = jnp.ones((batch, n_frames))
    return w, h, g


def compute_vb(w, h):
    """Noise variance Vb = (W @ H) in frames-major layout -> (B, N, F)."""
    return jnp.einsum("bnk,bfk->bnf", h, w, precision=_DEFAULT)


def nmf_m_step(x2, vs, w, h, g, mask, eps: float = 1e-8):
    """One multiplicative M-step given latent-sample speech variances.

    Args:
        x2:   (B, N, F) mixture power spectrogram.
        vs:   (R, B, N, F) decoder speech variances for R posterior samples.
        w,h,g: current NMF parameters / gains.
        mask: (B, N) float frame-validity mask.

    Returns updated (w, h, g).
    """
    m = mask[:, :, None]  # (B, N, 1)
    vs_scaled = g[None, :, :, None] * vs  # (R, B, N, F)

    def vx(vb):
        # floor keeps all-silent frames (x2 == 0 -> g, H -> 0) from collapsing
        # Vx to 0 and poisoning 1/Vx with inf
        return jnp.maximum(vs_scaled + vb[None], VX_FLOOR)

    vb = compute_vb(w, h)
    vxc = vx(vb)
    # --- update W (reduces over frames: must be masked) ---
    a2 = jnp.sum(vxc**-2, axis=0)  # (B, N, F)
    a1 = jnp.sum(vxc**-1, axis=0)
    num = jnp.einsum("bnf,bnk->bfk", x2 * a2 * m, h, precision=_DEFAULT)
    den = jnp.einsum("bnf,bnk->bfk", a1 * m, h, precision=_DEFAULT)
    w = w * jnp.sqrt(num / jnp.maximum(den, eps))

    vb = compute_vb(w, h)
    vxc = vx(vb)
    # --- update H (per-frame; padded rows are harmless) ---
    a2 = jnp.sum(vxc**-2, axis=0)
    a1 = jnp.sum(vxc**-1, axis=0)
    num = jnp.einsum("bnf,bfk->bnk", x2 * a2, w, precision=_DEFAULT)
    den = jnp.einsum("bnf,bfk->bnk", a1, w, precision=_DEFAULT)
    h = h * jnp.sqrt(num / jnp.maximum(den, eps))

    # --- renormalize columns of W into H (keeps W@H invariant) ---
    norm = jnp.sum(jnp.abs(w), axis=1)  # (B, K)
    w = w / norm[:, None, :]
    h = h * norm[:, None, :]

    vb = compute_vb(w, h)
    vxc = vx(vb)
    # --- update the per-frame gain g (reduces over freq only) ---
    num = jnp.sum(x2 * jnp.sum(vs * vxc**-2, axis=0), axis=-1)  # (B, N)
    den = jnp.sum(jnp.sum(vs * vxc**-1, axis=0), axis=-1)
    g = g * jnp.sqrt(num / jnp.maximum(den, eps))

    return w, h, g
