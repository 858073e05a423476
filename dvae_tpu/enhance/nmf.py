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


def _sum2(ops, axes):
    """Variadic reduce: sum two same-shaped arrays over ``axes`` in ONE pass.

    ``jnp.sum(a) ; jnp.sum(b)`` compiles to two loop fusions that each
    re-read the shared (R, B, N, F)-sized producer from HBM — on v5e those
    paired stat passes are the M-step's whole cost (profiled: ~7 x ~140 MB
    fusions per EM iteration). A single variadic ``lax.reduce`` makes XLA
    emit one multi-output fusion that loads the samples once (verified in
    compiled HLO: 1 fusion vs 2).
    """
    a, b = ops
    zero = jnp.zeros((), a.dtype)
    return jax.lax.reduce(
        (a, b), (zero, zero),
        lambda acc, x: (acc[0] + x[0], acc[1] + x[1]), axes,
    )


def nmf_m_step(x2, vs, w, h, g, mask, eps: float = 1e-8):
    """One multiplicative M-step given latent-sample speech variances.

    Args:
        x2:   (B, N, F) mixture power spectrogram.
        vs:   (R, B, N, F) decoder speech variances for R posterior samples
            (any float dtype; bf16 when the engine runs fast_stats — loads
            upconvert, all arithmetic is f32).
        w,h,g: current NMF parameters / gains.
        mask: (B, N) float frame-validity mask.

    Returns updated ``(w, h, g, vb)`` — ``vb`` is the final noise variance
    ``W @ H`` (g never enters it), saving callers a recompute.

    Every reduction over the R samples is a single HBM pass (see
    :func:`_sum2`); the intermediate a1/a2 planes are stored at ``vs``'s
    dtype so the stats path's writes shrink with it too.
    """
    m = mask[:, :, None]  # (B, N, 1)
    ad = vs.dtype  # dtype of the (B, N, F) stat planes written between passes

    def vx(vb):
        # floor keeps all-silent frames (x2 == 0 -> g, H -> 0) from collapsing
        # Vx to 0 and poisoning 1/Vx with inf; f32 arithmetic regardless of
        # the storage dtype of vs
        return jnp.maximum(
            g[None, :, :, None] * vs.astype(jnp.float32) + vb[None], VX_FLOOR
        )

    vb = compute_vb(w, h)
    r1 = 1.0 / vx(vb)
    # --- update W (reduces over frames: must be masked) ---
    a1, a2 = _sum2((r1, r1 * r1), (0,))  # (B, N, F) each, one pass
    a1, a2 = a1.astype(ad), a2.astype(ad)
    num = jnp.einsum("bnf,bnk->bfk", x2 * a2 * m, h, precision=_DEFAULT)
    den = jnp.einsum("bnf,bnk->bfk", a1 * m, h, precision=_DEFAULT)
    w = w * jnp.sqrt(num / jnp.maximum(den, eps))

    vb = compute_vb(w, h)
    r1 = 1.0 / vx(vb)
    # --- update H (per-frame; padded rows are harmless) ---
    a1, a2 = _sum2((r1, r1 * r1), (0,))
    a1, a2 = a1.astype(ad), a2.astype(ad)
    num = jnp.einsum("bnf,bfk->bnk", x2 * a2, w, precision=_DEFAULT)
    den = jnp.einsum("bnf,bfk->bnk", a1, w, precision=_DEFAULT)
    h = h * jnp.sqrt(num / jnp.maximum(den, eps))

    # --- renormalize columns of W into H (keeps W@H invariant) ---
    # norm floored at eps: a digitally SILENT utterance (x2 == 0 at every
    # valid frame) zeroes W's update numerator, so its columns collapse to
    # 0 and an unfloored divide NaNs that row's masks AND the batch-summed
    # cost scalar (the divide is per-row, so other rows' masks stay clean;
    # the reference divides unguarded, mcem.py:130-134 — silent input NaNs
    # it too; here one corrupt file must not poison a batched sweep's cost)
    norm = jnp.maximum(jnp.sum(jnp.abs(w), axis=1), eps)  # (B, K)
    w = w / norm[:, None, :]
    h = h * norm[:, None, :]

    vb = compute_vb(w, h)
    r1 = 1.0 / vx(vb)
    vs32 = vs.astype(jnp.float32)
    # --- update the per-frame gain g (reduces over freq only) ---
    # fold the sample and frequency reductions into one (R,·,F) pass:
    # num = sum_{r,f} x2 * Vs_r / Vx_r^2, den = sum_{r,f} Vs_r / Vx_r
    num, den = _sum2((x2[None] * vs32 * (r1 * r1), vs32 * r1), (0, 3))  # (B, N)
    g = g * jnp.sqrt(num / jnp.maximum(den, eps))

    # vb is the FINAL noise variance (g doesn't enter W@H): returning it
    # removes the caller-side recompute from the source (XLA CSE likely
    # already merged the two identical einsums — this is a clarity win,
    # not a measured device-time one)
    return w, h, g, vb
