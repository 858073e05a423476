"""Pallas TPU kernel for the MCEM Metropolis-Hastings chain.

This is the genuinely Pallas-shaped op of the framework. The MH chain is a
``lax.scan`` whose carry (z, Vs, energy) and closure state (|X|^2, Vb, g) are
(rows, 513)-sized tensors: under XLA every one of the ~4000 chain steps per
enhancement round-trips that state through HBM (~60 MB/step). Here one kernel
invocation runs an *entire chain segment* (burn-in + samples of one EM
iteration, reference mcem.py:207-307) for a tile of frames with everything —
state, mixture stats, decoder weights — resident in VMEM, so HBM traffic per
EM iteration drops from O(steps x state) to O(state + emitted samples).

Frames are fully independent in MCEM (per-frame latents, per-frame
accept/reject — mcem.py:256-265), so the (B, N) batch flattens to rows and
tiles freely.

Contents of one kernel step (identical math to mcem._make_mh_step):
    z' = z + sqrt(var_rw) * eps,  eps ~ N(0, I)   [host-side jax.random]
    Vs' = decoder(z') = exp(W3 tanh(W2 tanh(W1 z' + by) + b2) + b3)
    E' = sum_f [log Vx' + |X|^2 / Vx'] + ||z'||^2 / 2,  Vx' = g Vs' + Vb
    accept per frame iff log u < E - E'

Conditioning (M2 family) enters only through the decoder's first layer, so
the caller folds it into a per-row bias ``by = b1 + y @ W1[y-part]`` and the
kernel is identical for every model family (cf. mcem.py:396 vs :565).

Proposal noise (standard normals) and acceptance log-uniforms are generated
by ``jax.random`` on the XLA side and streamed in per row-tile — ~350 KB per
chain-tile, 100x less than the per-step state round-trips it replaces. This
keeps the kernel deterministic given its inputs (exactly testable through
the Pallas interpreter, whose core-PRNG stub returns zeros) and gives the
kernel path the same noise distributions as the XLA engine; parity between
the two engines is statistical — matched proposal variance, burn-in and
budgets — exactly the parity contract the reference itself has across seeds
(SURVEY §7.3).

Two modes:
  * E-step mode emits the accepted Vs after each post-burn-in step
    (-> (R, rows, F) samples for the NMF M-step, mcem.py:292-307);
  * WF mode accumulates the Wiener-filter sums  sum g Vs/Vx, sum Vb/Vx
    (mcem.py:310-329) in VMEM and writes only the two (rows, F) planes.

Measured on a v5e chip the XLA scan engine currently wins end-to-end
(19.7 vs 12.4 utt/s at B=16, niter=100): keeping the chain resident in VMEM
caps the row tile at ~64 (noise + emitted-sample blocks), and 64-row decoder
matmuls underutilize the MXU, while the scan engine batches all B*N rows per
step. The kernel is kept (a) as the measured datapoint behind that default,
(b) because it wins when HBM pressure grows (bigger models / longer chains),
and (c) exactly tested: run_mcem(use_pallas=True) selects it; off-TPU or for
unsupported decoder shapes callers fall back to the XLA engine; tests drive
the kernel through the Pallas interpreter.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvae_tpu.enhance.nmf import VX_FLOOR

_TILE = 64  # frame rows per grid step — the VMEM-validated default: at the
# m1-reference WF budget (105 steps) the noise + sample/accumulator blocks
# stay ~8 MB at 64 rows and would double past the VMEM budget at 128
# (mcem.py's caller passes 64 with the same analysis)


def extract_decoder_mlp(params, z_dim: int):
    """Pull the decoder's dense weights out of a model's param pytree.

    Returns (w1z, w1y, b1, w2, b2, w3, b3) where w1y is the conditioning
    part of the first layer (None for M1), or None when the decoder is not
    the canonical 2-hidden-layer MLP this kernel supports.
    """
    tree = params.get("params", params)

    def find(t):
        if not isinstance(t, dict):
            return None
        if "decoder" in t:
            return t["decoder"]
        for v in t.values():
            hit = find(v)
            if hit is not None:
                return hit
        return None

    dec = find(tree)
    if dec is None:
        return None
    try:
        hidden = dec["hidden"]
        if set(hidden.keys()) != {"layers_0", "layers_1"}:
            return None
        w1 = hidden["layers_0"]["kernel"]
        b1 = hidden["layers_0"]["bias"]
        w2 = hidden["layers_1"]["kernel"]
        b2 = hidden["layers_1"]["bias"]
        w3 = dec["reconstruction"]["kernel"]
        b3 = dec["reconstruction"]["bias"]
    except (KeyError, TypeError):
        return None
    if w1.shape[0] < z_dim:
        return None
    w1z, w1y = w1[:z_dim], (w1[z_dim:] if w1.shape[0] > z_dim else None)
    return w1z, w1y, b1, w2, b2, w3, b3


def _mh_chain_kernel(
    *refs,
    n_steps: int,
    n_burn: int,
    var_rw: float,
    z_dim: int,
    wf_mode: bool,
):
    if wf_mode:
        (x2_ref, vb_ref, g_ref, z0_ref, by_ref, noise_ref,
         w1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
         z_out_ref, wfs_ref, wfn_ref) = refs
    else:
        (x2_ref, vb_ref, g_ref, z0_ref, by_ref, noise_ref,
         w1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
         z_out_ref, samples_ref) = refs

    sqrt_var = jnp.float32(math.sqrt(var_rw))
    x2, vb, g = x2_ref[:], vb_ref[:], g_ref[:]  # (T,F),(T,F),(T,1)
    tile = x2.shape[0]

    def dec(z):
        h = jnp.tanh(jnp.dot(z, w1_ref[:], preferred_element_type=jnp.float32) + by_ref[:])
        h = jnp.tanh(jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:])
        return jnp.exp(jnp.dot(h, w3_ref[:], preferred_element_type=jnp.float32) + b3_ref[:])

    def energy(z, vs):
        vx = jnp.maximum(g * vs + vb, VX_FLOOR)
        return jnp.sum(jnp.log(vx) + x2 / vx, axis=-1, keepdims=True) + 0.5 * jnp.sum(
            z * z, axis=-1, keepdims=True
        )

    z = z0_ref[:]
    vs = dec(z)
    e = energy(z, vs)

    def mh(k, z, vs, e):
        # noise row k: [:z_dim] proposal normals, [z_dim] acceptance log-u
        nk = noise_ref[pl.ds(k, 1)].reshape(tile, z_dim + 1)
        eps, log_u = nk[:, :z_dim], nk[:, z_dim : z_dim + 1]
        zp = z + sqrt_var * eps
        vsp = dec(zp)
        ep = energy(zp, vsp)
        acc = log_u < (e - ep)  # (T, 1)
        return (
            jnp.where(acc, zp, z),
            jnp.where(acc, vsp, vs),
            jnp.where(acc, ep, e),
        )

    if wf_mode:
        def body(k, carry):
            z, vs, e, wfs, wfn = carry
            z, vs, e = mh(k, z, vs, e)
            take = (k >= n_burn).astype(jnp.float32)
            vs_scaled = g * vs
            vx = jnp.maximum(vs_scaled + vb, VX_FLOOR)
            return (z, vs, e, wfs + take * (vs_scaled / vx), wfn + take * (vb / vx))

        zero = jnp.zeros_like(x2)
        z, vs, e, wfs, wfn = jax.lax.fori_loop(
            0, n_steps, body, (z, vs, e, zero, zero)
        )
        wfs_ref[:] = wfs
        wfn_ref[:] = wfn
    else:
        def body(k, carry):
            z, vs, e = carry
            z, vs, e = mh(k, z, vs, e)

            @pl.when(k >= n_burn)
            def _():
                samples_ref[pl.ds(k - n_burn, 1), :, :] = vs[None]

            return (z, vs, e)

        z, vs, e = jax.lax.fori_loop(0, n_steps, body, (z, vs, e))
    z_out_ref[:] = z


def _pad_rows(a, rows_pad, fill=0.0):
    rows = a.shape[0]
    if rows == rows_pad:
        return a
    pad = [(0, rows_pad - rows)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad, constant_values=fill)


@functools.partial(
    jax.jit,
    static_argnames=("n_burn", "n_samples", "var_rw", "wf_mode", "interpret", "tile"),
)
def run_mh_chain(
    mats,
    x2,
    vb,
    g,
    z,
    y,
    key,
    n_burn: int,
    n_samples: int,
    var_rw: float,
    wf_mode: bool = False,
    interpret: bool = False,
    tile: int = _TILE,
):
    """Run one MH chain segment on a flattened (rows, F) frame batch.

    Args:
        mats: decoder weights from :func:`extract_decoder_mlp`.
        x2, vb: (rows, F) mixture power / NMF noise variance.
        g: (rows,) gains; z: (rows, L) current latents.
        y: optional (rows, Y) conditioning labels.
        key: jax PRNG key for the chain's proposal/acceptance noise.
    Returns:
        E-step mode: (z_final (rows, L), vs_samples (n_samples, rows, F)).
        WF mode: (z_final, wfs_sum (rows, F), wfn_sum (rows, F)).
    """
    w1z, w1y, b1, w2, b2, w3, b3 = mats
    if (y is None) != (w1y is None):
        # the XLA engine fails loudly on this mismatch (make_mlp_decoder's
        # concatenated matmul shape-errors); silently folding only the bias
        # here would return plausible-but-wrong unconditioned masks
        raise ValueError(
            "conditioning mismatch: y is "
            f"{'None' if y is None else 'given'} but the decoder mats "
            f"{'have' if w1y is not None else 'lack'} a conditioning block"
        )
    rows, f = x2.shape
    l = z.shape[-1]
    h1 = w1z.shape[1]
    h2 = w2.shape[1]  # hidden stack may be non-square, e.g. h_dim=(128, 64)
    n_steps = n_burn + n_samples
    rows_pad = -(-rows // tile) * tile

    # chain noise, same distributions as the XLA engine (mcem._make_mh_step)
    k_eps, k_u = jax.random.split(key)
    eps = jax.random.normal(k_eps, (n_steps, rows_pad, l), jnp.float32)
    log_u = jnp.log(
        jax.random.uniform(k_u, (n_steps, rows_pad, 1), minval=1e-38)
    )
    noise = jnp.concatenate([eps, log_u], axis=-1)  # (S, rows_pad, L+1)

    by = jnp.broadcast_to(b1, (rows, h1))
    if y is not None and w1y is not None:
        by = by + jnp.matmul(y, w1y)
    x2p = _pad_rows(x2.astype(jnp.float32), rows_pad)
    vbp = _pad_rows(vb.astype(jnp.float32), rows_pad, fill=1.0)
    gp = _pad_rows(g.astype(jnp.float32)[:, None], rows_pad)
    zp = _pad_rows(z.astype(jnp.float32), rows_pad)
    byp = _pad_rows(by.astype(jnp.float32), rows_pad)

    grid = (rows_pad // tile,)
    row_spec = lambda width: pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rep_spec = lambda s0, s1: pl.BlockSpec((s0, s1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        row_spec(f),        # x2
        row_spec(f),        # vb
        row_spec(1),        # g
        row_spec(l),        # z0
        row_spec(h1),       # by
        pl.BlockSpec(       # noise
            (n_steps, tile, l + 1), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        rep_spec(l, h1),    # w1z
        rep_spec(h1, h2),   # w2
        rep_spec(1, h2),    # b2
        rep_spec(h2, f),    # w3
        rep_spec(1, f),     # b3
    ]
    kernel = functools.partial(
        _mh_chain_kernel,
        n_steps=n_steps,
        n_burn=n_burn,
        var_rw=var_rw,
        z_dim=l,
        wf_mode=wf_mode,
    )
    if wf_mode:
        out_shape = (
            jax.ShapeDtypeStruct((rows_pad, l), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, f), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, f), jnp.float32),
        )
        out_specs = (row_spec(l), row_spec(f), row_spec(f))
    else:
        out_shape = (
            jax.ShapeDtypeStruct((rows_pad, l), jnp.float32),
            jax.ShapeDtypeStruct((n_samples, rows_pad, f), jnp.float32),
        )
        out_specs = (
            row_spec(l),
            pl.BlockSpec(
                (n_samples, tile, f), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        )
    args = (
        x2p, vbp, gp, zp, byp, noise,
        w1z.astype(jnp.float32), w2.astype(jnp.float32),
        b2.astype(jnp.float32)[None, :],
        w3.astype(jnp.float32), b3.astype(jnp.float32)[None, :],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*args)
    if wf_mode:
        zf, wfs, wfn = out
        return zf[:rows], wfs[:rows], wfn[:rows]
    zf, samples = out
    return zf[:rows], samples[:, :rows]
