"""Pallas MH-chain kernel: interpreter-mode correctness on the CPU mesh.

The kernel's proposal/acceptance noise is injected from jax.random, so given
the same key the chain is deterministic — we verify it three ways:

* frozen chain (var_rw=0): proposals equal the current state, log-accept is
  exactly 0 > log u, so the chain must not move and every emitted sample
  must equal decoder(z0) — pins decoder matmuls, energies, emission indexing;
* exact parity: a plain-jnp reference chain consuming the *same* noise must
  match the kernel step for step (z, samples, WF sums);
* full run_mcem kernel path vs the XLA scan engine: statistical agreement.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvae_tpu.enhance.mcem import McemConfig, run_mcem
from dvae_tpu.enhance.nmf import VX_FLOOR, init_nmf
from dvae_tpu.enhance.pallas_mcem import extract_decoder_mlp, run_mh_chain
from dvae_tpu.models import VAE, CVAE

B, N, F, L = 2, 24, 513, 16
ROWS = B * N


@pytest.fixture(scope="module")
def setup():
    model = VAE(x_dim=F, z_dim=L, h_dim=(32, 32))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.ones((4, F)),
    )
    mats = extract_decoder_mlp(params, L)
    assert mats is not None
    rng = jax.random.PRNGKey(2)
    x2 = jax.random.uniform(rng, (ROWS, F)) + 0.05
    vb = jax.random.uniform(jax.random.fold_in(rng, 1), (ROWS, F)) + 0.05
    g = jnp.ones((ROWS,))
    z0 = 0.1 * jax.random.normal(jax.random.fold_in(rng, 2), (ROWS, L))
    dec = lambda zin: model.apply(params, zin, method="decode")
    return model, params, mats, dec, x2, vb, g, z0


def _reference_chain(dec, x2, vb, g, z0, key, n_burn, n_samples, var_rw, rows_pad):
    """Plain-jnp MH chain consuming the exact noise layout of run_mh_chain."""
    n_steps = n_burn + n_samples
    k_eps, k_u = jax.random.split(key)
    eps = jax.random.normal(k_eps, (n_steps, rows_pad, z0.shape[-1]), jnp.float32)
    log_u = jnp.log(jax.random.uniform(k_u, (n_steps, rows_pad, 1), minval=1e-38))
    eps, log_u = eps[:, : z0.shape[0]], log_u[:, : z0.shape[0]]
    gg = g[:, None]

    def energy(z, vs):
        vx = jnp.maximum(gg * vs + vb, VX_FLOOR)
        return jnp.sum(jnp.log(vx) + x2 / vx, -1, keepdims=True) + 0.5 * jnp.sum(
            z * z, -1, keepdims=True
        )

    z = z0
    vs = dec(z)
    e = energy(z, vs)
    samples, wfs, wfn = [], 0.0, 0.0
    for k in range(n_steps):
        zp = z + np.sqrt(var_rw) * eps[k]
        vsp = dec(zp)
        ep = energy(zp, vsp)
        acc = log_u[k] < (e - ep)
        z = jnp.where(acc, zp, z)
        vs = jnp.where(acc, vsp, vs)
        e = jnp.where(acc, ep, e)
        if k >= n_burn:
            samples.append(vs)
        take = float(k >= n_burn)
        vx = jnp.maximum(gg * vs + vb, VX_FLOOR)
        wfs = wfs + take * (gg * vs / vx)
        wfn = wfn + take * (vb / vx)
    return z, jnp.stack(samples), wfs, wfn


def test_frozen_chain_emits_decoder_output(setup):
    _, _, mats, dec, x2, vb, g, z0 = setup
    zf, samples = run_mh_chain(
        mats, x2, vb, g, z0, None, jax.random.PRNGKey(0), n_burn=2, n_samples=3,
        var_rw=0.0, interpret=True, tile=16,
    )
    np.testing.assert_allclose(np.asarray(zf), np.asarray(z0), rtol=1e-6)
    vs0 = np.asarray(dec(z0))
    assert samples.shape == (3, ROWS, F)
    for r in range(3):
        np.testing.assert_allclose(np.asarray(samples[r]), vs0, rtol=2e-5, atol=1e-6)


def test_frozen_chain_wf_sums(setup):
    _, _, mats, dec, x2, vb, g, z0 = setup
    zf, wfs, wfn = run_mh_chain(
        mats, x2, vb, g, z0, None, jax.random.PRNGKey(0), n_burn=2, n_samples=4,
        var_rw=0.0, wf_mode=True, interpret=True, tile=16,
    )
    vs0 = np.asarray(dec(z0))
    vx = np.maximum(np.asarray(g)[:, None] * vs0 + np.asarray(vb), VX_FLOOR)
    np.testing.assert_allclose(
        np.asarray(wfs), 4 * (np.asarray(g)[:, None] * vs0) / vx, rtol=2e-5
    )
    np.testing.assert_allclose(np.asarray(wfn), 4 * np.asarray(vb) / vx, rtol=2e-5)


def test_live_chain_matches_reference_exactly(setup):
    _, _, mats, dec, x2, vb, g, z0 = setup
    key = jax.random.PRNGKey(42)
    n_burn, n_samples, var_rw = 3, 2, 0.01
    # rows already a multiple of tile=16 -> identical noise layout
    assert ROWS % 16 == 0
    zf, samples = run_mh_chain(
        mats, x2, vb, g, z0, None, key, n_burn=n_burn, n_samples=n_samples,
        var_rw=var_rw, interpret=True, tile=16,
    )
    z_ref, s_ref, _, _ = _reference_chain(
        dec, x2, vb, g, z0, key, n_burn, n_samples, var_rw, ROWS
    )
    moved = np.mean(np.any(np.asarray(zf) != np.asarray(z0), axis=-1))
    assert moved > 0.5  # the chain actually explores
    np.testing.assert_allclose(np.asarray(zf), np.asarray(z_ref), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(samples), np.asarray(s_ref), rtol=2e-4, atol=1e-5
    )


def test_live_chain_wf_matches_reference(setup):
    _, _, mats, dec, x2, vb, g, z0 = setup
    key = jax.random.PRNGKey(7)
    zf, wfs, wfn = run_mh_chain(
        mats, x2, vb, g, z0, None, key, n_burn=2, n_samples=3,
        var_rw=0.01, wf_mode=True, interpret=True, tile=16,
    )
    z_ref, _, wfs_ref, wfn_ref = _reference_chain(
        dec, x2, vb, g, z0, key, 2, 3, 0.01, ROWS
    )
    np.testing.assert_allclose(np.asarray(zf), np.asarray(z_ref), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wfs), np.asarray(wfs_ref), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wfn), np.asarray(wfn_ref), rtol=2e-4, atol=1e-5)


def test_conditioned_chain_matches_concat_decoder(setup):
    """y-conditioning folded into the first-layer bias == concat([z, y])."""
    model = CVAE(x_dim=F, y_dim=2, z_dim=L, h_dim=(32, 32))
    x = jnp.ones((4, F))
    yy = jnp.ones((4, 2))
    params = model.init(
        {"params": jax.random.PRNGKey(5), "sample": jax.random.PRNGKey(6)}, x, yy
    )
    mats = extract_decoder_mlp(params, L)
    assert mats is not None and mats[1] is not None  # w1y present
    rng = jax.random.PRNGKey(7)
    x2 = jax.random.uniform(rng, (ROWS, F)) + 0.05
    vb = jnp.ones((ROWS, F)) * 0.1
    g = jnp.ones((ROWS,))
    z0 = 0.1 * jax.random.normal(rng, (ROWS, L))
    y = (jax.random.uniform(jax.random.fold_in(rng, 3), (ROWS, 2)) > 0.5).astype(
        jnp.float32
    )
    zf, samples = run_mh_chain(
        mats, x2, vb, g, z0, y, jax.random.PRNGKey(0),
        n_burn=0, n_samples=1, var_rw=0.0, interpret=True, tile=16,
    )
    want = np.asarray(
        model.apply(params, jnp.concatenate([z0, y], axis=-1), method="decode")
    )
    np.testing.assert_allclose(np.asarray(samples[0]), want, rtol=2e-5, atol=1e-6)


def test_conditioning_mismatch_raises(setup):
    """The kernel must fail loudly on a y/decoder-conditioning mismatch
    (the XLA engine shape-errors; silently folding only the bias would
    return plausible-but-wrong unconditioned masks) — both directions."""
    model, params, m1_mats, dec, x2, vb, g, z0 = setup
    y = jnp.ones((ROWS, 2))
    with pytest.raises(ValueError, match="conditioning mismatch"):
        run_mh_chain(m1_mats, x2, vb, g, z0, y, jax.random.PRNGKey(0),
                     n_burn=0, n_samples=1, var_rw=0.0, interpret=True,
                     tile=16)

    cvae = CVAE(x_dim=F, y_dim=2, z_dim=L, h_dim=(32, 32))
    cparams = cvae.init(
        {"params": jax.random.PRNGKey(8), "sample": jax.random.PRNGKey(9)},
        jnp.ones((4, F)), jnp.ones((4, 2)))
    m2_mats = extract_decoder_mlp(cparams, L)
    assert m2_mats[1] is not None
    with pytest.raises(ValueError, match="conditioning mismatch"):
        run_mh_chain(m2_mats, x2, vb, g, z0, None, jax.random.PRNGKey(0),
                     n_burn=0, n_samples=1, var_rw=0.0, interpret=True,
                     tile=16)


def test_run_mcem_kernel_path_interpret(setup):
    """Full MCEM with the kernel path (interpreter) produces sane masks that
    broadly agree with the XLA-scan engine on the same problem."""
    model, params, mats, dec, x2, vb, g, z0 = setup
    x2b = x2.reshape(B, N, F)
    z0b = z0.reshape(B, N, L)
    mask = jnp.ones((B, N))
    cfg = McemConfig(niter=3, nsamples_e_step=2, burnin_e_step=2,
                     nsamples_wf=3, burnin_wf=2)
    nmf = init_nmf(jax.random.PRNGKey(9), B, N, F, cfg.nmf_rank, cfg.eps)
    res_k = run_mcem(dec, x2b, z0b, mask, jax.random.PRNGKey(3), cfg,
                     nmf_init=nmf, decoder_mats=mats, use_pallas=True,
                     pallas_interpret=True)
    res_x = run_mcem(dec, x2b, z0b, mask, jax.random.PRNGKey(3), cfg,
                     nmf_init=nmf, use_pallas=False)
    for r in (res_k, res_x):
        wfs = np.asarray(r.wfs)
        assert np.isfinite(wfs).all() and (wfs >= 0).all() and (wfs <= 1 + 1e-5).all()
    # different RNG consumption order -> statistical agreement only
    assert abs(float(res_k.cost[-1]) - float(res_x.cost[-1])) < 0.5 * abs(
        float(res_x.cost[-1])
    )


def test_non_square_hidden_stack(setup):
    """Decoder hidden stacks need not be square (h_dim=(128, 64) gives a
    (64,128) decoder); the kernel's block specs must use each layer's true
    width (regression: silently truncated w2/w3 reads)."""
    model = VAE(x_dim=F, z_dim=L, h_dim=(64, 32))  # decoder hidden (32, 64)
    params = model.init(
        {"params": jax.random.PRNGKey(3), "sample": jax.random.PRNGKey(4)},
        jnp.ones((4, F)),
    )
    mats = extract_decoder_mlp(params, L)
    assert mats is not None
    rng = jax.random.PRNGKey(8)
    x2 = jax.random.uniform(rng, (ROWS, F)) + 0.05
    vb = jnp.ones((ROWS, F)) * 0.1
    g = jnp.ones((ROWS,))
    z0 = 0.1 * jax.random.normal(rng, (ROWS, L))
    zf, samples = run_mh_chain(
        mats, x2, vb, g, z0, None, jax.random.PRNGKey(0),
        n_burn=0, n_samples=1, var_rw=0.0, interpret=True, tile=16,
    )
    want = np.asarray(model.apply(params, z0, method="decode"))
    np.testing.assert_allclose(np.asarray(samples[0]), want, rtol=2e-5, atol=1e-6)
