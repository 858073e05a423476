"""MCEM engine tests: NMF cost descent, masked-batch vs. per-utterance
equivalence on the deterministic (var_rw=0) path, Wiener-mask identities,
and a synthetic separation smoke test."""

import jax
import jax.numpy as jnp
import numpy as np

from dvae_tpu.enhance import McemConfig, run_mcem
from dvae_tpu.enhance.nmf import compute_vb, init_nmf, nmf_m_step

F, K, L = 65, 4, 8


def toy_decoder(zin):
    """Deterministic positive 'decoder': fixed random projection + exp."""
    d = zin.shape[-1]
    wmat = jax.random.normal(jax.random.PRNGKey(42), (d, F)) * 0.3
    return jnp.exp(jnp.clip(zin @ wmat, -6, 6)) + 0.01


def _mixture(b, n, key):
    ks = jax.random.split(key, 3)
    z_true = jax.random.normal(ks[0], (b, n, L))
    vs = toy_decoder(z_true)
    vb = 0.5 + 0.1 * jax.random.uniform(ks[1], (b, n, F))
    x2 = (vs + vb) * jnp.abs(jax.random.normal(ks[2], (b, n, F))) ** 2
    return x2 + 1e-3, z_true


def test_nmf_m_step_decreases_cost():
    key = jax.random.PRNGKey(0)
    b, n = 2, 50
    x2, _ = _mixture(b, n, key)
    vs = jnp.ones((1, b, n, F)) * 0.2
    mask = jnp.ones((b, n))
    w, h, g = init_nmf(jax.random.PRNGKey(1), b, n, F, K, 1e-8)

    def cost(w, h, g):
        vx = g[:, :, None] * vs[0] + compute_vb(w, h)
        return float(jnp.mean(jnp.log(vx) + x2 / vx))

    costs = [cost(w, h, g)]
    for _ in range(20):
        w, h, g, _ = nmf_m_step(x2, vs, w, h, g, mask)
        costs.append(cost(w, h, g))
    assert costs[-1] < costs[0]
    # multiplicative IS-NMF updates should be (near-)monotone
    assert all(c2 <= c1 + 1e-4 for c1, c2 in zip(costs, costs[1:]))


def test_masked_batch_matches_trimmed_runs():
    """Deterministic path (var_rw=0): a padded 2-utterance batch must equal
    per-utterance exact-length runs, proving frame masking is airtight."""
    cfg = McemConfig(niter=8, nsamples_e_step=3, burnin_e_step=2, nsamples_wf=4,
                     burnin_wf=2, var_rw=0.0, nmf_rank=K)
    key = jax.random.PRNGKey(3)
    n1, n2 = 40, 28
    x2_full, _ = _mixture(2, n1, key)
    x2_a, x2_b = x2_full[0:1], x2_full[1:2, :n2]

    z0 = jax.random.normal(jax.random.PRNGKey(4), (2, n1, L)) * 0.5
    w, h, g = init_nmf(jax.random.PRNGKey(5), 2, n1, F, K, 1e-8)

    mask = jnp.stack([jnp.ones(n1), (jnp.arange(n1) < n2).astype(jnp.float32)])
    batched = run_mcem(toy_decoder, x2_full, z0, mask, jax.random.PRNGKey(6),
                       cfg, nmf_init=(w, h, g))

    solo_a = run_mcem(toy_decoder, x2_a, z0[0:1], jnp.ones((1, n1)),
                      jax.random.PRNGKey(6), cfg, nmf_init=(w[0:1], h[0:1], g[0:1]))
    solo_b = run_mcem(toy_decoder, x2_b, z0[1:2, :n2], jnp.ones((1, n2)),
                      jax.random.PRNGKey(6), cfg,
                      nmf_init=(w[1:2], h[1:2, :n2], g[1:2, :n2]))

    np.testing.assert_allclose(np.asarray(batched.wfs[0]), np.asarray(solo_a.wfs[0]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(batched.wfs[1, :n2]), np.asarray(solo_b.wfs[0]),
                               rtol=2e-4, atol=2e-5)
    # padded frames must be exactly zeroed
    assert float(jnp.abs(batched.wfs[1, n2:]).max()) == 0.0


def test_mcem_masks_partition_unity_and_cost_decreases():
    cfg = McemConfig(niter=15, nsamples_e_step=4, burnin_e_step=6, nsamples_wf=6,
                     burnin_wf=6, var_rw=0.01, nmf_rank=K)
    b, n = 2, 40
    x2, z_true = _mixture(b, n, jax.random.PRNGKey(7))
    mask = jnp.ones((b, n))
    res = run_mcem(toy_decoder, x2, jnp.zeros((b, n, L)), mask,
                   jax.random.PRNGKey(8), cfg)
    wsum = np.asarray(res.wfs + res.wfn)
    np.testing.assert_allclose(wsum, 1.0, atol=1e-4)
    assert np.all(np.asarray(res.wfs) >= 0) and np.all(np.asarray(res.wfs) <= 1 + 1e-5)
    cost = np.asarray(res.cost)
    assert cost[-1] < cost[0], f"cost did not decrease: {cost[:3]} -> {cost[-3:]}"


def test_fast_stats_matches_f32_engine():
    """bf16 HBM residency of the chain stats (fast_stats, the default) is a
    storage optimization, not an algorithm change: on the deterministic
    var_rw=0 path it must track the all-f32 engine to bf16 rounding."""
    base = dict(niter=6, nsamples_e_step=3, burnin_e_step=2, nsamples_wf=4,
                burnin_wf=2, var_rw=0.0, nmf_rank=K)
    b, n = 2, 30
    x2, _ = _mixture(b, n, jax.random.PRNGKey(11))
    z0 = jax.random.normal(jax.random.PRNGKey(12), (b, n, L)) * 0.5
    mask = jnp.ones((b, n))
    nmf = init_nmf(jax.random.PRNGKey(13), b, n, F, K, 1e-8)
    fast = run_mcem(toy_decoder, x2, z0, mask, jax.random.PRNGKey(14),
                    McemConfig(**base, fast_stats=True), nmf_init=nmf)
    slow = run_mcem(toy_decoder, x2, z0, mask, jax.random.PRNGKey(14),
                    McemConfig(**base, fast_stats=False), nmf_init=nmf)
    np.testing.assert_allclose(np.asarray(fast.wfs), np.asarray(slow.wfs),
                               rtol=0.05, atol=5e-3)
    np.testing.assert_allclose(np.asarray(fast.cost), np.asarray(slow.cost),
                               rtol=2e-2)


def test_masked_batch_matches_trimmed_runs_conditional():
    """Same airtight-masking contract as the unconditional test, on the
    y-conditioned (M2) decoder path: padded y rows must be inert too."""
    cfg = McemConfig(niter=5, nsamples_e_step=2, burnin_e_step=2, nsamples_wf=3,
                     burnin_wf=2, var_rw=0.0, nmf_rank=K)
    n1, n2, ydim = 30, 22, 1
    x2_full, _ = _mixture(2, n1, jax.random.PRNGKey(20))
    y_full = (jax.random.uniform(jax.random.PRNGKey(21), (2, n1, ydim)) > 0.5
              ).astype(jnp.float32)
    z0 = jax.random.normal(jax.random.PRNGKey(22), (2, n1, L - ydim)) * 0.5
    w, h, g = init_nmf(jax.random.PRNGKey(23), 2, n1, F, K, 1e-8)
    mask = jnp.stack([jnp.ones(n1), (jnp.arange(n1) < n2).astype(jnp.float32)])

    batched = run_mcem(toy_decoder, x2_full, z0, mask, jax.random.PRNGKey(24),
                       cfg, y=y_full, nmf_init=(w, h, g))
    solo = run_mcem(toy_decoder, x2_full[1:2, :n2], z0[1:2, :n2],
                    jnp.ones((1, n2)), jax.random.PRNGKey(24), cfg,
                    y=y_full[1:2, :n2],
                    nmf_init=(w[1:2], h[1:2, :n2], g[1:2, :n2]))
    np.testing.assert_allclose(np.asarray(batched.wfs[1, :n2]),
                               np.asarray(solo.wfs[0]), rtol=2e-4, atol=2e-5)
    assert float(jnp.abs(batched.wfs[1, n2:]).max()) == 0.0


def test_mcem_conditional_y():
    """y-conditioned decoder path (M2 variants) runs and respects shapes."""
    cfg = McemConfig(niter=3, nsamples_e_step=2, burnin_e_step=2, nsamples_wf=2,
                     burnin_wf=2, nmf_rank=K)
    b, n, ydim = 2, 20, 1
    x2, _ = _mixture(b, n, jax.random.PRNGKey(9))
    y = jnp.ones((b, n, ydim))
    res = run_mcem(toy_decoder, x2, jnp.zeros((b, n, L)), jnp.ones((b, n)),
                   jax.random.PRNGKey(10), cfg, y=y)
    assert res.wfs.shape == (b, n, F)


def test_fixed_z_em_matches_frozen_chain():
    """run_em_fixed_z (the clean_z_nomcem ablation) must equal run_mcem with
    var_rw=0 and the same pinned latent: a zero-variance proposal never moves
    the chain, so every Monte-Carlo 'sample' is the pinned z and the two
    formulations reduce to the same deterministic EM (the R identical
    samples scale every M-step numerator and denominator alike)."""
    cfg = McemConfig(niter=6, nsamples_e_step=3, burnin_e_step=2,
                     nsamples_wf=4, burnin_wf=2, var_rw=0.0, nmf_rank=K,
                     fast_stats=False, fast_decoder=False)
    b, n1, n2 = 2, 30, 21
    x2, _ = _mixture(b, n1, jax.random.PRNGKey(30))
    z0 = jax.random.normal(jax.random.PRNGKey(31), (b, n1, L)) * 0.5
    w, h, g = init_nmf(jax.random.PRNGKey(32), b, n1, F, K, 1e-8)
    mask = jnp.stack([jnp.ones(n1), (jnp.arange(n1) < n2).astype(jnp.float32)])

    from dvae_tpu.enhance.mcem import run_em_fixed_z

    frozen = run_mcem(toy_decoder, x2, z0, mask, jax.random.PRNGKey(33), cfg,
                      nmf_init=(w, h, g))
    fixed = run_em_fixed_z(toy_decoder, x2, z0, mask, cfg,
                           nmf_init=(w, h, g))
    np.testing.assert_allclose(np.asarray(fixed.wfs), np.asarray(frozen.wfs),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(fixed.wfn), np.asarray(frozen.wfn),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(fixed.cost), np.asarray(frozen.cost),
                               rtol=1e-5)
    # deterministic Wiener partition on valid frames, exact zero on padding
    part = np.asarray(fixed.wfs + fixed.wfn)
    np.testing.assert_allclose(part[0], 1.0, atol=1e-5)
    assert float(jnp.abs(fixed.wfs[1, n2:]).max()) == 0.0


def test_fixed_z_em_conditional_and_cost_descends():
    """The y-conditioned fixed-z path (M2 clean_z_nomcem): decoder consumes
    [z; y], EM cost is (near-)monotone like the NMF updates it reduces to."""
    from dvae_tpu.enhance.mcem import run_em_fixed_z

    cfg = McemConfig(niter=15, nmf_rank=K)
    b, n, ydim = 2, 24, 1
    x2, _ = _mixture(b, n, jax.random.PRNGKey(34))
    y = (jax.random.uniform(jax.random.PRNGKey(35), (b, n, ydim)) > 0.5
         ).astype(jnp.float32)
    z0 = jax.random.normal(jax.random.PRNGKey(36), (b, n, L - ydim)) * 0.5
    res = run_em_fixed_z(toy_decoder, x2, z0, jnp.ones((b, n)), cfg, y=y,
                         key=jax.random.PRNGKey(37))
    c = np.asarray(res.cost)
    assert c[-1] < c[0]
    assert all(c2 <= c1 + 1e-4 for c1, c2 in zip(c, c[1:]))


def test_silent_utterance_in_batch_stays_finite():
    """A digitally silent utterance (all-zero wav — e.g. a corrupt file) in
    a batched run: the NMF W-update collapses its dictionary to zero and an
    unfloored column renormalization would NaN that row's masks and the
    batch-summed cost scalar (the reference divides unguarded,
    mcem.py:130-134). The floored norm keeps everything finite: the silent
    row's masks go to ~0 and the real row keeps the Wiener partition."""
    rng = np.random.default_rng(11)
    b, n, f, l = 2, 24, 33, 3
    x2 = jnp.asarray(
        np.concatenate([
            np.abs(rng.standard_normal((1, n, f))).astype(np.float32) + 0.01,
            np.zeros((1, n, f), np.float32),  # silent utterance
        ]))
    mask = jnp.ones((b, n))
    z0 = jnp.asarray(rng.standard_normal((b, n, l)).astype(np.float32))
    wd = rng.standard_normal((l, f)).astype(np.float32) * 0.1
    dec = lambda z: jnp.exp(jnp.clip(z @ jnp.asarray(wd), -10, 3))

    cfg = McemConfig(niter=4, nsamples_e_step=2, burnin_e_step=2,
                     nsamples_wf=2, burnin_wf=2, nmf_rank=4)
    res = run_mcem(dec, x2, z0, mask, jax.random.PRNGKey(0), cfg)
    assert np.isfinite(np.asarray(res.wfs)).all()
    assert np.isfinite(np.asarray(res.wfn)).all()
    assert np.isfinite(np.asarray(res.cost)).all()
    # silent row: numerator energy is zero everywhere -> ~zero speech mask
    assert float(jnp.max(res.wfs[1])) < 1e-3
    # real row: unaffected by the degenerate neighbor — partition holds
    np.testing.assert_allclose(np.asarray(res.wfs[0] + res.wfn[0]), 1.0,
                               atol=1e-4)


# ---------------------------------------------------------------------------
# run_peem — the gradient-based point-estimate engine (beyond-reference)
# ---------------------------------------------------------------------------

def test_peem_steps0_is_fixed_z():
    """With peem_steps=0 the latent never moves, so PEEM degenerates to
    run_em_fixed_z(z_init): identical algorithm, pinned to float tolerance
    (not bitwise — fixed_z hoists dec(z) out of the EM scan as a true loop
    invariant while PEEM recomputes it per iteration, so XLA fuses the two
    programs differently; observed delta is 1-2 ULP). The LATENT must be
    bitwise-unmoved."""
    from dvae_tpu.enhance.mcem import run_em_fixed_z, run_peem

    cfg = McemConfig(niter=8, nmf_rank=K, peem_steps=0, fast_stats=False)
    b, n = 2, 26
    x2, _ = _mixture(b, n, jax.random.PRNGKey(60))
    z0 = jax.random.normal(jax.random.PRNGKey(61), (b, n, L)) * 0.5
    nmf = init_nmf(jax.random.PRNGKey(62), b, n, F, K, 1e-8)
    mask = jnp.stack([jnp.ones(n), (jnp.arange(n) < 17).astype(jnp.float32)])

    peem = run_peem(toy_decoder, x2, z0, mask, cfg, nmf_init=nmf)
    fixed = run_em_fixed_z(toy_decoder, x2, z0, mask, cfg, nmf_init=nmf)
    assert np.array_equal(np.asarray(peem.z), np.asarray(z0))
    np.testing.assert_allclose(np.asarray(peem.wfs), np.asarray(fixed.wfs),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(peem.wfn), np.asarray(fixed.wfn),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(peem.cost), np.asarray(fixed.cost),
                               rtol=1e-5)


def test_peem_cost_descends_below_pinned_and_is_deterministic():
    """The MAP E-step must buy something: PEEM's final EM cost is strictly
    below the pinned-latent (steps=0) EM's on the same inputs; the whole
    program is bitwise-reproducible run-to-run (no sampling); the Wiener
    partition identity holds."""
    from dvae_tpu.enhance.mcem import run_peem

    b, n = 2, 32
    x2, _ = _mixture(b, n, jax.random.PRNGKey(63))
    z0 = jnp.zeros((b, n, L))
    mask = jnp.ones((b, n))
    nmf = init_nmf(jax.random.PRNGKey(64), b, n, F, K, 1e-8)
    cfg = McemConfig(niter=25, nmf_rank=K, peem_steps=4, peem_lr=1e-2)
    res = run_peem(toy_decoder, x2, z0, mask, cfg, nmf_init=nmf)
    pinned = run_peem(toy_decoder, x2, z0, mask,
                      McemConfig(niter=25, nmf_rank=K, peem_steps=0),
                      nmf_init=nmf)
    assert float(res.cost[-1]) < float(pinned.cost[-1])
    cost = np.asarray(res.cost)
    assert cost[-1] < cost[0]
    np.testing.assert_allclose(np.asarray(res.wfs + res.wfn), 1.0, atol=1e-4)
    again = run_peem(toy_decoder, x2, z0, mask, cfg, nmf_init=nmf)
    assert np.array_equal(np.asarray(res.wfs), np.asarray(again.wfs))
    assert np.array_equal(np.asarray(res.z), np.asarray(again.z))


def test_peem_masked_batch_matches_trimmed_runs():
    """Frame masking is airtight for PEEM too: the energy, its gradient and
    Adam's moments are all per-frame separable, so a padded batch must equal
    per-utterance exact-length runs on the valid frames."""
    from dvae_tpu.enhance.mcem import run_peem

    cfg = McemConfig(niter=8, nmf_rank=K, peem_steps=3, peem_lr=1e-2)
    n1, n2 = 30, 19
    x2_full, _ = _mixture(2, n1, jax.random.PRNGKey(65))
    x2_b = x2_full[1:2, :n2]
    z0 = jax.random.normal(jax.random.PRNGKey(66), (2, n1, L)) * 0.5
    w, h, g = init_nmf(jax.random.PRNGKey(67), 2, n1, F, K, 1e-8)
    mask = jnp.stack([jnp.ones(n1), (jnp.arange(n1) < n2).astype(jnp.float32)])

    batched = run_peem(toy_decoder, x2_full, z0, mask, cfg,
                       nmf_init=(w, h, g))
    solo = run_peem(toy_decoder, x2_b, z0[1:2, :n2], jnp.ones((1, n2)), cfg,
                    nmf_init=(w[1:2], h[1:2, :n2], g[1:2, :n2]))
    np.testing.assert_allclose(np.asarray(batched.wfs[1, :n2]),
                               np.asarray(solo.wfs[0]), rtol=2e-4, atol=2e-5)
    assert float(jnp.abs(batched.wfs[1, n2:]).max()) == 0.0


def test_peem_conditional_y():
    """Decoder conditioning ([z; y]) flows through the energy and its
    gradient; partition identity and cost descent hold."""
    from dvae_tpu.enhance.mcem import run_peem

    def cond_decoder(zin):
        return toy_decoder(zin)

    b, n, ydim = 2, 24, 1
    x2, _ = _mixture(b, n, jax.random.PRNGKey(68))
    y = (jax.random.uniform(jax.random.PRNGKey(69), (b, n, ydim)) > 0.5
         ).astype(jnp.float32)
    mask = jnp.ones((b, n))
    res = run_peem(cond_decoder, x2, jnp.zeros((b, n, L - ydim)), mask,
                   McemConfig(niter=12, nmf_rank=K, peem_steps=3), y=y,
                   key=jax.random.PRNGKey(70))
    np.testing.assert_allclose(np.asarray(res.wfs + res.wfn), 1.0, atol=1e-4)
    assert float(res.cost[-1]) < float(res.cost[0])


def test_peem_wf_hybrid_engine():
    """run_peem_wf = PEEM's EM loop + MCEM's sampled Wiener expectation:
    masks partition to 1 on valid frames, cost trajectory equals pure
    PEEM's bitwise (same deterministic EM path), and the masks differ from
    pure PEEM's point evaluation (the chain actually sampled)."""
    import numpy as np

    from dvae_tpu.enhance.mcem import McemConfig, run_peem, run_peem_wf

    rng = np.random.default_rng(3)
    b, n, f, l = 2, 12, 33, 4
    x2 = jnp.asarray(np.abs(rng.standard_normal((b, n, f))).astype(np.float32) + 0.1)
    z0 = jnp.asarray(rng.standard_normal((b, n, l)).astype(np.float32))
    mask = jnp.asarray((np.arange(n)[None, :] < np.array([[12], [9]])).astype(np.float32))
    w1 = rng.standard_normal((l, 16)).astype(np.float32) * 0.2
    b1 = np.zeros(16, np.float32)
    w2 = rng.standard_normal((16, 16)).astype(np.float32) * 0.2
    b2 = np.zeros(16, np.float32)
    w3 = rng.standard_normal((16, f)).astype(np.float32) * 0.2
    b3 = np.zeros(f, np.float32)

    def dec(zin):
        h = jnp.tanh(zin @ w1 + b1)
        h = jnp.tanh(h @ w2 + b2)
        return jnp.exp(h @ w3 + b3)

    cfg = McemConfig(niter=4, peem_steps=2, nsamples_wf=5, burnin_wf=5,
                     fast_decoder=False, fast_stats=False)
    key = jax.random.PRNGKey(11)
    hy = run_peem_wf(dec, x2, z0, mask, cfg, key=key)
    pe = run_peem(dec, x2, z0, mask, cfg, key=key)

    m3 = np.broadcast_to(np.asarray(mask)[:, :, None], (b, n, f))
    np.testing.assert_allclose(np.asarray(hy.wfs + hy.wfn), m3, atol=1e-5)
    assert np.isfinite(np.asarray(hy.cost)).all()
    # same key -> same NMF init stream -> identical deterministic EM path
    np.testing.assert_allclose(np.asarray(hy.cost), np.asarray(pe.cost),
                               rtol=1e-6)
    # ...but the final masks are the chain average, not the point mask
    assert np.abs(np.asarray(hy.wfs - pe.wfs)).max() > 1e-4
    # masked frames are zero
    assert float(jnp.abs(hy.wfs * (1 - mask[:, :, None])).max()) == 0.0


def test_pmcem_partition_cost_and_masked_batch():
    """run_pmcem (parallel-chain MCEM): masks partition to 1 on valid
    frames, cost descends and stays finite, masked padded frames are
    zero, and the engine matches the sequential run_mcem STATISTICALLY
    (final cost within the spread of the two stochastic engines on the
    same problem). Also pins the masked-batch property the other engines
    have: a padded batch equals per-utterance runs is NOT required
    (chains couple through nothing across utterances, but key streams
    differ by shape) — instead we pin that padded frames never leak."""
    b, n = 2, 16
    x2, _ = _mixture(b, n, jax.random.PRNGKey(0))
    z0 = jax.random.normal(jax.random.PRNGKey(1), (b, n, L))
    mask = jnp.asarray(
        (np.arange(n)[None, :] < np.array([[16], [11]])).astype(np.float32))
    cfg = McemConfig(niter=6, pmcem_chains=4, pmcem_steps=3,
                     nsamples_wf=6, nmf_rank=K, fast_stats=False)
    from dvae_tpu.enhance.mcem import run_pmcem

    res = run_pmcem(toy_decoder, x2, z0, mask, jax.random.PRNGKey(2), cfg)
    m3 = np.broadcast_to(np.asarray(mask)[:, :, None], x2.shape)
    np.testing.assert_allclose(
        np.asarray(res.wfs + res.wfn) * m3, m3, atol=1e-5)
    cost = np.asarray(res.cost)
    assert np.isfinite(cost).all() and cost[-1] < cost[0]
    assert float(jnp.abs(res.wfs * (1 - mask[:, :, None])).max()) == 0.0
    # statistical agreement with the sequential engine on the same input
    ref = run_mcem(toy_decoder, x2, z0, mask, jax.random.PRNGKey(2),
                   McemConfig(niter=6, nsamples_e_step=4, burnin_e_step=4,
                              nsamples_wf=6, burnin_wf=6, nmf_rank=K,
                              fast_stats=False))
    assert abs(float(res.cost[-1]) - float(ref.cost[-1])) < 0.1 * abs(
        float(ref.cost[-1]))


def test_pmcem_conditional_y():
    """pmcem broadcasts the (B,N,Y) conditioning over the chain axis: the
    conditional run differs from unconditional and stays partition-exact."""
    from dvae_tpu.enhance.mcem import run_pmcem

    b, n = 2, 10
    x2, _ = _mixture(b, n, jax.random.PRNGKey(5))
    z0 = jax.random.normal(jax.random.PRNGKey(6), (b, n, L))
    mask = jnp.ones((b, n))
    y = (jax.random.uniform(jax.random.PRNGKey(7), (b, n, 1)) > 0.5)
    y = y.astype(jnp.float32)
    cfg = McemConfig(niter=3, pmcem_chains=3, pmcem_steps=2,
                     nsamples_wf=4, nmf_rank=K, fast_stats=False)
    res_c = run_pmcem(toy_decoder, x2, z0, mask, jax.random.PRNGKey(8),
                      cfg, y=y)
    res_u = run_pmcem(toy_decoder, x2, z0, mask, jax.random.PRNGKey(8), cfg)
    m3 = np.broadcast_to(np.asarray(mask)[:, :, None], x2.shape)
    np.testing.assert_allclose(
        np.asarray(res_c.wfs + res_c.wfn) * m3, m3, atol=1e-5)
    assert np.abs(np.asarray(res_c.wfs - res_u.wfs)).max() > 1e-4
