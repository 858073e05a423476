"""Model-family and loss tests: shapes, init statistics, parameter-tree
structure (for the two-optimizer split), and loss parity against a torch
oracle evaluating the reference's formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvae_tpu.models import (
    CVAE,
    init_params,
    CVAE_v2,
    CVAE_v3,
    CVAE_v4,
    DisentangledVAE,
    EncoderClassifier,
    LSTMVad,
    VAE,
)
from dvae_tpu.models import losses

K = jax.random.PRNGKey(0)
RNGS = {"params": K, "sample": jax.random.PRNGKey(1)}
X = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (8, 513))) + 0.1
Y1 = jnp.ones((8, 1))
Y513 = jnp.ones((8, 513))


def n_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def test_vae_forward_shapes():
    m = VAE()
    params = m.init(RNGS, X)
    r, mu, logvar = m.apply(params, X, rngs={"sample": K})
    assert r.shape == (8, 513) and mu.shape == (8, 16) and logvar.shape == (8, 16)
    assert bool(jnp.all(r > 0)), "decoder output must be a positive variance"
    # analytic param count: enc 513->128->128->(16 mu + 16 lv), dec 16->128->128->513
    expect = (513 * 128 + 128) + (128 * 128 + 128) + 2 * (128 * 16 + 16) + (
        16 * 128 + 128
    ) + (128 * 128 + 128) + (128 * 513 + 513)
    assert n_params(params) == expect


@pytest.mark.parametrize("y", [Y1, Y513])
def test_cvae_families(y):
    for cls in (CVAE, CVAE_v2, CVAE_v3):
        m = cls(y_dim=y.shape[-1])
        params = init_params(m, RNGS, X, y)
        r, mu, logvar = m.apply(params, X, y, rngs={"sample": K})
        assert r.shape == (8, 513) and mu.shape == (8, 16)


def test_cvae_v4_and_disentangled_return_z():
    for cls in (CVAE_v4, DisentangledVAE):
        m = cls(y_dim=1)
        params = init_params(m, RNGS, X, Y1)
        r, z, mu, logvar = m.apply(params, X, Y1, rngs={"sample": K})
        assert z.shape == (8, 16)
        yx = m.apply(params, X, method="classify_from_x")
        yz = m.apply(params, z, method="classify_from_z")
        assert yx.shape == (8, 1) and yz.shape == (8, 1)
        assert bool(jnp.all((yx >= 0) & (yx <= 1)))


def test_disentangled_param_tree_split():
    m = DisentangledVAE()
    params = init_params(m, RNGS, X, Y1)
    top = set(params["params"].keys())
    assert top == {"enc_dec_clf", "auxiliary"}
    sub = set(params["params"]["enc_dec_clf"].keys())
    assert sub == {"encoder", "decoder", "classifier"}


def test_encoder_classifier():
    m = EncoderClassifier()
    params = init_params(m, RNGS, X)
    z, mu, logvar = m.apply(params, X, rngs={"sample": K})
    y = m.apply(params, X, method="classify")
    assert z.shape == (8, 16) and y.shape == (8, 1)


def test_lstm_vad():
    m = LSTMVad(x_dim=64, hidden=32, num_layers=2)
    xs = jax.random.normal(K, (2, 10, 64))
    params = m.init({"params": K}, xs)
    p = m.apply(params, xs)
    assert p.shape == (2, 10)
    assert bool(jnp.all((p >= 0) & (p <= 1)))


def test_reparametrization_statistics():
    m = VAE()
    params = m.init(RNGS, X)
    zs = []
    for i in range(200):
        z, mu, _ = m.apply(
            params, X, method="encode", rngs={"sample": jax.random.PRNGKey(i)}
        )
        zs.append(np.asarray(z))
    zmean = np.mean(zs, axis=0)
    np.testing.assert_allclose(zmean, np.asarray(mu), atol=0.25)


def test_elbo_matches_torch_oracle():
    import torch

    rng = np.random.default_rng(0)
    x = np.abs(rng.standard_normal((16, 513))).astype(np.float32) + 0.1
    r = np.abs(rng.standard_normal((16, 513))).astype(np.float32) + 0.1
    mu = rng.standard_normal((16, 16)).astype(np.float32)
    logvar = rng.standard_normal((16, 16)).astype(np.float32)
    eps = 1e-8

    tx, tr, tmu, tlv = map(torch.tensor, (x, r, mu, logvar))
    recon_t = torch.mean(torch.sum(tx / tr - torch.log(tx + eps) + torch.log(tr) - 1, dim=-1))
    kl_t = -0.5 * torch.mean(torch.sum(tlv - tmu.pow(2) - tlv.exp(), dim=-1))

    total, recon, kl = losses.elbo(jnp.asarray(x), jnp.asarray(r), jnp.asarray(mu), jnp.asarray(logvar), eps)
    np.testing.assert_allclose(float(recon), float(recon_t), rtol=1e-5)
    np.testing.assert_allclose(float(kl), float(kl_t), rtol=1e-5)
    np.testing.assert_allclose(float(total), float(recon_t + kl_t), rtol=1e-5)


def test_bce_matches_torch_oracle():
    import torch

    rng = np.random.default_rng(1)
    r = rng.uniform(0.01, 0.99, (16, 5)).astype(np.float32)
    y = (rng.uniform(size=(16, 5)) > 0.5).astype(np.float32)
    eps = 1e-8
    tr, ty = torch.tensor(r), torch.tensor(y)
    ref = -torch.mean(torch.sum(ty * torch.log(tr + eps) + (1 - ty) * torch.log(1 - tr + eps), dim=-1))
    ours = losses.binary_cross_entropy(jnp.asarray(r), jnp.asarray(y), eps)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_f1_loss():
    # vector chosen with FP != FN so a precision/recall swap — the exact
    # reference bug MIGRATING.md documents fixing — CANNOT pass: TP=3,
    # FP=1, FN=0 -> precision 3/4, recall 1
    y = jnp.asarray([1, 1, 0, 0, 1], dtype=jnp.float32)
    yh = jnp.asarray([1, 1, 1, 0, 1], dtype=jnp.float32)
    acc, prec, rec, f1 = losses.f1_loss(yh, y)
    assert abs(float(acc) - 0.8) < 1e-6
    assert abs(float(prec) - 3 / 4) < 1e-6
    assert abs(float(rec) - 1.0) < 1e-6
    assert abs(float(f1) - 2 * (3 / 4) / (3 / 4 + 1)) < 1e-6


def test_f1_loss_mask_excludes_padding():
    """mask must exclude padded positions from ALL four counts — unmasked,
    padding scores as true negatives and inflates accuracy (the reference
    instead slices each utterance to its true length before counting,
    train_audio_net.py:246-252)."""
    rng = np.random.default_rng(7)
    y = (rng.uniform(size=(3, 10)) > 0.5).astype(np.float32)
    yh = (rng.uniform(size=(3, 10)) > 0.5).astype(np.float32)
    lengths = [10, 6, 3]
    mask = np.zeros((3, 10), np.float32)
    for i, L in enumerate(lengths):
        mask[i, :L] = 1.0
    got = losses.f1_loss(jnp.asarray(yh * mask), jnp.asarray(y * mask),
                         mask=jnp.asarray(mask))
    # oracle: concatenate the per-length slices, then count
    ys = np.concatenate([y[i, :L] for i, L in enumerate(lengths)])
    yhs = np.concatenate([yh[i, :L] for i, L in enumerate(lengths)])
    want = losses.f1_loss(jnp.asarray(yhs), jnp.asarray(ys))
    for g, w in zip(got, want):
        np.testing.assert_allclose(float(g), float(w), atol=1e-6)
    # and the unmasked computation on zero-padded inputs really does differ
    padded = losses.f1_loss(jnp.asarray(yh * mask), jnp.asarray(y * mask))
    assert float(padded[0]) > float(got[0])  # accuracy inflated by padding


def test_u_loss_finite_at_saturation_under_jit():
    """A saturated classifier output (exactly 0.0/1.0 in float32) must not
    NaN the U objective under jit: XLA reassociates the reference's
    1 - y + eps (utils.py:96) into (1 + eps) - y == 1 - y in float32, so the
    entropy term hits 0 * log(0) — same hazard as the BCE family, same
    clip-inside-the-log fix."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(np.abs(rng.standard_normal((4, 513))) + 0.1, jnp.float32)
    r = jnp.asarray(np.abs(rng.standard_normal((4, 513))) + 0.1, jnp.float32)
    mu = jnp.zeros((4, 16))
    lv = jnp.zeros((4, 16))
    yh = jnp.asarray([[0.0], [1.0], [0.5], [0.3]], jnp.float32)
    U, L, recon, kl = jax.jit(losses.U_loss)(x, r, mu, lv, yh)
    assert np.isfinite(float(U)) and np.isfinite(float(L))
    # value parity with the un-jitted reference form away from saturation
    U2, *_ = losses.U_loss(x, r, mu, lv, jnp.full((4, 1), 0.3))
    U2j, *_ = jax.jit(losses.U_loss)(x, r, mu, lv, jnp.full((4, 1), 0.3))
    np.testing.assert_allclose(float(U2), float(U2j), rtol=1e-6)


def test_u_loss_runs():
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.abs(rng.standard_normal((8, 513))) + 0.1, dtype=jnp.float32)
    r = jnp.asarray(np.abs(rng.standard_normal((8, 513))) + 0.1, dtype=jnp.float32)
    mu = jnp.zeros((8, 16))
    lv = jnp.zeros((8, 16))
    yh = jnp.full((8, 1), 0.7)
    U, L, recon, kl = losses.U_loss(x, r, mu, lv, yh)
    assert np.isfinite(float(U)) and float(U) >= float(L)


def test_bce_finite_at_saturation_under_jit():
    """BCE of exactly-saturated sigmoid outputs must stay finite under jit.

    float32 cannot represent 1 - 1e-8, and XLA's reassociation of the
    additive (1 - r + eps) form reaches log(0); with a 0-weighted loss term
    this became 0*inf = nan and silently poisoned the M2-info classifier
    head (found driving training_M2_info_vad.py on the subset)."""
    import jax

    r = jnp.asarray([[0.0, 1.0, 0.5, 1.0]], jnp.float32)
    y = jnp.asarray([[0.0, 1.0, 1.0, 0.0]], jnp.float32)

    @jax.jit
    def f(r, y):
        b = losses.binary_cross_entropy(r, y)
        return b, 0.0 * b  # the alpha=0 pattern that turned inf into nan

    b, zb = f(r, y)
    assert np.isfinite(float(b)), float(b)
    assert float(zb) == 0.0
    for fn in (losses.binary_cross_entropy_v2, losses.binary_cross_entropy_v3):
        v = jax.jit(fn)(r)
        assert np.isfinite(float(v)), (fn.__name__, float(v))


def test_log_density_helpers_match_scipy():
    """log_standard_gaussian / log_gaussian vs scipy.stats.norm closed form
    (reference distributions.py:13-34 sums the per-dim log-pdfs)."""
    import scipy.stats

    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 6)).astype(np.float32)
    mu = rng.standard_normal((4, 6)).astype(np.float32)
    logvar = rng.standard_normal((4, 6)).astype(np.float32) * 0.5
    got = np.asarray(losses.log_standard_gaussian(jnp.asarray(x)))
    want = scipy.stats.norm.logpdf(x).sum(axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    got = np.asarray(losses.log_gaussian(jnp.asarray(x), jnp.asarray(mu), jnp.asarray(logvar)))
    want = scipy.stats.norm.logpdf(x, mu, np.exp(logvar / 2)).sum(axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_categorical_priors_and_discrete_helpers():
    """prior_categorical / log_standard_categorical / onehot /
    enumerate_discrete / log_sum_exp behavior (reference distributions.py:5-53,
    utils.py:5-53)."""
    p = np.asarray(losses.prior_categorical(3, 4))
    assert p.shape == (3, 4) and np.allclose(p, 0.25)

    # BCE of p against the fixed 0.5 prior: -sum[p log .5 + (1-p) log .5]
    y = np.asarray([[0.2, 0.9]], np.float32)
    got = float(losses.log_standard_categorical(jnp.asarray(y))[0])
    want = -np.sum(y * np.log(0.5 + 1e-8) + (1 - y) * np.log(0.5 + 1e-8))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    oh = np.asarray(losses.onehot(2, 5))
    np.testing.assert_array_equal(oh, [0, 0, 1, 0, 0])

    ed = np.asarray(losses.enumerate_discrete(3, 2))  # (y_dim*batch, y_dim)
    assert ed.shape == (6, 2)
    np.testing.assert_array_equal(ed[:3], np.tile([1, 0], (3, 1)))
    np.testing.assert_array_equal(ed[3:], np.tile([0, 1], (3, 1)))

    x = np.asarray([[1.0, 2.0, 3.0]], np.float32)
    got = float(losses.log_sum_exp(jnp.asarray(x))[0, 0])
    want = np.log(np.exp(x - x.max()).sum() + 1e-8) + x.max()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_mask_and_msa_losses_match_formulas():
    """BCE-2classes / MSE signal/mask / MSA vs direct numpy formulas
    (reference utils.py:65, :107-118)."""
    rng = np.random.default_rng(4)
    x = np.abs(rng.standard_normal((3, 5))).astype(np.float32)
    s = np.abs(rng.standard_normal((3, 5))).astype(np.float32)
    y = (rng.uniform(size=(3, 5)) > 0.5).astype(np.float32)
    y_hat = rng.uniform(size=(3, 5)).astype(np.float32)

    got = float(losses.binary_cross_entropy_2classes(
        jnp.asarray(y_hat), jnp.asarray(1 - y_hat), jnp.asarray(y)))
    r1, r2 = np.clip(y_hat, 1e-8, 1), np.clip(1 - y_hat, 1e-8, 1)
    want = -np.mean(np.sum(y * np.log(r1) + (1 - y) * np.log(r2), axis=-1))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    got = float(losses.mean_square_error_signal(jnp.asarray(x), jnp.asarray(y), jnp.asarray(y_hat)))
    np.testing.assert_allclose(got, np.mean(np.sum(((y - y_hat) * x) ** 2, -1)), rtol=1e-6)
    got = float(losses.mean_square_error_mask(jnp.asarray(y), jnp.asarray(y_hat)))
    np.testing.assert_allclose(got, np.mean(np.sum((y - y_hat) ** 2, -1)), rtol=1e-6)
    got = float(losses.magnitude_spectrum_approximation_loss(
        jnp.asarray(x), jnp.asarray(s), jnp.asarray(y_hat)))
    np.testing.assert_allclose(got, np.mean(np.sum((s - y_hat * x) ** 2, -1)), rtol=1e-6)
