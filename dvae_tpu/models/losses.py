"""Loss library: Itakura-Saito ELBO, BCE family, semi-supervised L/U losses,
mask regression losses, F1 statistics, and log-density helpers.

Numerical parity with /root/reference/packages/models/utils.py and
packages/models/distributions.py (cited per function). Reductions follow the
reference exactly: "sum over the feature axis, mean over the batch".
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Binary cross-entropies (models/utils.py:55-66)
# ---------------------------------------------------------------------------


# float32 cannot represent 1 - 1e-8 (ulp at 1.0 is ~6e-8): a clip upper
# bound that rounds back to 1.0 would leave log(1-r) = -inf, and XLA's
# reassociation of the reference's additive form (1 - r + eps) hits the
# same -inf, which 0-weighted loss terms then turn into 0*inf = nan.
_SAT = 1.2e-7


def binary_cross_entropy(r, x, eps: float = 1e-8):
    """-mean_B sum_F [x log(r) + (1-x) log(1-r)] with r clipped into
    [eps, 1 - max(eps, ulp)] (reference utils.py:55 adds eps inside the log
    instead — numerically equal away from saturation, and safe at it)."""
    r = jnp.clip(r, eps, 1.0 - max(eps, _SAT))
    return -jnp.mean(jnp.sum(x * jnp.log(r) + (1 - x) * jnp.log(1 - r), axis=-1))


def binary_cross_entropy_v2(r, eps: float = 1e-8):
    """Cross-entropy against a uniform 0.5 target (utils.py:59)."""
    r = jnp.clip(r, eps, 1.0 - max(eps, _SAT))
    return -jnp.mean(jnp.sum(0.5 * jnp.log(r) + 0.5 * jnp.log(1 - r), axis=-1))


def binary_cross_entropy_v3(r, eps: float = 1e-8):
    """Negative entropy of the prediction itself (utils.py:62)."""
    rc = jnp.clip(r, eps, 1.0 - max(eps, _SAT))
    return -jnp.mean(jnp.sum(r * jnp.log(rc) + (1 - r) * jnp.log(1 - rc), axis=-1))


def binary_cross_entropy_2classes(r1, r2, x, eps: float = 1e-8):
    """Two-head variant: r1 is p(y=1), r2 is p(y=0) (utils.py:65)."""
    r1 = jnp.clip(r1, eps, 1.0)
    r2 = jnp.clip(r2, eps, 1.0)
    return -jnp.mean(jnp.sum(x * jnp.log(r1) + (1 - x) * jnp.log(r2), axis=-1))


# ---------------------------------------------------------------------------
# Itakura-Saito ELBO (utils.py:68-105)
# ---------------------------------------------------------------------------


def itakura_saito_divergence(r, x, eps: float = 1e-8):
    """Per-sample IS divergence summed over frequency (utils.py:68-71)."""
    return jnp.sum(x / r - jnp.log(x + eps) + jnp.log(r) - 1.0, axis=-1)


# reference spelling kept as an alias (utils.py:68 "ikatura")
ikatura_saito_divergence = itakura_saito_divergence


def kl_gaussian_standard(mu, log_var):
    """Per-sample KL(q(z|x) || N(0,I)) summed over latent dims."""
    return -0.5 * jnp.sum(log_var - mu**2 - jnp.exp(log_var), axis=-1)


def elbo(x, r, mu, log_var, eps: float = 1e-8):
    """(total, recon, KL), each batch-mean of per-frame sums (utils.py:73-76).

    This is the training loss of every VAE family; note it is a *negative*
    ELBO (minimized).
    """
    recon = jnp.mean(itakura_saito_divergence(r, x, eps))
    kl = jnp.mean(kl_gaussian_standard(mu, log_var))
    return recon + kl, recon, kl


def L_loss(x, r, mu, log_var, eps: float = 1e-8):
    """Per-frame labelled loss (no batch mean) -> (L, recon, KL) (utils.py:78-81)."""
    recon = itakura_saito_divergence(r, x, eps)
    kl = kl_gaussian_standard(mu, log_var)
    return recon + kl, recon, kl


def U_loss(x, r, mu, log_var, y_hat_soft, eps: float = 1e-8):
    """Unlabelled semi-supervised objective (utils.py:83-105).

    Marginalizes the per-frame ELBO over the soft label posterior and adds
    its entropy; returns (U, L, recon, KL) batch means.
    """
    recon = itakura_saito_divergence(r, x, eps)
    kl = kl_gaussian_standard(mu, log_var)
    L = (recon + kl)[..., None]
    L_soft = jnp.sum(y_hat_soft * L + (1 - y_hat_soft) * L, axis=-1)
    # clip inside the logs only (same saturation hazard as the BCEs above:
    # XLA reassociates 1 - y + eps into (1 + eps) - y == 1 - y in float32,
    # so a saturated y_hat makes 0 * log(0) = nan under jit)
    yc = jnp.clip(y_hat_soft, eps, 1.0 - max(eps, _SAT))
    H = -jnp.sum(
        y_hat_soft * jnp.log(yc) + (1 - y_hat_soft) * jnp.log(1 - yc),
        axis=-1,
    )
    U = jnp.mean(L_soft + H)
    return U, jnp.mean(L), jnp.mean(recon), jnp.mean(kl)


# ---------------------------------------------------------------------------
# Mask / signal regression losses (utils.py:107-118)
# ---------------------------------------------------------------------------


def mean_square_error_signal(x, y, y_hat):
    return jnp.mean(jnp.sum(jnp.square((y - y_hat) * x), axis=-1))


def mean_square_error_mask(y, y_hat):
    return jnp.mean(jnp.sum(jnp.square(y - y_hat), axis=-1))


def magnitude_spectrum_approximation_loss(x, s, y_hat):
    d = s - y_hat * x
    return jnp.mean(jnp.sum(jnp.real(d * jnp.conj(d)), axis=-1))


# ---------------------------------------------------------------------------
# Classification statistics (utils.py:120-159)
# ---------------------------------------------------------------------------


def f1_loss(y_hat_hard, y, eps: float = 1e-8, mask=None):
    """(accuracy, precision, recall, F1) of hard binary predictions.

    ``mask`` (same shape, optional) excludes positions from ALL four
    counts — needed for padded sequence batches, where an unmasked
    computation would score every padded position as a true negative and
    inflate accuracy (the reference instead slices each utterance to its
    true length before counting, train_audio_net.py:246-252).
    """
    y_pred = y_hat_hard.reshape(-1)
    y_true = y.reshape(-1)
    m = jnp.ones_like(y_true) if mask is None else mask.reshape(-1)
    tp = jnp.sum(m * y_true * y_pred)
    tn = jnp.sum(m * (1 - y_true) * (1 - y_pred))
    fp = jnp.sum(m * (1 - y_true) * y_pred)
    fn = jnp.sum(m * y_true * (1 - y_pred))
    accuracy = (tp + tn) / (tp + tn + fp + fn + eps)
    precision = tp / (tp + fp + eps)
    recall = tp / (tp + fn + eps)
    f1 = 2 * precision * recall / (precision + recall + eps)
    return accuracy, precision, recall, f1


# ---------------------------------------------------------------------------
# Log-densities & label utilities (distributions.py, utils.py:5-53)
# ---------------------------------------------------------------------------

_LOG_2PI = math.log(2.0 * math.pi)


def log_standard_gaussian(x):
    """sum_F log N(x | 0, I) (distributions.py:13-20)."""
    return jnp.sum(-0.5 * _LOG_2PI - x**2 / 2.0, axis=-1)


def log_gaussian(x, mu, log_var):
    """sum_F log N(x | mu, exp(log_var)) (distributions.py:23-34)."""
    log_pdf = -0.5 * _LOG_2PI - log_var / 2.0 - (x - mu) ** 2 / (2.0 * jnp.exp(log_var))
    return jnp.sum(log_pdf, axis=-1)


def prior_categorical(batch_size: int, y_dim: int):
    """Uniform categorical prior (distributions.py:5-10)."""
    return jnp.full((batch_size, y_dim), 1.0 / y_dim)


def log_standard_categorical(p, eps: float = 1e-8):
    """Binary cross-entropy of p against a fixed 0.5 prior (distributions.py:37-53)."""
    prior = 0.5
    return -jnp.sum(
        p * jnp.log(prior + eps) + (1 - p) * jnp.log(1 - prior + eps), axis=-1
    )


def log_sum_exp(x, axis: int = -1):
    """Numerically stable LSE with the reference's +1e-8 guard (utils.py:44-53)."""
    m = jnp.max(x, axis=axis, keepdims=True)
    return jnp.log(jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True) + 1e-8) + m


def onehot(label: int, k: int):
    """1-of-k encoding (utils.py:30-42)."""
    return (jnp.arange(k) == label).astype(jnp.float32)


def enumerate_discrete(batch_size: int, y_dim: int):
    """All one-hot labels tiled over a batch -> (y_dim*batch, y_dim) (utils.py:5-28)."""
    eye = jnp.eye(y_dim, dtype=jnp.float32)
    return jnp.repeat(eye, batch_size, axis=0)
