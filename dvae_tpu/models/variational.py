"""Semi-supervised variational inference objectives (SVI).

The reference ships this capability as dead code — packages/models/
variational.py is unimportable due to stale ``python.models`` imports
(variational.py:7-8) and no script uses it. This module supplies WORKING
equivalents of the capabilities it represents:

* :class:`DeterministicWarmup` — linear KL warm-up schedule
  (variational.py:32-48);
* :class:`ImportanceWeightedSampler` — IWAE-style multi-sample importance
  weighting (variational.py:10-30);
* :func:`svi_loss` — the label-enumeration semi-supervised ELBO of Kingma's
  M2 (variational.py:51-121): labelled data uses -L(x,y) + alpha*CE; the
  unlabelled term enumerates all labels, weighting L(x,y) by q(y|x) plus its
  entropy (superseded in the reference's experiments by the per-frame
  L_loss/U_loss of models/utils.py:78-105, which we also implement in
  ``dvae_tpu.models.losses``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dvae_tpu.models import losses


class DeterministicWarmup:
    """Linear ramp from ``t_init`` to ``t_max`` over ``n`` steps; iterate to
    get the next beta."""

    def __init__(self, n: int = 100, t_max: float = 1.0, t_init: float = 0.0):
        self.t = t_init
        self.t_max = t_max
        self.inc = (t_max - t_init) / n

    def __iter__(self):
        return self

    def __next__(self):
        # clamp toward t_max from whichever side the ramp approaches it —
        # min() alone would collapse a DECREASING ramp (t_init > t_max) to
        # the terminal value on the first step
        clamp = min if self.inc >= 0 else max
        self.t = clamp(self.t + self.inc, self.t_max)
        return self.t


class ImportanceWeightedSampler:
    """mc x iw replication/aggregation for importance-weighted bounds."""

    def __init__(self, mc: int = 1, iw: int = 1):
        self.mc = mc
        self.iw = iw

    def resample(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.tile(x, (self.mc * self.iw,) + (1,) * (x.ndim - 1))

    def __call__(self, elbo: jnp.ndarray) -> jnp.ndarray:
        """elbo: (mc*iw*B,) log-weights -> (B,) importance-weighted bound."""
        elbo = elbo.reshape(self.mc, self.iw, -1)
        elbo = losses.log_sum_exp(elbo.swapaxes(1, 2), axis=-1) - jnp.log(float(self.iw))
        return jnp.mean(elbo, axis=0).reshape(-1)


def labelled_loss(x, r, mu, log_var, y, eps: float = 1e-8, beta: float = 1.0):
    """-log p(x|y,z) + beta*KL + log p(y) per sample (the L(x,y) bound).

    ``beta`` is the KL weight — with DeterministicWarmup this is the
    standard Soenderby-style linear KL warm-up (it must scale ONLY the KL
    term: scaling the whole bound would zero the reconstruction signal at
    warm-up start while the entropy term kept full weight)."""
    recon = losses.itakura_saito_divergence(r, x, eps)
    kl = losses.kl_gaussian_standard(mu, log_var)
    prior_y = losses.log_standard_categorical(y, eps)
    return recon + beta * kl + prior_y


def svi_loss(model, params, x, y, key, alpha: float = 0.1, beta: float = 1.0,
             eps: float = 1e-8):
    """Semi-supervised objective over a batch with labels ``y`` (None rows ->
    unlabelled handled by passing y=None for the whole batch).

    For binary per-frame labels (y_dim=1) the enumeration is {0, 1}.
    Returns (loss, metrics).
    """
    if y is not None:
        r, mu, log_var = model.apply(params, x, y, rngs={"sample": key})
        L = labelled_loss(x, r, mu, log_var, y, eps, beta)
        y_hat = model.apply(params, x, method="classify")
        ce = losses.binary_cross_entropy(y_hat, y, eps)
        loss = jnp.mean(L) + alpha * ce
        return loss, {"L": jnp.mean(L), "classification": ce}

    # unlabelled: enumerate binary labels, weight by q(y|x)
    y_hat = model.apply(params, x, method="classify")  # (B, 1) = q(y=1|x)
    keys = jax.random.split(key, 2)
    Ls = []
    for label, k in zip((0.0, 1.0), keys):
        y_l = jnp.full((x.shape[0], 1), label)
        r, mu, log_var = model.apply(params, x, y_l, rngs={"sample": k})
        Ls.append(labelled_loss(x, r, mu, log_var, y_l, eps, beta))
    L0, L1 = Ls
    q1 = y_hat[:, 0]
    expected = (1 - q1) * L0 + q1 * L1
    # clip inside the logs only (the saturation hazard documented at
    # losses.py:_SAT: under jit XLA reassociates 1 - q + eps into
    # (1 + eps) - q == 1 - q in float32, so a saturated classifier makes
    # 0 * log(0) = nan; see test_bce_finite_at_saturation_under_jit)
    qc = jnp.clip(q1, eps, 1.0 - max(eps, losses._SAT))
    H = -(q1 * jnp.log(qc) + (1 - q1) * jnp.log(1 - qc))
    U = jnp.mean(expected - H)
    return U, {"U": U, "entropy": jnp.mean(H)}
