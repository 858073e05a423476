"""Building blocks shared by every model family.

Architectural contract (matches /root/reference/packages/models/models.py):

* hidden MLPs use tanh for encoder/decoder (models.py:104,121), relu for
  classifiers (models.py:60);
* ``GaussianSample`` has two Linear heads (mu, log-variance) and
  reparametrizes ``z = mu + exp(0.5*logvar) * eps`` (models.py:24-38, :9-22);
* the decoder ends with ``exp`` so its output is a (Itakura-Saito) variance
  spectrogram (models.py:122);
* all Linear layers are Xavier-normal initialized with zero bias
  (models.py:137-141).

TPU notes: feature dims (513/128/16) are small; batches of frames are the
matmul rows, so everything maps to MXU-friendly (B, F) x (F, H) matmuls.
Parameters are kept fp32; callers may cast activations to bf16 for large
batched inference (the MCEM engine does its own precision management).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

xavier_normal = nn.initializers.glorot_normal()


def dense(features: int, name: str | None = None) -> nn.Dense:
    return nn.Dense(features, kernel_init=xavier_normal, bias_init=nn.initializers.zeros, name=name)


class MLP(nn.Module):
    """Stack of Dense layers with an activation after every layer."""

    hidden: Sequence[int]
    activation: Callable = jnp.tanh

    @nn.compact
    def __call__(self, x):
        for i, h in enumerate(self.hidden):
            x = self.activation(dense(h, name=f"layers_{i}")(x))
        return x


class GaussianSample(nn.Module):
    """mu / log-variance heads + reparametrized sample."""

    out_features: int

    @nn.compact
    def __call__(self, h, sample: bool = True):
        mu = dense(self.out_features, name="mu")(h)
        log_var = dense(self.out_features, name="log_var")(h)
        if sample:
            eps = jax.random.normal(self.make_rng("sample"), mu.shape, mu.dtype)
            z = mu + jnp.exp(0.5 * log_var) * eps
        else:
            z = mu
        return z, mu, log_var


class Encoder(nn.Module):
    """tanh MLP -> GaussianSample. Returns (z, mu, logvar)."""

    hidden: Sequence[int]
    z_dim: int

    @nn.compact
    def __call__(self, x, sample: bool = True):
        h = MLP(self.hidden, jnp.tanh, name="hidden")(x)
        return GaussianSample(self.z_dim, name="sample")(h, sample=sample)


class Decoder(nn.Module):
    """tanh MLP -> Dense -> exp. Output is a variance spectrogram."""

    hidden: Sequence[int]
    x_dim: int

    @nn.compact
    def __call__(self, z):
        h = MLP(self.hidden, jnp.tanh, name="hidden")(z)
        return jnp.exp(dense(self.x_dim, name="reconstruction")(h))


class Classifier(nn.Module):
    """relu MLP -> Dense -> sigmoid (per-label Bernoulli probabilities).

    ``batch_norm=True`` replicates the reference's interleaved
    ``[Linear, BatchNorm1d]`` ModuleList whose forward relu's EVERY entry
    (models.py:46-61): each block is ``relu(BN(relu(Wx)))`` — two relus,
    BN on the post-activation. No shipped trainer enables it (like the
    reference's scripts); training with it requires the caller to thread
    flax's ``mutable=['batch_stats']``, while inference (train=False) uses
    the running statistics and needs no mutation."""

    hidden: Sequence[int]
    y_dim: int
    batch_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, h in enumerate(self.hidden):
            x = nn.relu(dense(h, name=f"hidden_{i}")(x))
            if self.batch_norm:
                x = nn.relu(nn.BatchNorm(
                    use_running_average=not train, name=f"bn_{i}")(x))
        return nn.sigmoid(dense(self.y_dim, name="output_layer")(x))


class Classifier2Classes(nn.Module):
    """relu MLP -> Dense(2*y_dim) -> softmax over the 2-class axis

    (reference models.py:65-89). Returns shape (..., 2, y_dim)."""

    hidden: Sequence[int]
    y_dim: int

    @nn.compact
    def __call__(self, x):
        for i, h in enumerate(self.hidden):
            x = nn.relu(dense(h, name=f"hidden_{i}")(x))
        logits = dense(2 * self.y_dim, name="output_layer")(x)
        logits = logits.reshape(*logits.shape[:-1], 2, self.y_dim)
        return nn.softmax(logits, axis=-2)
