"""M2 conditional-VAE family.

Capability parity with /root/reference/packages/models/models.py:

* :class:`CVAE`      — encoder([x;y]), decoder([z;y])            (models.py:185-218)
* :class:`CVAE_v2`   — encoder(x),     decoder([z;y])            (models.py:220-242)
* :class:`CVAE_v3`   — v2 + x->y classifier                      (models.py:245-297)
* :class:`CVAE_v4`   — v3 + z->y auxiliary classifier            (models.py:299-353)
* :class:`EncoderClassifier` — encoder + classifier only          (models.py:355-388)

All expose ``encode`` / ``decode`` / ``classify`` methods so inference
engines can call submodules functionally via ``model.apply(params, ...,
method="decode")``.
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from dvae_tpu.models.blocks import Classifier, Decoder, Encoder


def _cat(*xs):
    return jnp.concatenate(xs, axis=-1)


class CVAE(nn.Module):
    """M2: both encoder and decoder conditioned on the label y."""

    x_dim: int = 513
    y_dim: int = 1
    z_dim: int = 16
    h_dim: Sequence[int] = (128, 128)

    def setup(self):
        self.encoder = Encoder(tuple(self.h_dim), self.z_dim)
        self.decoder = Decoder(tuple(reversed(self.h_dim)), self.x_dim)

    def __call__(self, x, y, sample: bool = True):
        z, mu, log_var = self.encoder(_cat(x, y), sample=sample)
        r = self.decoder(_cat(z, y))
        return r, mu, log_var

    def encode(self, xy, sample: bool = True):
        return self.encoder(xy, sample=sample)

    def decode(self, zy):
        return self.decoder(zy)


class CVAE_v2(nn.Module):
    """Label-free encoder, label-conditioned decoder."""

    x_dim: int = 513
    y_dim: int = 1
    z_dim: int = 16
    h_dim: Sequence[int] = (128, 128)

    def setup(self):
        self.encoder = Encoder(tuple(self.h_dim), self.z_dim)
        self.decoder = Decoder(tuple(reversed(self.h_dim)), self.x_dim)

    def __call__(self, x, y, sample: bool = True):
        z, mu, log_var = self.encoder(x, sample=sample)
        r = self.decoder(_cat(z, y))
        return r, mu, log_var

    def encode(self, x, sample: bool = True):
        return self.encoder(x, sample=sample)

    def decode(self, zy):
        return self.decoder(zy)


class CVAE_v3(nn.Module):
    """v2 + an x->y classifier (used for y-hat-soft conditioning / analysis)."""

    x_dim: int = 513
    y_dim: int = 1
    z_dim: int = 16
    h_dim: Sequence[int] = (128, 128)

    def setup(self):
        self.encoder = Encoder(tuple(self.h_dim), self.z_dim)
        self.decoder = Decoder(tuple(reversed(self.h_dim)), self.x_dim)
        self.classifier = Classifier(tuple(self.h_dim), self.y_dim)

    def __call__(self, x, y, sample: bool = True):
        z, mu, log_var = self.encoder(x, sample=sample)
        r = self.decoder(_cat(z, y))
        return r, mu, log_var

    def encode(self, x, sample: bool = True):
        return self.encoder(x, sample=sample)

    def decode(self, zy):
        return self.decoder(zy)

    def classify(self, x):
        return self.classifier(x)

    def init_all(self, x, y, sample: bool = True):
        """Traces every submodule so init() creates the full parameter tree."""
        out = self(x, y, sample=sample)
        _ = self.classifier(x)
        return out


class CVAE_v4(nn.Module):
    """v3 + a z->y auxiliary classifier; forward also returns the sampled z."""

    x_dim: int = 513
    y_dim: int = 1
    z_dim: int = 16
    h_dim: Sequence[int] = (128, 128)

    def setup(self):
        self.encoder = Encoder(tuple(self.h_dim), self.z_dim)
        self.decoder = Decoder(tuple(reversed(self.h_dim)), self.x_dim)
        self.classifier = Classifier(tuple(self.h_dim), self.y_dim)
        self.auxiliary = Classifier(tuple(self.h_dim), self.y_dim)

    def __call__(self, x, y, sample: bool = True):
        z, mu, log_var = self.encoder(x, sample=sample)
        r = self.decoder(_cat(z, y))
        return r, z, mu, log_var

    def encode(self, x, sample: bool = True):
        return self.encoder(x, sample=sample)

    def decode(self, zy):
        return self.decoder(zy)

    def classify_from_x(self, x):
        return self.classifier(x)

    def classify_from_z(self, z):
        return self.auxiliary(z)

    def init_all(self, x, y, sample: bool = True):
        """Traces every submodule so init() creates the full parameter tree."""
        r, z, mu, log_var = self(x, y, sample=sample)
        _ = self.classifier(x)
        _ = self.auxiliary(z)
        return r, z, mu, log_var


class EncoderClassifier(nn.Module):
    """Encoder + x->y classifier, no decoder."""

    x_dim: int = 513
    y_dim: int = 1
    z_dim: int = 16
    h_dim: Sequence[int] = (128, 128)

    def setup(self):
        self.encoder = Encoder(tuple(self.h_dim), self.z_dim)
        self.classifier = Classifier(tuple(self.h_dim), self.y_dim)

    def __call__(self, x, sample: bool = True):
        return self.encoder(x, sample=sample)

    def classify(self, x):
        return self.classifier(x)

    def init_all(self, x, sample: bool = True):
        """Traces every submodule so init() creates the full parameter tree."""
        out = self(x, sample=sample)
        _ = self.classifier(x)
        return out
