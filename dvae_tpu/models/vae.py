"""M1: plain variational autoencoder over power-spectrogram frames.

Capability parity with ``VariationalAutoencoder`` in
/root/reference/packages/models/models.py:125-182 (forward returns the
reconstruction/variance, posterior mean and log-variance; ``sample`` decodes
an arbitrary latent — the ``decode`` method here).

Deliberately not carried: the reference's normalizing-flow hook
(``add_flow``/``_kld``, models.py:143-170) is dead code there — ``forward``
always computes the closed-form ``_kld_v2`` (:175), ``_kld`` is never
called, no flow class exists anywhere in its tree, and ``_kld``'s own body
is marked "#TODO: bug here" twice. The closed-form Gaussian KL (our
``losses.elbo``) is the only KL the reference ever trains with.
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn

from dvae_tpu.models.blocks import Decoder, Encoder


class VAE(nn.Module):
    x_dim: int = 513
    z_dim: int = 16
    h_dim: Sequence[int] = (128, 128)

    def setup(self):
        self.encoder = Encoder(tuple(self.h_dim), self.z_dim)
        self.decoder = Decoder(tuple(reversed(self.h_dim)), self.x_dim)

    def __call__(self, x, sample: bool = True):
        z, mu, log_var = self.encoder(x, sample=sample)
        r = self.decoder(z)
        return r, mu, log_var

    def encode(self, x, sample: bool = True):
        return self.encoder(x, sample=sample)

    def decode(self, z):
        return self.decoder(z)
