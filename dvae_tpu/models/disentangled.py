"""M2-info: the disentangled conditional VAE (the paper's core novelty).

Parity with ``DeepGenerativeModel_v5`` (/root/reference/packages/models/
models.py:390-444): a v3-style CVAE (encoder + label-conditioned decoder +
x->y classifier) grouped under ``enc_dec_clf``, plus a separate z->y
``auxiliary`` classifier trained adversarially — the encoder is pushed to
remove VAD information from z while the auxiliary tries to recover it.

The parameter tree deliberately nests the CVAE under ``enc_dec_clf`` so the
reference's two-optimizer split (training_M2_info_vad.py:141-143) and
substring-filtered partial checkpoint loads
(training_M2_info_vad_pretrain.py:103-113) have direct equivalents here
(optax.multi_transform over top-level keys; orbax partial restore).
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from dvae_tpu.models.blocks import Classifier
from dvae_tpu.models.cvae import CVAE_v3


class DisentangledVAE(nn.Module):
    x_dim: int = 513
    y_dim: int = 1
    z_dim: int = 16
    h_dim: Sequence[int] = (128, 128)

    def setup(self):
        self.enc_dec_clf = CVAE_v3(self.x_dim, self.y_dim, self.z_dim, tuple(self.h_dim))
        self.auxiliary = Classifier(tuple(self.h_dim), self.y_dim)

    def __call__(self, x, y, sample: bool = True):
        z, mu, log_var = self.enc_dec_clf.encoder(x, sample=sample)
        r = self.enc_dec_clf.decoder(jnp.concatenate([z, y], axis=-1))
        return r, z, mu, log_var

    def encode(self, x, sample: bool = True):
        return self.enc_dec_clf.encoder(x, sample=sample)

    def decode(self, zy):
        return self.enc_dec_clf.decoder(zy)

    def classify_from_x(self, x):
        return self.enc_dec_clf.classifier(x)

    def classify_from_z(self, z):
        return self.auxiliary(z)

    def init_all(self, x, y, sample: bool = True):
        """Traces every submodule so init() creates the full parameter tree."""
        r, z, mu, log_var = self(x, y, sample=sample)
        _ = self.enc_dec_clf.classifier(x)
        _ = self.auxiliary(z)
        return r, z, mu, log_var
