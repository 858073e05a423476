"""Guidance: reference model classes → dvae_tpu.models (see models/__init__)."""

from packages.models import _guide

_MAP = {
    "Stochastic": "dvae_tpu.models.blocks.GaussianSample (flax)",
    "GaussianSample": "dvae_tpu.models.blocks.GaussianSample",
    "Classifier": "dvae_tpu.models.blocks.Classifier",
    "Classifier2Classes": "dvae_tpu.models.blocks.Classifier2Classes",
    "Encoder": "dvae_tpu.models.blocks.Encoder",
    "Decoder": "dvae_tpu.models.blocks.Decoder",
    "VariationalAutoencoder": "dvae_tpu.models.VAE (alias VariationalAutoencoder)",
    "DeepGenerativeModel": "dvae_tpu.models.CVAE (alias DeepGenerativeModel)",
    "DeepGenerativeModel_v2": "dvae_tpu.models.CVAE_v2",
    "DeepGenerativeModel_v3": "dvae_tpu.models.CVAE_v3",
    "DeepGenerativeModel_v4": "dvae_tpu.models.CVAE_v4",
    "DeepGenerativeModel_v5": "dvae_tpu.models.DisentangledVAE",
    "Encoder_Classifier": "dvae_tpu.models.EncoderClassifier",
}

__getattr__ = _guide("models", "models.py:8-462", _MAP)
