"""SVI compat: the framework-free helpers re-export for real; the torch
``SVI``/``SVI_M1`` modules map to the functional ``svi_loss``."""

from dvae_tpu.models.variational import (  # noqa: F401
    DeterministicWarmup,
    ImportanceWeightedSampler,
)
from packages.models import _guide

_MAP = {
    "SVI": "dvae_tpu.models.variational.svi_loss (functional; model+params "
           "explicit, sampler/beta as arguments)",
    "SVI_M1": "dvae_tpu.models.variational.svi_loss with y=None",
}

__getattr__ = _guide("variational", "variational.py:10-160", _MAP)
