"""Guidance: reference log-densities → dvae_tpu.models.losses (jnp)."""

from packages.models import _guide

_L = "dvae_tpu.models.losses"
_MAP = {
    "prior_categorical": f"{_L}.prior_categorical(batch_size, y_dim) — no "
                         "device arg; jax arrays are placed by jit",
    "log_standard_gaussian": f"{_L}.log_standard_gaussian",
    "log_gaussian": f"{_L}.log_gaussian",
    "log_standard_categorical": f"{_L}.log_standard_categorical",
}

__getattr__ = _guide("distributions", "distributions.py:5-50", _MAP)
