"""Guidance: reference loss/util functions → dvae_tpu.models.losses.

Every formula exists natively with the reference's numerics (torch-oracle
round-trips in tests/test_torch_bridge.py), including the ``U_loss``
y·L+(1−y)·L quirk — but as jnp functions, so passing torch tensors through
a silent wrapper would detach autograd. Import the native names instead."""

from packages.models import _guide

_L = "dvae_tpu.models.losses"
_MAP = {
    "enumerate_discrete": f"{_L}.enumerate_discrete (batch_size, y_dim)",
    "onehot": f"{_L}.onehot(label, k)",
    "log_sum_exp": f"{_L}.log_sum_exp",
    "binary_cross_entropy": f"{_L}.binary_cross_entropy",
    "binary_cross_entropy_v2": f"{_L}.binary_cross_entropy_v2",
    "binary_cross_entropy_v3": f"{_L}.binary_cross_entropy_v3",
    "binary_cross_entropy_2classes": f"{_L}.binary_cross_entropy_2classes",
    # the reference's spelling → the corrected native name
    "ikatura_saito_divergence": f"{_L}.itakura_saito_divergence",
    "elbo": f"{_L}.elbo",
    "L_loss": f"{_L}.L_loss",
    "U_loss": f"{_L}.U_loss",
    "mean_square_error_signal": f"{_L}.mean_square_error_signal",
    "mean_square_error_mask": f"{_L}.mean_square_error_mask",
    "magnitude_spectrum_approxiamation_loss":
        f"{_L}.magnitude_spectrum_approximation_loss",
    "f1_loss": f"{_L}.f1_loss",
}

__getattr__ = _guide("utils", "utils.py:5-140", _MAP)
