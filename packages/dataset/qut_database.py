"""Compat re-export of the QUT noise catalog (reference signatures)."""

from dvae_tpu.data.catalog.qut import (  # noqa: F401
    noise_list,
    noise_list_preprocessed,
    noise_segment,
    preprocess_noise,
)
