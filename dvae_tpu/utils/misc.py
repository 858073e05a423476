"""Small helpers (parity with /root/reference/packages/utils.py)."""

from __future__ import annotations

import numpy as np


def count_parameters(params) -> int:
    """Total trainable parameter count of a Flax param tree (utils.py:1-3)."""
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def get_key(d: dict, val):
    """First key whose value equals ``val``; None on a miss (utils.py:5-7
    falls through its loop, which returns None — a truthy sentinel string
    here would break ``if get_key(...)``-style callers)."""
    for key, value in d.items():
        if value == val:
            return key
    return None


def on_tpu() -> bool:
    """True when the default JAX device is a TPU (incl. the axon tunnel
    plugin). One shared definition — a platform rename must not diverge
    between the Pallas call sites (ops/pallas_stft.py, enhance/mcem.py)."""
    import jax

    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
