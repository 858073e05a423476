"""Reference-signature misc utils (compat shim over dvae_tpu.utils).

Matches /root/reference/packages/utils.py:1-7; ``count_parameters`` accepts
both a torch ``nn.Module`` (the reference's input) and a Flax param tree."""

from __future__ import annotations

from dvae_tpu.utils.misc import count_parameters as _count_tree
from dvae_tpu.utils.misc import get_key  # noqa: F401


def count_parameters(model):
    if hasattr(model, "parameters") and callable(model.parameters):
        return sum(p.numel() for p in model.parameters() if p.requires_grad)
    return _count_tree(model)
