"""Guidance shims for the reference's torch model stack.

``packages.models.*`` (reference models/{models,utils,distributions,
variational,mcem}.py) is torch-native: its classes carry autograd state and
its loss functions differentiate through torch tensors, so silently
converting arguments to jnp would break user training code. Each submodule
here therefore maps every reference name to its dvae-tpu-native equivalent
(value-parity tested against the torch originals — tests/test_torch_bridge.py)
and raises a pointed error on use, instead of failing with a bare
ImportError. Exceptions: the framework-free helpers (``DeterministicWarmup``,
``ImportanceWeightedSampler``) are re-exported for real.

Reference ``.pt`` checkpoints load through ``dvae_tpu.train.torch_import``.
See MIGRATING.md for the full mapping table.
"""


def _guide(module, ref_file, mapping):
    """Build a PEP-562 ``__getattr__`` raising per-name guidance."""

    def __getattr__(name):
        if name in mapping:
            raise NotImplementedError(
                f"packages.models.{module}.{name} (reference "
                f"packages/models/{ref_file}) is torch-native; the dvae-tpu "
                f"equivalent is {mapping[name]}. Reference .pt weights load "
                f"via dvae_tpu.train.torch_import. See MIGRATING.md.")
        raise AttributeError(
            f"module 'packages.models.{module}' has no attribute {name!r}")

    return __getattr__
