"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compilation cache shared by the in-process tests AND the CLI
# subprocesses the chain tests spawn (env inherited): the same training/
# enhancement programs stop recompiling in every subprocess
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "dvae_tpu", "test-jit"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-registers the TPU plugin and overrides
# JAX_PLATFORMS; pin the config explicitly so tests run on the virtual
# 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pathlib

import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/data/subset")


@pytest.fixture(scope="session")
def subset_dir() -> pathlib.Path:
    if not REFERENCE_DATA.exists():
        pytest.skip("reference subset data not available")
    return REFERENCE_DATA
