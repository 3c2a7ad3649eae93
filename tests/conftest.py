"""Test configuration: force CPU platform with 8 virtual devices so sharding
tests run anywhere, and keep key generation cached across tests."""
import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel,
# but unit tests must run on the 8-device virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import functools

import pytest

import jax

# The ambient axon TPU plugin prepends itself to jax_platforms regardless of
# the env var; force pure-CPU explicitly so the 8-device virtual mesh exists.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA CPU compiles are extremely slow on this
# single-core box; the cache makes test re-runs fast.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import tfhe_tpu as tt


@functools.lru_cache(maxsize=None)
def _cached_keys(params, seed):
    return tt.keygen(params, seed=seed)


@pytest.fixture(scope="session")
def toy_keys():
    return _cached_keys(tt.PARAMS_TOY, (314, 1592, 657))


@pytest.fixture(scope="session")
def small_keys():
    return _cached_keys(tt.PARAMS_SMALL, (314, 1592, 657))
