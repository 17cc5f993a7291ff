"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the multichip
path; the real benchmark runs on the one real chip).

Env vars must be set before jax is first imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any preset platform (e.g. axon)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

# the axon sitecustomize forces the TPU platform regardless of env vars;
# override via config so the suite runs on the virtual 8-device CPU mesh
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/singlet_tpu_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(999)
