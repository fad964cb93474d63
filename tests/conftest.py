"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is tested the standard JAX way — a fake 8-device host
platform — so the full test suite runs anywhere (no TPU needed) and the
sharded code paths are identical to what runs on a real v5e-8.
Must run before jax initializes, hence the env mutation at import time.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Keep fp32 matmuls truly fp32 on CPU for parity tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

# The session environment pins JAX_PLATFORMS to the TPU plugin and jax may
# already be imported by a pytest plugin — override through the live config
# too (safe while the backend is uninitialized).
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the expensive jits in this suite (the full
# CycleGAN train step over the virtual 8-device mesh, the Inception FID
# graph) dominate wall time; caching them makes repeat runs fast.
from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
