"""Test harness: simulated 8-device CPU mesh (SURVEY.md §4).

The reference tested distributed correctness with ``mpirun -np {1,2,4,8}`` local
processes; the TPU-native equivalent is a forced 8-device CPU backend so
slab/pencil/line collectives are exercised without a pod.  x64 is enabled so
"double" precision resolves to native float64 on this backend, giving exact
numpy oracles.
"""

import os

# NOTE: the runtime's sitecustomize imports jax before conftest runs, so env
# vars alone are too late — use jax.config updates (backend init is lazy, so
# they still apply as long as no computation has run yet).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 simulated CPU devices, got {len(devs)}"
    return devs


@pytest.fixture
def rng():
    return np.random.default_rng(42)
