"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; all sharding/collective tests
run against `--xla_force_host_platform_device_count=8` fake CPU devices,
which exercises the same SPMD partitioner XLA uses on a real slice.
"""

import os

# Must be set before jax is imported anywhere. Override unconditionally:
# the ambient environment may pin a TPU platform, but unit tests must run
# on the virtual CPU mesh (and with exact f32 convolutions).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# f32 matmuls on CPU are exact; keep x64 off to match TPU numerics.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The container's sitecustomize registers the TPU backend at interpreter
# start, overriding JAX_PLATFORMS from the env; the config update still wins
# as long as no computation has run yet.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference repo not mounted")
    return REFERENCE_DIR


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
