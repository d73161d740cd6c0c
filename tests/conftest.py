"""Test harness config.

Forces JAX onto a virtual 8-device CPU platform BEFORE jax initializes, so the
data-parallel sharding paths (mesh, all-gather InfoNCE, sharded index build)
are exercised without TPU hardware — the "multi-node without a cluster"
strategy from SURVEY §4.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def reference_root():
    path = "/root/reference"
    if not os.path.isdir(path):
        pytest.skip("reference repo not mounted")
    return path
