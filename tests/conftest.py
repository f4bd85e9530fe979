"""Test configuration: force a virtual 8-device CPU mesh.

Must run before the first `import jax` anywhere in the test process, so all
sharding tests see 8 devices without TPU hardware.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax before conftest runs, so the env var
# alone is ignored; the config update is what actually forces CPU.
jax.config.update("jax_platforms", "cpu")

# Allow float64 in tests: parity oracles (reference math is float64 numpy)
# need it.  Production code paths are explicitly float32/bfloat16.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def basis():
    """The reference BPS basis (4096×3 float32)."""
    return np.load(os.path.join(REFERENCE, "models", "basis_point_set.npy"))


@pytest.fixture(scope="session")
def real_objects_dir():
    return os.path.join(REFERENCE, "data", "real_objects")


@pytest.fixture(scope="session")
def eval_batch_path():
    return os.path.join(REFERENCE, "data", "eval_batch.pth")
