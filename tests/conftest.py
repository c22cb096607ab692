"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real TPU hardware gives us one chip; multi-chip sharding correctness is
validated on virtual CPU devices exactly as the driver's dryrun does.
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
def small_material():
    from nanokappa_tpu.material import synthetic_material

    return synthetic_material(mesh=(6, 6, 6))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
