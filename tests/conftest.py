"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real TPU hardware gives us one chip; multi-chip sharding correctness is
validated on virtual CPU devices exactly as the driver's dryrun does.

Note: the environment's sitecustomize imports jax at interpreter start and
registers the axon TPU backend, so env vars are too late here — the override
must go through jax.config.
"""

import os

import jax

if os.environ.get("NK_ONCHIP"):
    # keep the real TPU backend attached — used to run tests/test_onchip.py
    # (the recorded Pallas-vs-XLA equivalence evidence):
    #   NK_ONCHIP=1 python -m pytest tests/test_onchip.py -v
    from nanokappa_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_material():
    from nanokappa_tpu.material import synthetic_material

    return synthetic_material(mesh=(6, 6, 6))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
