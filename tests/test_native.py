"""Native C++ host kernels vs NumPy reference implementations."""

import numpy as np
import pytest

from nanokappa_tpu import native
from nanokappa_tpu.constants import HBAR, KB
from nanokappa_tpu.material.tables import bose_einstein


@pytest.fixture(scope="module")
def lib_available():
    if native._load() is None:
        pytest.skip("native toolchain unavailable")


def test_crystal_energy_sums(lib_available, rng):
    omega = rng.uniform(0, 100, 5000)
    omega[:50] = 0.0
    active = rng.random(5000) > 0.1
    T = np.array([0.0, 10.0, 123.4, 300.0, 500.0])
    got = native.crystal_energy_sums(omega, active, T, HBAR, KB)
    n = bose_einstein(T[:, None], omega[None, :])
    want = (HBAR * omega[None, :] * n * active[None, :]).sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_build_alias_distribution(lib_available, rng):
    w = rng.random(1000) ** 3
    w[::7] = 0.0
    prob, alias = native.build_alias(w)
    # exactness: summing prob mass per outcome reproduces the distribution
    M = len(w)
    mass = prob.copy()
    np.add.at(mass, alias, 1.0 - prob)
    np.testing.assert_allclose(mass / M, w / w.sum(), atol=1e-12)


def test_count_crossings_matches_numpy(lib_available):
    from nanokappa_tpu.geometry.primitives import make_primitive

    mesh = make_primitive("star", (5e3, 600.0, 300.0, 6))
    rng = np.random.default_rng(0)
    pts = rng.uniform(mesh.bounds[0], mesh.bounds[1], (200, 3))
    d = np.array([0.5385125363, 0.3122954034, 0.7826247243])
    a = mesh.tri[:, 0]
    e1 = mesh.tri[:, 1] - mesh.tri[:, 0]
    e2 = mesh.tri[:, 2] - mesh.tri[:, 0]
    got = native.count_crossings(pts, d, a, e1, e2)
    want = mesh._count_crossings(pts, np.tile(d, (len(pts), 1)))
    np.testing.assert_array_equal(got, want)
