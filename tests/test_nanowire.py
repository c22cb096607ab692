"""Nanowire with rough sidewalls: the specularity physics gate.

BASELINE.json config 3 / SURVEY.md section 7 validation gate 3: kappa as a
function of sidewall roughness eta must decrease monotonically (more diffuse
scattering = more boundary resistance), and eta=0 (fully specular walls)
recovers the film-like value."""

import dataclasses

import numpy as np
import pytest

from nanokappa_tpu.geometry.domain import build_domain
from nanokappa_tpu.geometry.device import build_device_geometry
from nanokappa_tpu.sim.state import SimParams, init_state, particle_count
from nanokappa_tpu.sim.boundary_tables import build_boundary_tables
from nanokappa_tpu.sim.reservoir import build_reservoir_tables
from nanokappa_tpu.sim.step import build_step
from nanokappa_tpu.sim.kappa import kappa_slice


def wire_kappa(mat, eta: float, n_steps=400, n_particles=8000, scat_model="velocity"):
    dom = build_domain(
        geometry="cylinder",
        dimensions=(4e3, 500.0, 12),
        subvolumes=("slice", 5, 2),
        bound_pos=(
            "relative",
            0.5, 0.5, -0.1,  # bottom cap
            0.5, 0.5, 1.1,  # top cap
            1.1, 0.5, 0.5,  # one side facet; the default R covers the rest
        ),
        bound_cond=("T", "T", "R", "R"),
        bound_values=(305.0, 295.0, eta, eta),
        connect_pos=("relative",),
    )
    n_p, rho = particle_count(("total", n_particles), mat, dom)
    params = SimParams(
        dt=1.0, n_cap=int(n_p * 1.8), inj_cap=8192,
        particle_density=rho, n_active_modes=mat.n_active_modes,
        t_reference=300.0, scat_model=scat_model,
    )
    geo = build_device_geometry(dom)
    btab = build_boundary_tables(mat, dom, scat_model)
    rtab = build_reservoir_tables(mat, dom, params.dt, rho)
    state = init_state(mat, dom, geo, params, n_p, temp_dist="linear", seed=5)
    run = build_step(geo, mat.device_tables(), btab, rtab, params, n_inner=10)
    ks = []
    for i in range(n_steps // 10):
        state, out = run(state)
        if i >= (n_steps // 10) * 3 // 5:
            _, kt = kappa_slice(
                np.asarray(out.T_sv), np.asarray(out.phi_sv),
                np.asarray(out.Np_sv), np.array([305.0, 295.0]), 4e3, 2,
            )
            ks.append(kt)
    return float(np.mean(ks)), out


def test_specularity_sweep(small_material):
    """kappa(eta) strictly decreasing; all runs healthy."""
    k0, out0 = wire_kappa(small_material, eta=0.0)
    k2, _ = wire_kappa(small_material, eta=2.0)
    k10, out10 = wire_kappa(small_material, eta=10.0)
    # rough walls suppress conduction monotonically
    assert k0 > k2 > k10 > 0, (k0, k2, k10)
    # fully diffuse wire is strongly suppressed vs specular
    assert k10 < 0.8 * k0
    assert int(out0.lost) < 50 and int(out10.lost) < 50


def test_wavevector_scattering_model(small_material):
    """The 'k' correspondence model (wavevector mirror + FBZ fold + nearest-q
    match with random degenerate-branch split, classes/Population.py:1058-1239)
    runs end to end and conducts like the default velocity model."""
    kv, _ = wire_kappa(small_material, eta=1.0, scat_model="k")
    kvel, out = wire_kappa(small_material, eta=1.0, scat_model="velocity")
    assert kv > 0 and np.isfinite(kv)
    # the two correspondence models agree on the physics within MC noise
    assert abs(kv - kvel) < 0.5 * kvel
    assert int(out.lost) < 50


def test_wire_specularity_table(small_material):
    """For a 12-sided wire the rough sidewall has 12 distinct normals; eta>0
    gives 0 < p < 1 for oblique modes (Ziman, classes/Population.py:852-877)."""
    dom = build_domain(
        geometry="cylinder",
        dimensions=(4e3, 500.0, 12),
        subvolumes=("slice", 5, 2),
        bound_pos=("relative", 0.5, 0.5, -0.1, 0.5, 0.5, 1.1),
        bound_cond=("T", "T", "R"),
        bound_values=(305.0, 295.0, 2.0),
        connect_pos=("relative",),
    )
    btab = build_boundary_tables(small_material, dom)
    assert btab.n_rough == 12
    assert btab.n_rows == 12
    spec = np.asarray(btab.specularity)
    has_corr = np.asarray(btab.corr) >= 0
    inter = spec[has_corr]
    assert np.any((inter > 0.01) & (inter < 0.99))
    # diffuse CDFs are valid distributions
    cdf = np.asarray(btab.diffuse_cdf)
    assert np.all(np.diff(cdf, axis=1) >= -1e-6)
    np.testing.assert_allclose(cdf[:, -1], 1.0, atol=1e-6)
