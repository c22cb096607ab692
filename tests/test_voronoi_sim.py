"""Voronoi-partitioned simulation (BASELINE config 4 analog) + RBF interp.

Exercises: general (non-slice) subvolume binning via the argmin-distance
classifier, per-connection kappa, and the radial (cubic RBF) temperature
interpolation path."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from nanokappa_tpu.geometry.domain import build_domain
from nanokappa_tpu.geometry.device import build_device_geometry
from nanokappa_tpu.sim.state import SimParams, init_state, particle_count
from nanokappa_tpu.sim.boundary_tables import build_boundary_tables
from nanokappa_tpu.sim.reservoir import build_reservoir_tables
from nanokappa_tpu.sim.step import build_step
from nanokappa_tpu.sim.kappa import kappa_connections
from nanokappa_tpu.sim.binning import _rbf_interp


def test_rbf_interpolation_exact_at_centers():
    rng = np.random.default_rng(0)
    centers = jnp.asarray(rng.uniform(0, 100, (12, 3)), dtype=jnp.float32)
    vals = jnp.asarray(rng.uniform(290, 310, 12), dtype=jnp.float32)
    out = _rbf_interp(centers, vals, centers)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vals), atol=1e-2)
    # linear fields are reproduced exactly by the polynomial tail
    lin = centers[:, 0] * 0.01 + 300.0
    out = _rbf_interp(centers, lin, centers + 5.0)
    expected = (centers[:, 0] + 5.0) * 0.01 + 300.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-4)


def test_voronoi_film_run(small_material):
    mat = small_material
    dom = build_domain(
        geometry="box",
        dimensions=(3e3, 1e3, 1e3),
        subvolumes=("voronoi", 8),
        bound_pos=(
            "relative",
            -0.1, 0.5, 0.5, 1.1, 0.5, 0.5, 0.5, 0.5, -0.1, 0.5, 0.5, 1.1,
            0.5, -0.1, 0.5, 0.5, 1.1, 0.5,
        ),
        bound_cond=("T", "T", "R", "R", "R", "R"),
        bound_values=(304.0, 296.0, 0.0, 0.0, 0.0, 0.0),
        connect_pos=("relative",),
    )
    assert dom.subvol_type == "voronoi"
    n_p, rho = particle_count(("total", 1e4), mat, dom)
    params = SimParams(
        dt=1.0, n_cap=int(n_p * 1.8), inj_cap=4096,
        particle_density=rho, n_active_modes=mat.n_active_modes,
        t_reference=300.0, temp_interp="radial",
    )
    geo = build_device_geometry(dom)
    btab = build_boundary_tables(mat, dom)
    rtab = build_reservoir_tables(mat, dom, params.dt, rho)
    state = init_state(mat, dom, geo, params, n_p, temp_dist="linear", seed=2)
    run = build_step(geo, mat.device_tables(), btab, rtab, params, n_inner=10)
    for _ in range(30):
        state, out = run(state)
    T = np.asarray(out.T_sv)
    assert np.all(T > 296.0) and np.all(T < 304.0)
    # hot side hotter than cold side
    cx = np.asarray(dom.subvol_center[:, 0])
    assert T[np.argmin(cx)] > T[np.argmax(cx)]
    # per-connection kappa computes finite values with the right sign overall
    k_con = kappa_connections(
        T, np.asarray(out.phi_sv), dom.subvol_center, dom.subvol_connections
    )
    assert np.isfinite(k_con).all()
    assert np.median(k_con[np.abs(k_con) > 0]) > 0
    assert int(out.lost) < 0.01 * n_p

    # spectral kappa per connection (reference flux_contribution,
    # Visualisation.py:593-666) on a non-slice domain: the frequency bands of
    # each connection must sum to that connection's particle-estimated total
    from types import SimpleNamespace

    from nanokappa_tpu.constants import A_IN_M, EVPSA2_IN_WM2, HBAR
    from nanokappa_tpu.material.tables import bose_einstein
    from nanokappa_tpu.visual import spectral_kappa

    sim = SimpleNamespace(
        state=state,
        material=mat,
        domain=dom,
        occupation_of=lambda s: np.asarray(s.dev, dtype=float)
        + bose_einstein(
            params.t_reference, mat.omega.reshape(-1)[np.asarray(s.mode)]
        ),
    )
    centers, k_band, cons = spectral_kappa(sim, n_bands=40)
    assert k_band.shape == (len(dom.subvol_connections), 40)
    # recompute each connection total directly from particle data
    alive = np.asarray(state.alive)
    modes = np.asarray(state.mode)[alive]
    omega = mat.omega.reshape(-1)[modes]
    vel = mat.group_vel.reshape(-1, 3)[modes]
    sv = np.asarray(state.sv_id)[alive]
    dn = sim.occupation_of(state)[alive] - bose_einstein(T[sv], omega)
    dens = 1.0 / (mat.n_qpoints * mat.volume_unitcell)
    phi_p = (HBAR * omega * dn)[:, None] * vel * dens * EVPSA2_IN_WM2
    checked = 0
    for c, (i, j) in enumerate(cons):
        sel = (sv == i) | (sv == j)
        dT = T[j] - T[i]
        if not sel.any() or dT == 0:
            continue
        dX = (dom.subvol_center[j] - dom.subvol_center[i]) * A_IN_M
        total = -(phi_p[sel] @ dX).sum() / dT * mat.n_active_modes / sel.sum()
        np.testing.assert_allclose(np.nansum(k_band[c]), total, rtol=1e-5)
        checked += 1
    assert checked > 0
