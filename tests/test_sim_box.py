"""End-to-end physics tests on the Si-film-analog box configuration.

These mirror the reference's only quality gate — the parameters_test.txt box
run (SURVEY.md section 4) — plus physics invariants the reference checks by
eye: detailed balance at uniform temperature, energy conservation under pure
drift + specular/periodic transport, and film kappa against the bulk RTA
value.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nanokappa_tpu.material import synthetic_material
from nanokappa_tpu.geometry.domain import build_domain, BC
from nanokappa_tpu.geometry.device import build_device_geometry
from nanokappa_tpu.sim.state import SimParams, init_state, particle_count
from nanokappa_tpu.sim.boundary_tables import build_boundary_tables
from nanokappa_tpu.sim.reservoir import build_reservoir_tables
from nanokappa_tpu.sim.step import build_step
from nanokappa_tpu.sim.kappa import kappa_slice


def film_setup(mat, n_particles=2e4, T_hot=302.0, T_cold=298.0, temp_dist="linear"):
    dom = build_domain(
        geometry="box",
        dimensions=(5e3, 1e3, 1e3),
        subvolumes=("slice", 10, 0),
        bound_pos=(
            "relative",
            -0.1, 0.5, 0.5,
            1.1, 0.5, 0.5,
            0.5, 0.5, -0.1,
            0.5, 0.5, 1.1,
        ),
        bound_cond=("T", "T", "R", "R", "P"),
        bound_values=(T_hot, T_cold, 0.0, 0.0),
        connect_pos=("relative", 0.5, -0.1, 0.5, 0.5, 1.1, 0.5),
    )
    n_p, rho = particle_count(("total", n_particles), mat, dom)
    params = SimParams(
        dt=1.0,
        n_cap=int(n_p * 1.6),
        inj_cap=8192,
        particle_density=rho,
        n_active_modes=mat.n_active_modes,
        t_reference=(T_hot + T_cold) / 2,
    )
    geo = build_device_geometry(dom)
    btab = build_boundary_tables(mat, dom)
    rtab = build_reservoir_tables(mat, dom, params.dt, rho)
    state = init_state(mat, dom, geo, params, n_p, temp_dist=temp_dist)
    return dom, geo, btab, rtab, params, state


def test_domain_assembly(small_material):
    dom, geo, btab, rtab, params, state = film_setup(small_material)
    assert dom.mesh.n_facets == 6
    assert dom.mesh.volume == pytest.approx(5e9)
    # facet conditions: 2 reservoirs, 2 rough, 2 periodic
    assert (dom.bound_cond == BC.TEMPERATURE).sum() == 2
    assert (dom.bound_cond == BC.ROUGH).sum() == 2
    assert (dom.bound_cond == BC.PERIODIC).sum() == 2
    assert np.allclose(np.asarray(geo.subvol_volume).sum(), 5e9, rtol=1e-5)
    # periodic shift moves across the y width
    per = np.nonzero(dom.bound_cond == BC.PERIODIC)[0]
    shift = np.asarray(geo.periodic_shift[per[0]])
    assert abs(shift).max() == pytest.approx(1e3, rel=1e-6)


def test_specularity_eta0_full_specular(small_material):
    """eta=0 walls: every incoming mode with a mirror partner reflects
    specularly with p=1 (classes/Population.py:852-877 with eta=0)."""
    dom, geo, btab, *_ = film_setup(small_material)
    spec = np.asarray(btab.specularity)
    corr = np.asarray(btab.corr)
    assert spec.shape[0] == btab.n_rows
    assert np.all(spec[corr >= 0] == pytest.approx(1.0))
    # cubic crystal, axis-aligned wall: every incoming mode has a partner
    v = small_material.group_vel.reshape(-1, 3)
    n_in = (v[:, 2] > 0).sum()  # z=0 wall, outward normal -z: incoming vz<0;
    #                             by symmetry count vz>0 modes
    assert (corr[0] >= 0).sum() == n_in


def test_film_conducts_and_converges(small_material):
    mat = small_material
    dom, geo, btab, rtab, params, state = film_setup(mat, n_particles=2e4)
    run = build_step(geo, mat.device_tables(), btab, rtab, params, n_inner=10)
    for _ in range(60):  # 600 steps
        state, out = run(state)
    T = np.asarray(out.T_sv)
    phi = np.asarray(out.phi_sv)
    # profile strictly between reservoir temperatures, monotone decreasing
    assert np.all(T < 302.0) and np.all(T > 298.0)
    assert np.all(np.diff(T) < 0.05)
    # flux flows hot -> cold everywhere
    assert np.all(phi[:, 0] > 0)
    # population stable, no quarantined particles
    assert int(out.lost) == 0
    assert abs(int(out.N_p) - 2e4) / 2e4 < 0.25
    # reservoir ledgers stay finite: sentinel event-buffer lanes must never
    # poison the flux columns (regression for jnp.take mode='fill' NaN rows
    # reaching the one-hot ledger matmul, and for grazing-incidence 1/(v.n)
    # overflow at large mode tables)
    assert np.isfinite(np.asarray(out.res_heat_flux)).all()
    assert np.isfinite(np.asarray(out.res_energy_balance)).all()
    # kappa in the physically expected window: below bulk, above 1/4 bulk
    _, kt = kappa_slice(
        T, phi, np.asarray(out.Np_sv), np.array([302.0, 298.0]), 5e3, 0
    )
    bulk = mat.bulk_kappa_rta(300.0)[0]
    assert 0.25 * bulk < kt < bulk


def test_uniform_temperature_detailed_balance(small_material):
    """Both reservoirs at 300 K: no net flux, temperatures pinned at 300 K."""
    mat = small_material
    dom, geo, btab, rtab, params, state = film_setup(
        mat, n_particles=2e4, T_hot=300.0, T_cold=300.0, temp_dist="mean"
    )
    run = build_step(geo, mat.device_tables(), btab, rtab, params, n_inner=10)
    phis = []
    for i in range(40):
        state, out = run(state)
        if i >= 20:
            phis.append(np.asarray(out.phi_sv[:, 0]))
    T = np.asarray(out.T_sv)
    assert np.all(np.abs(T - 300.0) < 0.2)
    # time-averaged flux indistinguishable from zero compared to the
    # conducting case (~5e8 W/m^2)
    assert abs(np.mean(phis)) < 2e7


def test_energy_conservation_specular_box(small_material):
    """No reservoirs, eta=0 walls + periodic pair, scattering off:
    total deviation energy and particle count are exactly conserved."""
    mat = dataclasses.replace(small_material) if False else small_material
    # disable RTA by making lifetimes enormous
    import copy

    mat2 = copy.copy(mat)
    mat2.tau = np.where(mat.tau > 0, 1e12, 0.0)
    dom = build_domain(
        geometry="box",
        dimensions=(2e3, 1e3, 1e3),
        subvolumes=("slice", 5, 0),
        bound_pos=("relative", 0.5, 0.5, -0.1, 0.5, 0.5, 1.1),
        bound_cond=("R", "R", "R"),
        bound_values=(0.0, 0.0, 0.0),
        connect_pos=(
            "relative",
            -0.1, 0.5, 0.5,
            1.1, 0.5, 0.5,
            0.5, -0.1, 0.5,
            0.5, 1.1, 0.5,
        ),
    )
    n_p, rho = particle_count(("total", 5e3), mat2, dom)
    params = SimParams(
        dt=1.0, n_cap=n_p, inj_cap=64,
        particle_density=rho, n_active_modes=mat2.n_active_modes,
        t_reference=300.0,
    )
    geo = build_device_geometry(dom)
    btab = build_boundary_tables(mat2, dom)
    rtab = build_reservoir_tables(mat2, dom, params.dt, rho)
    state = init_state(mat2, dom, geo, params, n_p, temp_dist="custom",
                       subvol_temp=[299.0, 300.0, 301.0, 300.0, 299.0])
    run = build_step(geo, mat2.device_tables(), btab, rtab, params, n_inner=10)

    omega = mat2.omega.reshape(-1)
    def total_dev_energy(s):
        return float(
            (np.asarray(s.dev) * omega[np.asarray(s.mode)] * np.asarray(s.alive)).sum()
        )

    e0 = total_dev_energy(state)
    n0 = int(np.asarray(state.alive).sum())
    for _ in range(10):
        state, out = run(state)
    e1 = total_dev_energy(state)
    n1 = int(np.asarray(state.alive).sum())
    assert n1 == n0  # no particle ever lost or absorbed
    assert int(out.lost) == 0
    # pure specular reflection conserves occupation; energy drift only from
    # f32 round-off on conserved modes
    assert abs(e1 - e0) <= max(2e-4 * abs(e0), 1e-6)
    # everyone stayed inside the box
    pos = np.asarray(state.pos)[np.asarray(state.alive)]
    lo, hi = np.asarray(geo.bounds)
    assert np.all(pos >= lo - 1e-2) and np.all(pos <= hi + 1e-2)


def test_one_to_one_generation(small_material):
    """'one_to_one' regenerates exactly as many particles as were absorbed."""
    mat = small_material
    dom, geo, btab, rtab, params, state = film_setup(mat, n_particles=1e4)
    params = dataclasses.replace(params, res_gen="one_to_one")
    run = build_step(geo, mat.device_tables(), btab, rtab, params, n_inner=10)
    n_start = int(np.asarray(state.alive).sum())
    for _ in range(20):
        state, out = run(state)
    n_end = int(np.asarray(state.alive).sum())
    # population can only change by the one-step lag between leave and refill
    assert abs(n_end - n_start) < 0.05 * n_start
