"""Quantitative transport validation against the analytic RTA conductivity.

A reservoir-driven box in the diffusive regime (uniform 5 ps lifetimes, box
length ~60 mean free paths, initialised on the steady linear profile) must
carry a heat flux equal to kappa_RTA * dT/dx within Monte Carlo noise and a
small contact correction. This pins the solver's headline observable — kappa
from flux per gradient — against an exact closed-form value with no external
data (SURVEY.md section 7, validation gate 1 analog).

A companion check documents a known discretisation artifact shared with the
reference scheme: piecewise-LINEAR particle-temperature interpolation
(classes/Population.py:694-702) acts as a profile smoother through the RTA
collision term, adding numerical diffusion ~ (1 - e^{-dt/tau}) k^2 dx^2 / dt
to transient relaxation; 'nearest' interpolation does not.
"""

import copy
import dataclasses

import numpy as np
import pytest

from nanokappa_tpu.geometry.domain import build_domain
from nanokappa_tpu.geometry.device import build_device_geometry
from nanokappa_tpu.material import synthetic_material
from nanokappa_tpu.sim.state import SimParams, init_state, particle_count
from nanokappa_tpu.sim.boundary_tables import build_boundary_tables
from nanokappa_tpu.sim.reservoir import build_reservoir_tables
from nanokappa_tpu.sim.step import build_step
from nanokappa_tpu.constants import A_IN_M


def _diffusive_material():
    mat = copy.copy(synthetic_material(mesh=(6, 6, 6)))
    # uniform 5 ps lifetimes: MFP 150-420 A, every mode diffusive at L=20k A
    mat.tau = np.where(mat.tau > 0, 5.0, 0.0)
    return mat


def test_steady_flux_matches_rta_kappa():
    mat = _diffusive_material()
    L = 20e3
    n_sv = 16
    dom = build_domain(
        geometry="box",
        dimensions=(L, 1e3, 1e3),
        subvolumes=("slice", n_sv, 0),
        bound_pos=(
            "relative",
            -0.1, 0.5, 0.5, 1.1, 0.5, 0.5, 0.5, 0.5, -0.1, 0.5, 0.5, 1.1,
        ),
        bound_cond=("T", "T", "R", "R", "P"),
        bound_values=(304.0, 296.0, 0.0, 0.0),
        connect_pos=("relative", 0.5, -0.1, 0.5, 0.5, 1.1, 0.5),
    )
    n_p, rho = particle_count(("total", 4e4), mat, dom)
    params = SimParams(
        dt=2.0, n_cap=int(n_p * 1.4), inj_cap=4096,
        particle_density=rho, n_active_modes=mat.n_active_modes,
        t_reference=300.0, temp_interp="nearest",
    )
    geo = build_device_geometry(dom)
    btab = build_boundary_tables(mat, dom)
    rtab = build_reservoir_tables(mat, dom, params.dt, rho)
    # start on the steady profile: the diffusion time L^2/alpha (~2.5e5 ps)
    # is unaffordable from a cold start
    state = init_state(mat, dom, geo, params, n_p, temp_dist="linear", seed=3)
    run = build_step(geo, mat.device_tables(), btab, rtab, params, n_inner=10)

    phis, Ts = [], []
    for i in range(100):  # 2000 ps
        state, out = run(state)
        if i >= 50:
            phis.append(np.asarray(out.phi_sv, float)[:, 0])
            Ts.append(np.asarray(out.T_sv, float))
    phi = np.mean(phis, axis=0)
    T = np.mean(Ts, axis=0)

    # interior flux per imposed interior gradient
    dTdx = np.gradient(T, L / n_sv)[3:-3] / A_IN_M  # K/m
    kappa_eff = float(np.mean(-phi[3:-3] / dTdx))
    # drift-then-scatter splitting (the reference's update order too,
    # classes/Population.py:1743-1756) biases the effective relaxation time
    # to tau + dt/2; with that correction the solver matches the analytic
    # discrete-RTA conductivity to better than 1% (measured 7.019 vs 6.989 at
    # dt=1, 7.678 vs 7.624 at dt=2)
    tau, dt = 5.0, 2.0
    kappa_pred = mat.bulk_kappa_rta(300.0)[0] * (tau + dt / 2) / tau
    assert kappa_eff == pytest.approx(kappa_pred, rel=0.05), (kappa_eff, kappa_pred)
    # profile stays monotone and anchored by the reservoirs
    assert np.all(np.diff(T) < 0)
    assert 296.0 < T[-1] < T[0] < 304.0


def test_linear_interp_numerical_smoothing_documented():
    """Transient sine decay: LINEAR particle-T interpolation damps the profile
    much faster than 'nearest' (the reference-default) — the RTA term relaxes
    toward a smoothed profile. Regression-guards the interpolation paths."""
    mat = _diffusive_material()
    L = 20e3
    n_sv = 16

    def gamma_for(interp):
        dom = build_domain(
            geometry="box",
            dimensions=(L, 1e3, 1e3),
            subvolumes=("slice", n_sv, 0),
            bound_pos=("relative", 0.5, 0.5, -0.1, 0.5, 0.5, 1.1),
            bound_cond=("R", "R", "R"),
            bound_values=(0.0, 0.0, 0.0),
            connect_pos=(
                "relative",
                -0.1, 0.5, 0.5, 1.1, 0.5, 0.5, 0.5, -0.1, 0.5, 0.5, 1.1, 0.5,
            ),
        )
        n_p, rho = particle_count(("total", 2e4), mat, dom)
        params = SimParams(
            dt=2.0, n_cap=n_p, inj_cap=64, particle_density=rho,
            n_active_modes=mat.n_active_modes, t_reference=300.0,
            temp_interp=interp,
        )
        geo = build_device_geometry(dom)
        btab = build_boundary_tables(mat, dom)
        rtab = build_reservoir_tables(mat, dom, params.dt, rho)
        xc = dom.subvol_center[:, 0]
        T0 = 300.0 + 3.0 * np.sin(2 * np.pi * xc / L)
        state = init_state(
            mat, dom, geo, params, n_p, temp_dist="custom",
            subvol_temp=list(T0), seed=11,
        )
        run = build_step(geo, mat.device_tables(), btab, rtab, params, n_inner=10)
        basis = np.sin(2 * np.pi * xc / L)
        basis /= (basis**2).sum()
        amps, ts = [], []
        for i in range(12):
            state, out = run(state)
            T = np.asarray(out.T_sv, float)
            amps.append(((T - T.mean()) * basis).sum())
            ts.append((i + 1) * 20.0)
        amps, ts = np.array(amps), np.array(ts)
        sel = amps > 0.3
        return -np.polyfit(ts[sel], np.log(amps[sel]), 1)[0]

    g_near = gamma_for("nearest")
    g_lin = gamma_for("linear")
    assert g_lin > 2.0 * g_near  # the smoothing artifact is large and real
    # nearest-interp decay stays within an order of magnitude of alpha*k^2
    kappa = mat.bulk_kappa_rta(300.0)[0]
    from nanokappa_tpu.constants import EV_IN_J, PS_IN_S

    c_vol = mat.mode_heat_capacity(300.0).sum() / (
        mat.n_qpoints * mat.volume_unitcell
    ) * EV_IN_J / A_IN_M**3
    alpha = kappa / c_vol / (A_IN_M**2 / PS_IN_S)
    gamma_pred = alpha * (2 * np.pi / L) ** 2
    assert gamma_pred < g_near < 10 * gamma_pred
