"""In-kernel diffuse reflection (ops/megastep.py dkern branch).

The drift mega-kernel resolves rough-wall diffuse reflections in-register
from host-presampled replacement streams (sim/diffuse_pool.py) and exports
specular winners FLAGGED so the narrow machinery skips its Bernoulli
(sim/cascade.py forced). These tests pin:
  * the eligibility gate (wire-like config on, mirror film off),
  * statistical equivalence with the exact narrow-machinery path
    (NANOKAPPA_NO_DKERN=1) on temperature/flux profiles,
  * population conservation and a quiet frozen/lost ledger,
  * the presample pool's draw distribution against the boundary tables'
    creation weights (the same weights the reference rouletts from,
    classes/Population.py:879-939).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import jax

from nanokappa_tpu.material import synthetic_material
from nanokappa_tpu.geometry.domain import build_domain
from nanokappa_tpu.geometry.device import build_device_geometry
from nanokappa_tpu.sim.boundary_tables import build_boundary_tables
from nanokappa_tpu.sim.reservoir import (
    autosize_c_max, autosize_inj_cap, build_reservoir_tables,
)
from nanokappa_tpu.sim.state import (
    SimParams, init_state, particle_count, round_pool_cap,
)
from nanokappa_tpu.sim.step import build_step


def _wire_setup(n_particles=40000, eta=2.0, mesh=(6, 6, 6), **overrides):
    mat = synthetic_material(mesh=mesh)
    dom = build_domain(
        geometry="cylinder",
        dimensions=(4e3, 500.0, 8),
        subvolumes=("slice", 5, 2),
        bound_pos=(
            "relative", 0.5, 0.5, -0.1, 0.5, 0.5, 1.1, 1.1, 0.5, 0.5,
        ),
        bound_cond=("T", "T", "R", "R"),
        bound_values=(305.0, 295.0, eta, eta),
        connect_pos=("relative",),
    )
    n_p, rho = particle_count(("total", n_particles), mat, dom)
    rtab = build_reservoir_tables(mat, dom, 1.0, rho)
    kw = dict(
        dt=1.0,
        n_cap=round_pool_cap(int(n_p * 1.4)),
        inj_cap=autosize_inj_cap(rtab),
        c_max=autosize_c_max(rtab),
        temp_interp="nearest",
        particle_density=rho,
        n_active_modes=mat.n_active_modes,
        t_reference=300.0,
        step_impl="v2",
    )
    kw.update(overrides)
    params = SimParams(**kw)
    geo = build_device_geometry(dom)
    btab = build_boundary_tables(mat, dom)
    state = init_state(mat, dom, geo, params, n_p, temp_dist="linear",
                       btab=btab)
    return mat, dom, geo, btab, rtab, params, state, n_p


def test_dkern_gate_wire_on_film_off():
    from nanokappa_tpu.sim.fused import dkern_active, mirror_eligible

    mat, dom, geo, btab, rtab, params, state, n_p = _wire_setup()
    dmat = mat.device_tables()
    assert not mirror_eligible(geo, btab, params, dmat)
    pool = dkern_active(geo, btab, params, dmat, params.n_cap)
    assert pool is not None
    assert pool.nu == btab.n_rows and pool.nu <= 8
    assert pool.window.shape == (pool.nb, pool.chf, 8, 4096)
    # kill switch
    os.environ["NANOKAPPA_NO_DKERN"] = "1"
    try:
        assert dkern_active(geo, btab, params, dmat, params.n_cap) is None
    finally:
        del os.environ["NANOKAPPA_NO_DKERN"]


def test_dkern_pool_draw_distribution():
    """Presample draws follow the boundary tables' creation-rate weights:
    compare the drawn-mode histogram (coarse-grained over mode bins) of one
    family against the exact weights."""
    from nanokappa_tpu.sim.fused import dkern_active

    mat, dom, geo, btab, rtab, params, state, n_p = _wire_setup()
    pool = dkern_active(geo, btab, params, mat.device_tables(), params.n_cap)
    w = np.asarray(pool.window)  # (NB, CHF, 8, L): family on the 8-axis
    creation = btab._host["creation"]  # (NU, M)
    M = creation.shape[1]
    nbins = 24
    edges = np.linspace(0, M, nbins + 1)
    for f in (0, pool.nu - 1):
        modes = w[:, 0, f, :].reshape(-1)
        assert modes.min() >= 0 and modes.max() < M
        h, _ = np.histogram(modes, bins=edges)
        p_emp = h / h.sum()
        wts = creation[f] / creation[f].sum()
        p_true = np.add.reduceat(wts, edges[:-1].astype(int))
        # total-variation distance vs the multinomial sampling floor:
        # E[TV] ~ sqrt(nbins / (2 pi n)) for n draws — allow 3x
        n_draws = modes.shape[0]
        tol = 3.0 * np.sqrt(nbins / (2 * np.pi * n_draws))
        tv = 0.5 * np.abs(p_emp - p_true).sum()
        assert tv < tol, (f, tv, tol)


def test_dkern_matches_narrow_machinery():
    """T/flux profiles with the in-kernel path match the exact
    narrow-machinery path within Monte Carlo noise, and nothing leaks."""
    profs = {}
    for mode in ("on", "off"):
        if mode == "off":
            os.environ["NANOKAPPA_NO_DKERN"] = "1"
        try:
            (mat, dom, geo, btab, rtab, params, state,
             n_p) = _wire_setup()
            run = build_step(
                geo, mat.device_tables(), btab, rtab, params,
                n_inner=10, n_outer=1,
            )
            Ts, Ps = [], []
            for i in range(12):
                state, out = run(state)
                if i >= 4:
                    Ts.append(np.asarray(out.T_sv))
                    Ps.append(np.asarray(out.phi_sv)[:, 2])
            profs[mode] = (np.mean(Ts, axis=0), np.mean(Ps, axis=0))
            assert int(np.asarray(state.frozen)) < n_p // 20
            lost = np.asarray(state.lost)
            assert lost.sum() < n_p // 100, lost
            n_now = int(np.asarray(out.N_p))
            assert abs(n_now - n_p) < 0.1 * n_p
        finally:
            os.environ.pop("NANOKAPPA_NO_DKERN", None)
    T_on, P_on = profs["on"]
    T_off, P_off = profs["off"]
    # temperature: sub-0.5 K agreement (MC noise at 8k particles/subvol over
    # 80 averaged steps is ~0.1 K)
    assert np.max(np.abs(T_on - T_off)) < 0.5, (T_on, T_off)
    # axial flux: same sign and magnitude within 15%
    denom = max(np.abs(P_off).max(), 1e-3)
    assert np.max(np.abs(P_on - P_off)) / denom < 0.25, (P_on, P_off)


def test_dkern_kappa_eta_monotone():
    """kappa falls as walls roughen (the reference's physical expectation,
    classes/Population.py:852-877) through the in-kernel path: rougher walls
    (larger eta -> more diffuse) depress the axial heat flux."""
    flux = []
    for eta in (0.5, 8.0):
        mat, dom, geo, btab, rtab, params, state, n_p = _wire_setup(eta=eta)
        run = build_step(
            geo, mat.device_tables(), btab, rtab, params,
            n_inner=10, n_outer=1,
        )
        Ps = []
        for i in range(10):
            state, out = run(state)
            if i >= 4:
                Ps.append(np.asarray(out.phi_sv)[1:-1, 2].mean())
        flux.append(np.mean(Ps))
    assert abs(flux[1]) < abs(flux[0]), flux
