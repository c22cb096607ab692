"""Parity extras: Ge material swap, 'fixed' energy normalisation,
center_subvol distribution, specular correspondence dump."""

import dataclasses
import os

import numpy as np
import jax.numpy as jnp
import pytest

from nanokappa_tpu.material import synthetic_material
from nanokappa_tpu.sim.state import SimParams, init_state, particle_count
from nanokappa_tpu.sim.step import build_step
from nanokappa_tpu.sim.kappa import kappa_slice

from tests.test_sim_box import film_setup


@pytest.fixture(scope="module")
def ge_material():
    return synthetic_material(mesh=(6, 6, 6), preset="Ge")


def test_ge_swap_runs_unchanged(ge_material):
    """BASELINE config 2: swapping the dispersion/lifetime tables runs the
    same pipeline and produces a lower (softer crystal) film kappa."""
    mat = ge_material
    dom, geo, btab, rtab, params, state = film_setup(mat, n_particles=1e4)
    run = build_step(geo, mat.device_tables(), btab, rtab, params, n_inner=10)
    for _ in range(30):
        state, out = run(state)
    T = np.asarray(out.T_sv)
    assert np.all(T < 302.0) and np.all(T > 298.0)
    _, kt = kappa_slice(
        T, np.asarray(out.phi_sv), np.asarray(out.Np_sv),
        np.array([302.0, 298.0]), 5e3, 0,
    )
    bulk = mat.bulk_kappa_rta(300.0)[0]
    assert 0.15 * bulk < kt < bulk
    assert bulk < 50  # Ge-like: softer than the Si preset (~66)


def test_fixed_energy_normalisation(small_material):
    """'fixed' norm divides by the expected particle count per subvolume
    (classes/Population.py:719-720); at uniform density it must agree with
    'mean' within Monte Carlo noise."""
    mat = small_material
    dom, geo, btab, rtab, params, state = film_setup(mat, n_particles=1e4)
    pf = dataclasses.replace(params, energy_normal="fixed")
    runf = build_step(geo, mat.device_tables(), btab, rtab, pf, n_inner=10)
    runm = build_step(geo, mat.device_tables(), btab, rtab, params, n_inner=10)
    sf = sm = state
    for _ in range(20):
        sf, of = runf(sf)
        sm, om = runm(sm)
    Tf, Tm = np.asarray(of.T_sv), np.asarray(om.T_sv)
    assert np.abs(Tf - Tm).max() < 0.5


def test_center_subvol_distribution(small_material):
    mat = small_material
    dom, geo, btab, rtab, params, _ = film_setup(mat, n_particles=1e4)
    state = init_state(
        mat, dom, geo, params, 10000, temp_dist="mean", part_dist="center_subvol",
    )
    pos = np.asarray(state.pos)[np.asarray(state.alive)]
    # every particle sits exactly on one of the subvolume centres
    d = np.linalg.norm(pos[:, None, :] - dom.subvol_center[None], axis=-1)
    assert d.min(axis=1).max() < 1e-3
    # roughly equal share per centre (equal-volume slices)
    counts = np.bincount(np.argmin(d, axis=1), minlength=10)
    assert counts.min() > 0.8 * counts.max()


def test_specular_correspondence_dump(small_material, tmp_path):
    from nanokappa_tpu.sim.boundary_tables import (
        build_boundary_tables, write_specular_correspondences,
    )

    dom, geo, btab, rtab, params, state = film_setup(small_material)
    write_specular_correspondences(btab, small_material, dom, str(tmp_path))
    path = tmp_path / "specular_correspondences.txt"
    assert path.exists()
    rows = np.loadtxt(path)
    assert rows.shape[1] == 7
    # omega conserved across every correspondence
    J = small_material.n_branches
    w = small_material.omega
    w_in = w[rows[:, 3].astype(int), rows[:, 4].astype(int)]
    w_out = w[rows[:, 5].astype(int), rows[:, 6].astype(int)]
    np.testing.assert_allclose(w_in, w_out, rtol=1e-6)


def test_pooled_generation_matches_constant(small_material):
    """'pooled' generation (TPU-native O(buffer) scheme for production-size
    mode tables: scalar accumulators + alias-sampled modes) reproduces the
    'constant' scheme's steady state within Monte Carlo noise."""
    mat = small_material
    dom, geo, btab, rtab, params, state = film_setup(mat, n_particles=1e4)
    outs = {}
    for scheme in ("constant", "pooled"):
        p = dataclasses.replace(params, res_gen=scheme)
        run = build_step(geo, mat.device_tables(), btab, rtab, p, n_inner=10)
        s = state
        for _ in range(25):
            s, out = run(s)
        outs[scheme] = np.asarray(out.T_sv)
        assert abs(int(out.N_p) - 1e4) < 0.15 * 1e4
        assert int(out.lost) == 0
    assert np.abs(outs["constant"] - outs["pooled"]).max() < 0.4


def test_injection_clipping_telemetry(small_material):
    """Per-(reservoir,mode) generation counts above c_max land in the `lost`
    ledger instead of silently under-injecting; with c_max sized to the
    maximum entry rate (floor(max ep)+1, the driver's autosize) nothing is
    clipped."""
    import jax

    from nanokappa_tpu.sim.reservoir import inject

    mat = small_material
    # very high particle density -> enter_prob well above 1 per mode
    dom, geo, btab, rtab, params, state = film_setup(mat, n_particles=3e5)
    max_ep = float(np.max(np.asarray(rtab.enter_prob)))
    assert max_ep > 2.0, "config must drive per-mode rates above c_max=1"

    key = jax.random.PRNGKey(7)
    big_cap = 1 << 17

    p1 = dataclasses.replace(params, c_max=1, inj_cap=big_cap)
    s1, *_ = inject(state, geo, mat.device_tables(), rtab, p1, key, 0)
    # clipped injections are telemetered in the CAPACITY slot of the split
    # loss vector (state.lost[0]; sim/state.py)
    assert int(s1.lost[0]) > 0
    assert int(s1.lost[1]) == 0 and int(s1.lost[2]) == 0

    pauto = dataclasses.replace(params, c_max=int(max_ep) + 1, inj_cap=big_cap)
    s2, *_ = inject(state, geo, mat.device_tables(), rtab, pauto, key, 0)
    assert int(s2.lost.sum()) == 0
    # the autosized run injected strictly more particles
    assert int(np.asarray(s2.alive).sum()) > int(np.asarray(s1.alive).sum())


def test_frozen_overflow_counter(small_material):
    """An undersized event buffer freezes events instead of losing particles:
    `frozen` ticks up, `lost` stays 0 and the population is intact
    (the two conditions used to share one counter)."""
    mat = small_material
    dom, geo, btab, rtab, params, state = film_setup(mat, n_particles=1e4)
    p = dataclasses.replace(params, evt_cap=8)
    run = build_step(geo, mat.device_tables(), btab, rtab, p, n_inner=5)
    s = state
    for _ in range(4):
        s, out = run(s)
    assert int(out.frozen) > 0
    assert int(out.lost) == 0
    # frozen lanes stay alive: population conserved within injection noise
    assert abs(int(out.N_p) - 1e4) < 0.2 * 1e4


def test_lifetime_by_sv_matches_lookup(small_material):
    """The per-subvolume lifetime table ('nearest' interp fast path) is
    bitwise-identical to the per-particle tau_pair lookup it replaces."""
    mat = small_material.device_tables()
    rng = np.random.default_rng(3)
    from nanokappa_tpu.sim.scatter import lifetime_by_sv, lifetime_lookup

    SV, N = 10, 20000
    T_sv = jnp.asarray(298 + 4 * rng.random(SV), jnp.float32)
    sv = jnp.asarray(rng.integers(0, SV, N), jnp.int32)
    mode = jnp.asarray(rng.integers(0, mat.omega.shape[0], N), jnp.int32)
    a = lifetime_lookup(mat, T_sv[sv], mode)
    b = lifetime_by_sv(mat, T_sv, sv, mode)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
