"""Multi-chip correctness on the 8-device virtual CPU mesh (conftest.py).

The driver's dryrun validates the same path; here we additionally check
physics equivalence: an 8-shard run must reproduce the single-chip subvolume
statistics within Monte Carlo noise (SURVEY.md section 4 test strategy)."""

import numpy as np
import jax
import pytest

from nanokappa_tpu.parallel import make_particle_mesh, shard_state, build_sharded_step
from nanokappa_tpu.sim.state import SimParams, init_state, particle_count
from nanokappa_tpu.sim.step import build_step

from tests.test_sim_box import film_setup


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_particle_mesh(8)


def test_sharded_step_runs_and_matches(small_material, mesh):
    import dataclasses

    mat = small_material
    dom, geo, btab, rtab, params, _ = film_setup(mat, n_particles=16000)
    mtab = mat.device_tables()

    # single chip reference
    from nanokappa_tpu.sim.state import init_state as _init

    params1 = dataclasses.replace(params, n_cap=24000, n_shards=1)
    s1 = _init(mat, dom, geo, params1, 16000, temp_dist="linear", seed=3)
    run1 = build_step(geo, mtab, btab, rtab, params1, n_inner=10)

    # 8 shards
    params8 = dataclasses.replace(params, n_cap=24000, n_shards=8)
    s8 = _init(mat, dom, geo, params8, 16000, temp_dist="linear", seed=4)
    s8 = shard_state(s8, mesh)
    run8 = build_sharded_step(geo, mtab, btab, rtab, params8, mesh, n_inner=10)

    for _ in range(20):
        s1, o1 = run1(s1)
        s8, o8 = run8(s8)

    T1, T8 = np.asarray(o1.T_sv), np.asarray(o8.T_sv)
    # same physics within MC noise
    assert np.abs(T1 - T8).max() < 0.35
    # population conserved on both paths
    assert abs(int(o8.N_p) - int(o1.N_p)) < 0.1 * int(o1.N_p)
    assert int(o8.lost) == 0
    # state stays sharded over the mesh
    assert len(s8.pos.sharding.device_set) == 8


def test_ensemble_mesh_independent_replicas(small_material):
    """2-D ("r","p") mesh: 2 replicas x 4 particle shards; each replica
    evolves an independent chain (distinct T_sv rows), outputs stack."""
    import dataclasses

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from nanokappa_tpu.parallel import (
        build_ensemble_step, make_ensemble_mesh, stack_ensemble_state,
    )
    from nanokappa_tpu.sim.state import init_state as _init

    mat = small_material
    dom, geo, btab, rtab, params, _ = film_setup(mat, n_particles=4000)
    params = dataclasses.replace(params, n_cap=8000, n_shards=4)
    mesh2 = make_ensemble_mesh(2, 4)
    states = [
        _init(mat, dom, geo, params, 4000, temp_dist="linear", seed=100 + i)
        for i in range(2)
    ]
    gstate = stack_ensemble_state(states, mesh2)
    run = build_ensemble_step(
        geo, mat.device_tables(), btab, rtab, params, mesh2, n_inner=5
    )
    for _ in range(6):
        gstate, out = run(gstate)
    T = np.asarray(out.T_sv)  # (2, SV)
    assert T.shape == (2, 10)
    # independent chains: same physics, different noise
    assert np.abs(T[0] - T[1]).max() > 1e-6
    assert np.abs(T[0] - T[1]).max() < 1.0
    assert np.all(T > 298.0) and np.all(T < 302.0)
    assert int(np.asarray(out.lost).sum()) == 0


def test_sharded_outputs_replicated(small_material, mesh):
    import dataclasses

    mat = small_material
    dom, geo, btab, rtab, params, _ = film_setup(mat, n_particles=8000)
    params8 = dataclasses.replace(params, n_cap=16000, n_shards=8)
    state = init_state(mat, dom, geo, params8, 8000, temp_dist="linear", seed=7)
    state = shard_state(state, mesh)
    run8 = build_sharded_step(
        geo, mat.device_tables(), btab, rtab, params8, mesh, n_inner=5
    )
    state, out = run8(state)
    # T_sv must be bitwise identical on every device (replicated after psum)
    shards = [np.asarray(s.data) for s in out.T_sv.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_sharded_escape_repair(small_material, mesh):
    """Escape self-healing on 8 shards (reference contains_check,
    classes/Population.py:1712-1722): out-of-bounds particles injected into a
    sharded state are resampled inside the volume, the collision cache is
    rebuilt, and the particle arrays stay sharded over "p"."""
    import dataclasses

    import jax.numpy as jnp

    from nanokappa_tpu.sim.repair import make_contains_check

    mat = small_material
    dom, geo, btab, rtab, params, _ = film_setup(mat, n_particles=8000)
    params8 = dataclasses.replace(params, n_cap=16000, n_shards=8)
    state = init_state(mat, dom, geo, params8, 8000, temp_dist="linear", seed=9)

    # push ~200 alive particles far outside the box, spread across the pool
    # (every shard gets some)
    pos = np.asarray(state.pos).copy()
    alive = np.asarray(state.alive)
    idx = np.nonzero(alive)[0][:: max(1, alive.sum() // 200)][:200]
    pos[idx] = np.array([1e6, 1e6, 1e6])
    from nanokappa_tpu.sim.state import with_cols

    state = with_cols(state, pos=jnp.asarray(pos))
    state = shard_state(state, mesh)

    pool = dom.mesh.sample_volume(1 << 10, np.random.default_rng(1))
    check = make_contains_check(geo, jnp.asarray(pool, dtype=jnp.float32), params.dt)
    healed, n_esc = check(state, jax.random.PRNGKey(0))

    assert int(n_esc) == len(idx)
    hp = np.asarray(healed.pos)[np.asarray(healed.alive)]
    lo, hi = dom.mesh.bounds
    assert np.all(hp >= lo - 1.0) and np.all(hp <= hi + 1.0)
    # collision cache rebuilt for the healed slots
    assert np.all(np.asarray(healed.coll_facet)[idx] >= 0)
    # the repaired state keeps its particle-axis sharding
    assert not healed.pos.sharding.is_fully_replicated
    # and the sharded step still runs on the repaired state
    run8 = build_sharded_step(
        geo, mat.device_tables(), btab, rtab, params8, mesh, n_inner=2
    )
    healed, out = run8(healed)
    assert int(out.N_p) > 0
