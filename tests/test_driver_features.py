"""Driver-level features: empty subvolumes, kappa path, material rotation."""

import numpy as np
import pytest

from nanokappa_tpu.geometry.domain import build_domain
from nanokappa_tpu.geometry.device import build_device_geometry
from nanokappa_tpu.sim.state import SimParams, init_state, particle_count


def test_empty_subvols(small_material):
    mat = small_material
    dom = build_domain(
        geometry="box",
        dimensions=(5e3, 1e3, 1e3),
        subvolumes=("slice", 5, 0),
        bound_pos=("relative", -0.1, 0.5, 0.5),
        bound_cond=("T", "R"),
        bound_values=(300.0, 0.0),
        connect_pos=("relative",),
    )
    n_p, rho = particle_count(("total", 4000), mat, dom)
    params = SimParams(
        dt=1.0, n_cap=6400, inj_cap=256,
        particle_density=rho, n_active_modes=mat.n_active_modes,
    )
    geo = build_device_geometry(dom)
    state = init_state(
        mat, dom, geo, params, n_p, temp_dist="mean", empty_subvols=[2],
    )
    pos = np.asarray(state.pos)[np.asarray(state.alive)]
    sv = np.argmin(
        np.linalg.norm(pos[:, None, :] - dom.subvol_center[None], axis=-1), axis=1
    )
    assert (sv == 2).sum() == 0
    assert len(pos) == 4000


def test_kappa_path_snapping(small_material):
    dom = build_domain(
        geometry="box",
        dimensions=(3e3, 1e3, 1e3),
        subvolumes=("grid", 4, 2, 1),
        bound_pos=("relative", -0.1, 0.5, 0.5),
        bound_cond=("T", "R"),
        bound_values=(300.0, 0.0),
        connect_pos=("relative",),
    )
    pts = np.array([[100.0, 100.0, 500.0], [2900.0, 900.0, 500.0]])
    path = dom.find_path(pts)
    # path starts/ends at the subvolumes nearest the probe points
    c = dom.subvol_center
    assert path[0] == int(np.argmin(np.linalg.norm(c - pts[0], axis=1)))
    assert path[-1] == int(np.argmin(np.linalg.norm(c - pts[1], axis=1)))
    # consecutive path entries are graph-connected
    cons = dom.path_connections(path)
    assert len(cons) == len(path) - 1


def test_material_rotation(tmp_path):
    from nanokappa_tpu.material import write_synthetic_hdf5, load_material

    write_synthetic_hdf5(str(tmp_path), mesh=(4, 4, 4))
    base = load_material(str(tmp_path), "kappa-m444.hdf5", "POSCAR")
    rot = load_material(
        str(tmp_path), "kappa-m444.hdf5", "POSCAR",
        rotation=([0.0, 0.0, 90.0], "xyz"),
    )
    # omega unchanged; wavevectors and velocities rotated 90deg about z
    np.testing.assert_allclose(rot.omega, base.omega, atol=1e-12)
    Rz = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(
        rot.wavevectors, base.wavevectors @ Rz.T, atol=1e-9
    )
    np.testing.assert_allclose(
        rot.group_vel.reshape(-1, 3),
        base.group_vel.reshape(-1, 3) @ Rz.T,
        atol=1e-9,
    )
    # bulk kappa of the cubic crystal is rotation-invariant
    np.testing.assert_allclose(
        rot.bulk_kappa_rta(300.0), base.bulk_kappa_rta(300.0), rtol=1e-9
    )


def test_evt_cap_regrow(tmp_path):
    """Frozen-storm adaptation: _rebuild_step grows the event buffer and
    rebuilds the jitted runners in place — the running SimState carries
    over (its pytree is unchanged) and the simulation continues cleanly."""
    from nanokappa_tpu.io.config import read_args
    from nanokappa_tpu.driver import Simulation
    from nanokappa_tpu.material import write_synthetic_hdf5

    matdir = str(tmp_path / "mat")
    write_synthetic_hdf5(matdir, mesh=(4, 4, 4))
    argv = [
        "--mat_folder", matdir, "--hdf_file", "kappa-m444.hdf5",
        "--poscar_file", "POSCAR", "--geometry", "box",
        "--dimensions", "5e3", "1e3", "1e3",
        "--subvolumes", "slice", "5", "0",
        "--bound_pos", "relative", "-0.1", "0.5", "0.5",
        "1.1", "0.5", "0.5",
        "--bound_cond", "T", "T", "P", "--bound_values", "302", "298",
        "--connect_pos", "relative", "0.5", "-0.1", "0.5",
        "0.5", "1.1", "0.5", "0.5", "0.5", "-0.1", "0.5", "0.5", "1.1",
        "--particles", "total", "3e3", "--timestep", "1",
        "--iterations", "100",
        "--results_folder", str(tmp_path / "res"), "--output", "screen",
    ]
    from nanokappa_tpu.io.config import generate_results_folder

    args = generate_results_folder(read_args(argv))
    sim = Simulation(args)
    sim.state, out0 = sim.run_steps(sim.state)
    old_cap = sim.params.evt_cap
    sim._rebuild_step(evt_cap=512)
    assert sim.params.evt_cap == 512 and sim.params.evt_cap != old_cap
    assert sim._run_tail is None  # tail runner dropped, rebuilt on demand
    sim.state, out1 = sim.run_steps(sim.state)
    import jax

    T = np.asarray(jax.tree.map(lambda x: x[-1], out1).T_sv)
    assert np.all(T > 290) and np.all(T < 310)
    Np = int(np.asarray(jax.tree.map(lambda x: x[-1], out1).N_p))
    assert abs(Np - 3000) < 300


def test_nearest_center_ids_chunked_matches_direct():
    """Chunked squared-distance argmin == the direct norm argmin (init_state's
    subvolume assignment, rewritten chunked for 1e7-particle pools)."""
    from nanokappa_tpu.sim.state import nearest_center_ids

    rng = np.random.default_rng(3)
    pos = rng.uniform(-1, 1, size=(5000, 3))
    centers = rng.uniform(-1, 1, size=(17, 3))
    d = np.linalg.norm(pos[:, None, :] - centers[None], axis=-1)
    np.testing.assert_array_equal(
        nearest_center_ids(pos, centers), np.argmin(d, axis=1)
    )


def test_boundary_tables_host_cache(small_material):
    """build_boundary_tables stashes NumPy originals so host consumers never
    pull the multi-MB device tables back through the tunnel; the fallback
    path (instance without `_host`, e.g. after a pytree round trip) must give
    identical tables."""
    import dataclasses

    import jax

    from nanokappa_tpu.sim.boundary_tables import (
        _host_table, build_boundary_tables, combined_mirror_rows,
    )

    dom = build_domain(
        geometry="box",
        dimensions=(5e3, 1e3, 1e3),
        subvolumes=("slice", 5, 0),
        bound_pos=("relative", -0.1, 0.5, 0.5, 1.1, 0.5, 0.5),
        bound_cond=("T", "T", "R"),
        bound_values=(302.0, 298.0, 0.0),
        connect_pos=("relative",),
    )
    btab = build_boundary_tables(small_material, dom)
    assert hasattr(btab, "_host")
    for name in ("specularity", "corr"):
        np.testing.assert_array_equal(
            _host_table(btab, name), np.asarray(getattr(btab, name))
        )
    # pytree round trip drops the stash; fallback must still work
    leaves, treedef = jax.tree.flatten(btab)
    bare = jax.tree.unflatten(treedef, leaves)
    assert not hasattr(bare, "_host")
    np.testing.assert_array_equal(
        _host_table(bare, "corr"), _host_table(btab, "corr")
    )
    r1 = combined_mirror_rows(btab, small_material)
    r2 = combined_mirror_rows(bare, small_material)
    if r1 is None:
        assert r2 is None
    else:
        np.testing.assert_array_equal(r1, r2)
