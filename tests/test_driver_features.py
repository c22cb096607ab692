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
