"""Non-convex (genus-1) geometry: a plate with a square through-hole.

BASELINE config 4 analog (porous membrane / hole array with Voronoi
partitioning): exercises ray-parity containment on a non-convex solid, the
general triangle ray-cast path, rough inner walls, and voronoi subvolumes."""

import numpy as np
import jax.numpy as jnp
import pytest

from nanokappa_tpu.geometry.mesh import TriMesh
from nanokappa_tpu.geometry.domain import Domain, BC, build_domain, _mc_subvol_volume
from nanokappa_tpu.geometry.device import build_device_geometry
from nanokappa_tpu.geometry import stl
from nanokappa_tpu.sim.state import SimParams, init_state, particle_count
from nanokappa_tpu.sim.boundary_tables import build_boundary_tables
from nanokappa_tpu.sim.reservoir import build_reservoir_tables
from nanokappa_tpu.sim.step import build_step


def perforated_plate(L=3e3, W=3e3, H=1e3, a=600.0) -> TriMesh:
    """Box LxWxH with a square hole (side 2a) through the z axis at centre."""
    cx, cy = L / 2, W / 2
    # outer corners (z=0, z=H), hole corners (z=0, z=H)
    O = [(0, 0), (L, 0), (L, W), (0, W)]
    I = [(cx - a, cy - a), (cx + a, cy - a), (cx + a, cy + a), (cx - a, cy + a)]
    v = []
    for z in (0.0, H):
        v += [(x, y, z) for x, y in O]
    for z in (0.0, H):
        v += [(x, y, z) for x, y in I]
    v = np.array(v, dtype=float)
    OB, OT, IB, IT = 0, 4, 8, 12  # index bases

    faces = []
    # top/bottom square rings (outer k..k+1 with inner k..k+1)
    for k in range(4):
        k2 = (k + 1) % 4
        # bottom (z=0), outward normal -z
        faces += [[OB + k, IB + k, OB + k2], [OB + k2, IB + k, IB + k2]]
        # top (z=H), outward normal +z
        faces += [[OT + k, OT + k2, IT + k], [OT + k2, IT + k2, IT + k]]
        # outer side walls
        faces += [[OB + k, OB + k2, OT + k], [OB + k2, OT + k2, OT + k]]
        # inner hole walls (outward = into the hole)
        faces += [[IB + k, IT + k, IB + k2], [IB + k2, IT + k, IT + k2]]
    return TriMesh(v, np.array(faces))


def test_perforated_plate_geometry():
    mesh = perforated_plate()
    # exact volume: L*W*H - (2a)^2*H
    assert mesh.volume == pytest.approx(3e3 * 3e3 * 1e3 - 1200.0**2 * 1e3, rel=1e-6)
    # genus-1 surface: V - E + F = 0
    edges = {tuple(sorted((f[k], f[(k + 1) % 3]))) for f in mesh.faces for k in range(3)}
    assert len(mesh.vertices) - len(edges) + len(mesh.faces) == 0
    # containment: hole interior is OUTSIDE the solid
    assert not mesh.contains(np.array([[1500.0, 1500.0, 500.0]]))[0]
    assert mesh.contains(np.array([[300.0, 300.0, 500.0]]))[0]
    # sampling never lands in the hole
    pts = mesh.sample_volume(2000, np.random.default_rng(0))
    inside_hole = (
        (np.abs(pts[:, 0] - 1500) < 600) & (np.abs(pts[:, 1] - 1500) < 600)
    )
    assert inside_hole.sum() == 0


def test_porous_voronoi_simulation(small_material):
    mat = small_material
    mesh = perforated_plate()
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "plate.stl")
        stl.save_stl(mesh, path)
        dom = build_domain(
            geometry=path,
            subvolumes=("voronoi", 8),
            bound_pos=("relative", -0.1, 0.5, 0.5, 1.1, 0.5, 0.5),
            bound_cond=("T", "T", "R"),
            bound_values=(304.0, 296.0, 5.0),
            connect_pos=("relative",),
        )
    # reservoirs on the two x faces, everything else rough (incl. hole walls)
    assert dom.n_of_reservoirs == 2
    assert len(dom.rough_facets) >= 8

    n_p, rho = particle_count(("total", 8000), mat, dom)
    params = SimParams(
        dt=1.0, n_cap=int(n_p * 2.0), inj_cap=4096,
        particle_density=rho, n_active_modes=mat.n_active_modes,
        t_reference=300.0, temp_interp="nearest", k_max=16,
    )
    geo = build_device_geometry(dom)
    assert not geo.is_box
    btab = build_boundary_tables(mat, dom)
    rtab = build_reservoir_tables(mat, dom, params.dt, rho)
    state = init_state(mat, dom, geo, params, n_p, temp_dist="linear", seed=4)
    run = build_step(geo, mat.device_tables(), btab, rtab, params, n_inner=10)
    for _ in range(25):
        state, out = run(state)
    T = np.asarray(out.T_sv)
    assert np.all(T > 295.9) and np.all(T < 304.1)
    cx = np.asarray(dom.subvol_center[:, 0])
    assert T[np.argmin(cx)] > T[np.argmax(cx)]  # conducts hot -> cold
    # particles stay out of the hole
    alive = np.asarray(state.alive)
    pos = np.asarray(state.pos)[alive]
    in_hole = (np.abs(pos[:, 0] - 1500) < 590) & (np.abs(pos[:, 1] - 1500) < 590)
    assert in_hole.mean() < 0.01
    assert int(out.lost) < 0.05 * n_p
