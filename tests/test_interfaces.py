"""Internal-interface (multi-region STL) support.

Reference get_interfaces (classes/Mesh.py:329-352): a facet whose boundary
edges are all shared by >2 faces is an internal membrane. Internal faces are
excluded from ray-parity (winding/containment) and from the volume integral,
but remain collision targets (reference find_boundary keeps all faces,
classes/Mesh.py:806-856), so an interior wall can carry a rough-wall BC.
"""

import numpy as np
import pytest

from nanokappa_tpu.geometry.mesh import TriMesh
from nanokappa_tpu.geometry.domain import BC, build_domain
from nanokappa_tpu.geometry.device import build_device_geometry
from nanokappa_tpu.geometry import stl
from nanokappa_tpu.sim.state import SimParams, init_state, particle_count
from nanokappa_tpu.sim.boundary_tables import build_boundary_tables
from nanokappa_tpu.sim.reservoir import build_reservoir_tables
from nanokappa_tpu.sim.step import build_step


def membrane_box(L=2e3, W=1e3, H=1e3, doubled=False) -> TriMesh:
    """Box LxWxH with an internal wall at x=L/2 spanning the full cross
    section. `doubled=True` emits the membrane as two coincident sheets with
    opposite winding (what a two-solid STL export produces)."""
    xs = (0.0, L / 2, L)
    v = np.array(
        [(x, y, z) for x in xs for y in (0.0, W) for z in (0.0, H)], dtype=float
    )

    def vid(i, j, k):
        return i * 4 + j * 2 + k

    faces = []

    def quad(a, b, c, d):
        faces.append([a, b, c])
        faces.append([a, c, d])

    quad(vid(0, 0, 0), vid(0, 0, 1), vid(0, 1, 1), vid(0, 1, 0))  # x=0
    quad(vid(2, 0, 0), vid(2, 1, 0), vid(2, 1, 1), vid(2, 0, 1))  # x=L
    for i in range(2):  # two cells along x
        quad(vid(i, 0, 0), vid(i + 1, 0, 0), vid(i + 1, 0, 1), vid(i, 0, 1))
        quad(vid(i, 1, 0), vid(i, 1, 1), vid(i + 1, 1, 1), vid(i + 1, 1, 0))
        quad(vid(i, 0, 0), vid(i, 1, 0), vid(i + 1, 1, 0), vid(i + 1, 0, 0))
        quad(vid(i, 0, 1), vid(i + 1, 0, 1), vid(i + 1, 1, 1), vid(i, 1, 1))
    quad(vid(1, 0, 0), vid(1, 0, 1), vid(1, 1, 1), vid(1, 1, 0))  # membrane
    if doubled:
        quad(vid(1, 0, 0), vid(1, 1, 0), vid(1, 1, 1), vid(1, 0, 1))
    return TriMesh(v, np.array(faces))


@pytest.mark.parametrize("doubled", [False, True])
def test_membrane_detection(doubled):
    m = membrane_box(doubled=doubled)
    n_membrane_faces = 4 if doubled else 2
    assert m.face_is_interface.sum() == n_membrane_faces
    assert len(m.interfacets) == 1  # doubled sheets group into ONE facet
    assert m.n_facets == 7
    # membrane must not corrupt parity-based volume / containment
    assert m.volume == pytest.approx(2e3 * 1e3 * 1e3, rel=1e-6)
    assert np.allclose(m.center_mass, [1e3, 500, 500], atol=1e-6)
    inside = m.contains(np.array([[500.0, 500, 500], [1500.0, 500, 500]]))
    assert inside.all()
    assert not m.contains(np.array([[2500.0, 500, 500]]))[0]
    # external boxes keep no interfaces
    assert TriMesh(m.vertices, m.faces[:20]).face_is_interface.sum() == 0


def test_membrane_survives_stl_roundtrip(tmp_path):
    m = membrane_box(doubled=True)
    path = str(tmp_path / "membrane.stl")
    stl.save_stl(m, path)
    m2 = stl.load_stl(path)
    assert len(m2.interfacets) == 1
    assert m2.volume == pytest.approx(m.volume, rel=1e-6)


def test_membrane_domain_transport(tmp_path, small_material):
    """An interior rough membrane runs end to end: the membrane facet takes a
    BC from its probe point, particles collide with it, and a short simulation
    conserves the population (no escapes through the internal wall)."""
    mat = small_material
    m = membrane_box()
    path = str(tmp_path / "membrane.stl")
    stl.save_stl(m, path)
    dom = build_domain(
        geometry=path,
        subvolumes=("slice", 4, 0),
        bound_pos=(
            "relative",
            -0.1, 0.5, 0.5,  # x=0 reservoir
            1.1, 0.5, 0.5,  # x=L reservoir
            0.5, 0.5, 0.5,  # membrane probe (interior point -> closest facet)
        ),
        bound_cond=("T", "T", "R", "R"),
        bound_values=(305.0, 295.0, 2.0, 0.0),
        connect_pos=("relative",),
    )
    # the interior probe picked the membrane facet and made it rough eta=2
    mem = np.nonzero(dom.mesh.facet_is_interface)[0]
    assert len(mem) == 1
    assert dom.bound_cond[mem[0]] == BC.ROUGH
    assert dom.facet_values[mem[0]] == 2.0

    n_p, rho = particle_count(("total", 4000), mat, dom)
    params = SimParams(
        dt=1.0,
        n_cap=int(n_p * 1.5),
        inj_cap=1 << 10,
        particle_density=rho,
        n_active_modes=mat.n_active_modes,
        t_reference=300.0,
    )
    geo = build_device_geometry(dom)
    btab = build_boundary_tables(mat, dom)
    rtab = build_reservoir_tables(mat, dom, params.dt, rho)
    state = init_state(mat, dom, geo, params, n_p, temp_dist="linear", seed=3)
    run = build_step(geo, mat.device_tables(), btab, rtab, params, n_inner=10)
    for _ in range(5):
        state, out = run(state)
    assert int(out.N_p) > 0
    # population intact: every alive particle still inside the box
    pos = np.asarray(state.pos)[np.asarray(state.alive)]
    lo, hi = dom.mesh.bounds
    assert np.all(pos >= lo - 1.0) and np.all(pos <= hi + 1.0)
    # membrane saw collisions: with two reservoirs and an interior wall the
    # temperature profile still relaxes monotonically hot -> cold
    T = np.asarray(out.T_sv)
    assert T[0] > T[-1]
    assert int(np.asarray(state.lost).sum()) <= n_p * 0.02


def test_membrane_two_sided_tables(tmp_path, small_material):
    """Back-side hits on an internal membrane use tables built for the
    flipped normal (BoundaryTables.row_back): the diffuse creation support
    of the front row points INTO the front region (v.n < 0) and the back
    row into the back region (v.n > 0), so diffuse re-emission never draws
    a mode directed through the wall (lift of the round-2 one-sidedness,
    docs/PARITY.md)."""
    mat = small_material
    m = membrane_box()
    path = str(tmp_path / "membrane.stl")
    stl.save_stl(m, path)
    dom = build_domain(
        geometry=path,
        subvolumes=("slice", 2, 0),
        bound_pos=("relative", 0.5, 0.5, 0.5),
        bound_cond=("R", "R"),
        bound_values=(2.0, 0.0),
        connect_pos=("relative",),
    )
    btab = build_boundary_tables(mat, dom)
    mem = np.nonzero(dom.mesh.facet_is_interface)[0][0]
    i_rough = int(np.nonzero(dom.rough_facets == mem)[0][0])
    row_f = int(np.asarray(btab.row_of_rough)[i_rough])
    row_b = int(np.asarray(btab.row_back)[i_rough])
    assert row_f != row_b
    # boundary facets keep row_back == row_of_rough
    for i, f in enumerate(dom.rough_facets):
        if f != mem:
            assert int(np.asarray(btab.row_back)[i]) == int(
                np.asarray(btab.row_of_rough)[i]
            )
    n = dom.mesh.facet_normals[mem]
    vdn = np.asarray(mat.group_vel).reshape(-1, 3) @ n
    cdf = np.asarray(btab.diffuse_cdf)
    for row, sign in ((row_f, -1.0), (row_b, +1.0)):
        creation = np.diff(cdf[row], prepend=0.0)
        support = creation > 1e-12
        assert support.any()
        assert np.all(sign * vdn[support] > 0.0)


def test_membrane_watertight_diffuse(tmp_path, small_material):
    """A fully-diffuse internal membrane spanning the whole cross section is
    watertight from BOTH sides: with no reservoirs the per-side particle
    counts are exactly conserved (a one-sided table would let back-side
    diffuse hits re-emit through the wall)."""
    mat = small_material
    m = membrane_box()
    path = str(tmp_path / "membrane.stl")
    stl.save_stl(m, path)
    dom = build_domain(
        geometry=path,
        subvolumes=("slice", 2, 0),
        bound_pos=("relative",),
        bound_cond=("R",),
        bound_values=(10.0,),  # eta so large every hit is diffuse
        connect_pos=("relative",),
    )
    n_p, rho = particle_count(("total", 4000), mat, dom)
    params = SimParams(
        dt=1.0,
        n_cap=int(n_p * 1.5),
        inj_cap=1 << 8,
        evt_cap=1 << 12,  # generous: no frozen-event leftovers near the wall
        particle_density=rho,
        n_active_modes=mat.n_active_modes,
        t_reference=300.0,
    )
    geo = build_device_geometry(dom)
    btab = build_boundary_tables(mat, dom)
    rtab = build_reservoir_tables(mat, dom, params.dt, rho)
    state = init_state(mat, dom, geo, params, n_p, temp_dist="mean", seed=7)
    run = build_step(geo, mat.device_tables(), btab, rtab, params, n_inner=5)
    state, out0 = run(state)
    np0 = np.asarray(out0.Np_sv)
    for _ in range(4):
        state, out = run(state)
    assert int(np.asarray(state.frozen)) == 0
    assert np.array_equal(np.asarray(out.Np_sv), np0)
