"""Geometry engine tests: primitives, mesh queries, STL round trip, domains."""

import numpy as np
import pytest

from nanokappa_tpu.geometry.mesh import TriMesh
from nanokappa_tpu.geometry.primitives import make_primitive
from nanokappa_tpu.geometry.stl import load_stl, save_stl
from nanokappa_tpu.geometry.domain import build_domain, BC


ALL_SHAPES = {
    "box": (5e3, 1e3, 1e3),
    "cylinder": (5e3, 500.0, 24),
    "zigzag": (1e3, 500.0, 200.0, 0.0, 16, 5),
    "corrugated": (1e3, 600.0, 400.0, 16, 6),
    "castle": (1e3, 500.0, 600.0, 400.0, 16, 6, 1),
    "star": (5e3, 600.0, 300.0, 6),
    "freewire": (500.0, 1e3, 300.0, 1e3, 500.0, 16),
}


@pytest.mark.parametrize("shape", sorted(ALL_SHAPES))
def test_primitive_well_formed(shape):
    mesh = make_primitive(shape, ALL_SHAPES[shape])
    # closed, positively oriented, watertight volume
    assert mesh.volume > 0
    # Euler characteristic of a closed genus-0 surface: V - E + F = 2
    edges = set()
    for f in mesh.faces:
        for k in range(3):
            e = tuple(sorted((f[k], f[(k + 1) % 3])))
            edges.add(e)
    assert len(mesh.vertices) - len(edges) + len(mesh.faces) == 2
    # outward normals: centroid is inside, normals point away
    c = mesh.center_mass
    assert mesh.contains(c[None])[0]
    # every face normal has positive component away from the center-of-mass
    # along at least the mean sense (weak check for non-convex shapes)
    d = np.einsum("ij,ij->i", mesh.face_normals, mesh.face_centroids - c)
    assert (d > -1e-6).mean() > 0.6


def test_cylinder_volume_area():
    L, R, N = 5e3, 500.0, 256
    mesh = make_primitive("cylinder", (L, R, N))
    exact = np.pi * R**2 * L
    # polygonal prism volume: exact for the inscribed polygon
    poly = 0.5 * N * R**2 * np.sin(2 * np.pi / N) * L
    assert mesh.volume == pytest.approx(poly, rel=1e-6)
    assert mesh.volume == pytest.approx(exact, rel=1e-3)


def test_contains_and_sampling():
    mesh = make_primitive("corrugated", ALL_SHAPES["corrugated"])
    rng = np.random.default_rng(0)
    pts = mesh.sample_volume(2000, rng)
    assert np.all(mesh.contains(pts))
    # samples outside the inner radius at a waist must not appear
    # (z near odd multiples of L -> radius r=400)
    z = pts[:, 2]
    rad = np.linalg.norm(pts[:, :2] - mesh.center_mass[None, :2], axis=1)
    near_waist = np.abs(z - 1e3) < 20
    if near_waist.any():
        assert rad[near_waist].max() < 450


def test_stl_roundtrip(tmp_path):
    mesh = make_primitive("box", (5e3, 1e3, 1e3))
    path = str(tmp_path / "box.stl")
    save_stl(mesh, path)
    mesh2 = load_stl(path)
    assert mesh2.volume == pytest.approx(mesh.volume, rel=1e-6)
    assert mesh2.n_facets == 6


def test_domain_from_stl(tmp_path):
    mesh = make_primitive("box", (5e3, 1e3, 1e3))
    path = str(tmp_path / "box.stl")
    save_stl(mesh, path)
    dom = build_domain(
        geometry=path,
        subvolumes=("slice", 5, 0),
        bound_pos=("relative", -0.1, 0.5, 0.5, 1.1, 0.5, 0.5),
        bound_cond=("T", "T", "R"),
        bound_values=(310.0, 290.0, 10.0),
        connect_pos=("relative",),
    )
    assert dom.n_of_reservoirs == 2
    assert len(dom.rough_facets) == 4
    assert np.allclose(dom.facet_values[dom.rough_facets], 10.0)


def test_cylinder_domain_rough_walls():
    """Nanowire setup: periodic axial BC + rough side wall."""
    dom = build_domain(
        geometry="cylinder",
        dimensions=(5e3, 500.0, 24),
        subvolumes=("slice", 5, 2),
        bound_pos=("relative", 0.5, 0.5, -0.1),
        bound_cond=("P", "R"),
        bound_values=(5.0,),
        connect_pos=("relative", 0.5, 0.5, -0.1, 0.5, 0.5, 1.1),
    )
    assert (dom.bound_cond == BC.PERIODIC).sum() == 2
    # all lateral facets rough with eta=5
    rough = dom.rough_facets
    assert len(rough) == 24
    assert np.allclose(dom.facet_values[rough], 5.0)


def test_voronoi_and_grid_subvolumes():
    dom_g = build_domain(
        geometry="box",
        dimensions=(2e3, 2e3, 1e3),
        subvolumes=("grid", 3, 3, 2),
        bound_pos=("relative", -0.1, 0.5, 0.5),
        bound_cond=("T", "R"),
        bound_values=(300.0, 0.0),
        connect_pos=("relative",),
    )
    assert dom_g.n_of_subvols == 18
    assert dom_g.subvol_volume.sum() == pytest.approx(dom_g.volume, rel=0.05)
    assert len(dom_g.subvol_connections) > 0

    dom_v = build_domain(
        geometry="box",
        dimensions=(2e3, 1e3, 1e3),
        subvolumes=("voronoi", 6),
        bound_pos=("relative", -0.1, 0.5, 0.5),
        bound_cond=("T", "R"),
        bound_values=(300.0, 0.0),
        connect_pos=("relative",),
    )
    assert dom_v.n_of_subvols == 6
    assert dom_v.subvol_volume.sum() == pytest.approx(dom_v.volume, rel=0.05)


def test_simplex_volume_sampling():
    """Delaunay-simplex interior sampling (reference sample_volume,
    classes/Mesh.py:890-904): O(n) for sparse shapes, uniform, always inside."""
    rng = np.random.default_rng(11)
    # sparse non-convex solid: tetra path engages and samples stay inside
    m = make_primitive("freewire", ALL_SHAPES["freewire"])
    pts = m.sample_volume(4000, rng)
    assert m._tetrahedra() is not None
    assert m.contains(pts).all()
    # uniformity on a box: mean at centre, per-axis std = L/sqrt(12)
    box = make_primitive("box", (1000.0, 500.0, 250.0))
    pts = box.sample_volume(40000, rng)
    np.testing.assert_allclose(pts.mean(0), [500, 250, 125], rtol=0.02)
    np.testing.assert_allclose(
        pts.std(0), np.array([1000, 500, 250]) / np.sqrt(12), rtol=0.03
    )
    # pathological concave fit falls back to rejection and still works
    star = make_primitive("star", ALL_SHAPES["star"])
    pts = star.sample_volume(500, rng)
    assert star.contains(pts).all()


def test_qmc_subvol_volume_matches_mc():
    """Sobol QMC volume sampling (reference qmc algorithm,
    classes/Geometry.py:554-599) agrees with plain MC on a non-box solid."""
    from nanokappa_tpu.geometry.domain import _mc_subvol_volume
    from nanokappa_tpu.geometry.primitives import make_primitive

    mesh = make_primitive("cylinder", (2e3, 500.0, 16))
    centers = np.tile(mesh.center_mass, (4, 1))
    centers[:, 2] = (np.arange(4) + 0.5) / 4 * np.ptp(mesh.bounds[:, 2])
    rng = np.random.default_rng(5)
    v_mc = _mc_subvol_volume(mesh, centers, rng, algorithm="mc")
    v_qmc = _mc_subvol_volume(mesh, centers, np.random.default_rng(5), algorithm="qmc")
    assert v_qmc.sum() == pytest.approx(mesh.volume, rel=0.02)
    np.testing.assert_allclose(v_qmc, v_mc, rtol=0.05)
    # equal slices of the cylinder
    np.testing.assert_allclose(v_qmc, mesh.volume / 4, rtol=0.05)


def test_volume_algo_wired_through_domain_and_cli():
    """--subvol_volume_algo reaches _mc_subvol_volume (ADVICE round 2: the
    qmc branch must be selectable, not dead code)."""
    from nanokappa_tpu.io.config import read_args

    dom = build_domain(
        geometry="cylinder",
        dimensions=(2e3, 500.0, 16),
        subvolumes=("slice", 4, 2),
        bound_pos=("relative", 0.5, 0.5, -0.1),
        bound_cond=("T", "R"),
        bound_values=(300.0, 0.0),
        connect_pos=("relative",),
        volume_algo="qmc",
    )
    np.testing.assert_allclose(
        dom.subvol_volume, dom.mesh.volume / 4, rtol=0.05
    )
    with pytest.raises(ValueError, match="volume algorithm"):
        build_domain(geometry="box", volume_algo="nope")

    args = read_args(
        ["--poscar_file", "p", "--hdf_file", "h",
         "--subvol_volume_algo", "qmc"]
    )
    assert args.subvol_volume_algo == ["qmc"]


def test_grid_degenerates_to_slice():
    dom = build_domain(
        geometry="box",
        dimensions=(2e3, 1e3, 1e3),
        subvolumes=("grid", 5, 1, 1),
        bound_pos=("relative", -0.1, 0.5, 0.5),
        bound_cond=("T", "R"),
        bound_values=(300.0, 0.0),
        connect_pos=("relative",),
    )
    assert dom.subvol_type == "slice"
    assert dom.n_of_subvols == 5
