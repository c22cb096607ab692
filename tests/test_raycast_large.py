"""Chunked ray cast for large imported meshes (> _CHUNK_F triangles)."""

import numpy as np
import jax.numpy as jnp

from nanokappa_tpu.geometry.domain import build_domain
from nanokappa_tpu.geometry.device import build_device_geometry
from nanokappa_tpu.ops import raycast as rc
from nanokappa_tpu.ops.raycast_pallas import pallas_eligible, raycast_pallas


def test_chunked_raycast_matches_single_chunk():
    """A finely tessellated cylinder (>256 triangles) exercises the scan
    path; hits must match the geometric answer and the one-chunk kernel."""
    dom = build_domain(
        geometry="cylinder",
        dimensions=(2e3, 400.0, 96),  # 96 side facets -> 4*96 = 384 tris
        subvolumes=("slice", 4, 2),
        bound_pos=("relative", 0.5, 0.5, -0.1),
        bound_cond=("P", "R"),
        bound_values=(0.0,),
        connect_pos=("relative", 0.5, 0.5, -0.1, 0.5, 0.5, 1.1),
    )
    geo = build_device_geometry(dom)
    assert geo.tri_origin.shape[0] > rc._CHUNK_F

    rng = np.random.default_rng(0)
    n = 512
    center = dom.mesh.center_mass
    pos = jnp.asarray(np.tile(center, (n, 1)), dtype=jnp.float32)
    theta = rng.uniform(0, 2 * np.pi, n)
    vel = jnp.asarray(
        np.stack([np.cos(theta), np.sin(theta), np.zeros(n)], axis=1) * 50.0,
        dtype=jnp.float32,
    )
    excl = jnp.full(n, -1, jnp.int32)

    t_chunked, f_chunked = rc._raycast_broadcast(geo, pos, vel, excl)
    t_direct, f_direct = rc._raycast_chunk(
        pos, vel, excl, geo.tri_origin, geo.tri_e1, geo.tri_e2, geo.tri_facet
    )
    np.testing.assert_array_equal(np.asarray(f_chunked), np.asarray(f_direct))
    np.testing.assert_allclose(
        np.asarray(t_chunked), np.asarray(t_direct), rtol=1e-6
    )
    # radial rays from the axis hit the wall at ~r/|v| (polygon apothem to
    # circumradius band)
    t = np.asarray(t_chunked)
    assert np.all(t > 0) and np.all(np.isfinite(t))
    apothem = 400.0 * np.cos(np.pi / 96)
    assert np.all(t * 50.0 >= apothem - 1e-2)
    assert np.all(t * 50.0 <= 400.0 + 1e-2)
    assert np.all(np.asarray(f_chunked) >= 0)


def _wire_geo(n_side=96):
    dom = build_domain(
        geometry="cylinder",
        dimensions=(2e3, 400.0, n_side),
        subvolumes=("slice", 4, 2),
        bound_pos=("relative", 0.5, 0.5, -0.1),
        bound_cond=("P", "R"),
        bound_values=(0.0,),
        connect_pos=("relative", 0.5, 0.5, -0.1, 0.5, 0.5, 1.1),
    )
    return dom, build_device_geometry(dom)


def test_pallas_raycast_matches_broadcast():
    """The Pallas bbox-prefiltered kernel (interpret mode on CPU) must agree
    with the XLA broadcast path on a finely tessellated cylinder: same
    facet, same flight time to f32 noise — including excluded-facet rays
    (a recast from a wall) and rays with zero velocity components."""
    dom, geo = _wire_geo(96)
    assert pallas_eligible(geo)

    rng = np.random.default_rng(7)
    n = 700  # deliberately not a BP multiple: exercises the pad tail
    lo, hi = np.asarray(dom.mesh.bounds)
    pos = rng.uniform(lo + 1.0, hi - 1.0, (n, 3))
    # keep only interior points (cylinder, not bbox): radial check, axis z
    r = np.linalg.norm(pos[:, :2] - dom.mesh.center_mass[:2], axis=1)
    pos[r > 350.0, :2] = dom.mesh.center_mass[:2]
    vel = rng.normal(0, 40.0, (n, 3))
    vel[:10, 2] = 0.0  # purely radial rays (zero axial component)
    vel[10:20, :2] = 0.0  # purely axial rays
    pos32 = jnp.asarray(pos, jnp.float32)
    vel32 = jnp.asarray(vel, jnp.float32)
    excl = np.full(n, -1, np.int32)
    excl[30:60] = 1  # recast-style exclusions
    excl = jnp.asarray(excl)

    t_ref, f_ref = rc._raycast_broadcast(geo, pos32, vel32, excl)
    t_pal, f_pal = raycast_pallas(geo, pos32, vel32, excl, interpret=True)

    t_ref, f_ref = np.asarray(t_ref), np.asarray(f_ref)
    t_pal, f_pal = np.asarray(t_pal), np.asarray(f_pal)
    # the two formulations (Moller-Trumbore vs plane-solve + dual basis)
    # round differently at triangle borders; hits at an edge shared by two
    # coplanar faces of one facet may differ in triangle but not in facet
    hit = np.isfinite(t_ref) | np.isfinite(t_pal)
    agree = f_ref == f_pal
    assert agree[hit].mean() > 0.995, (hit.sum(), (~agree & hit).sum())
    both = np.isfinite(t_ref) & np.isfinite(t_pal) & agree
    np.testing.assert_allclose(t_pal[both], t_ref[both], rtol=2e-4, atol=1e-4)
    assert np.isfinite(t_pal).all()  # interior rays always hit the wall
