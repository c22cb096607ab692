"""Chunked ray cast for large imported meshes (> _CHUNK_F triangles)."""

import numpy as np
import jax.numpy as jnp

from nanokappa_tpu.geometry.domain import build_domain
from nanokappa_tpu.geometry.device import build_device_geometry
from nanokappa_tpu.ops import raycast as rc


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
