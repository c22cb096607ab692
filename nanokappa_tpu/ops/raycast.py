"""Device ray casting: particles x triangles Moller-Trumbore.

TPU-native replacement for the reference's all-pairs plane-intersection
ray cast (classes/Mesh.py:806-856, chunked at 1e6 particles in
classes/Population.py:797-830). The XLA formulation below broadcasts
(N, F) and lets the compiler fuse/tile; a Pallas kernel with bounding-box
prefilter takes over for large F (imported STL geometries).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nanokappa_tpu.geometry.device import DeviceGeometry

_EPS_DET = 1e-12
_BARY_TOL = 1e-5
_T_MIN = 1e-9  # minimum flight time (ps) to accept a hit: avoids re-hitting
#               the surface the particle is standing on


def raycast(
    geo: DeviceGeometry,
    pos: jax.Array,  # (N,3)
    vel: jax.Array,  # (N,3) group velocity (direction + magnitude), A/ps
    exclude_facet: jax.Array,  # (N,) i32 facet to ignore (-1 = none)
):
    """Time of flight to the next boundary.

    Returns (t_hit (N,) in ps [inf if none], facet (N,) i32 [-1 if none]).
    The collision position is pos + vel * t_hit (recomputed by callers; not
    materialised here to keep state small).
    """
    a = geo.tri_origin  # (F,3)
    e1 = geo.tri_e1
    e2 = geo.tri_e2

    h = jnp.cross(vel[:, None, :], e2[None, :, :])  # (N,F,3)
    det = jnp.einsum("fj,nfj->nf", e1, h)  # (N,F)
    inv = jnp.where(jnp.abs(det) > _EPS_DET, 1.0 / det, 0.0)
    s = pos[:, None, :] - a[None, :, :]  # (N,F,3)
    u = jnp.einsum("nfj,nfj->nf", s, h) * inv
    q = jnp.cross(s, e1[None, :, :])
    w = jnp.einsum("nj,nfj->nf", vel, q) * inv
    t = jnp.einsum("fj,nfj->nf", e2, q) * inv

    valid = (
        (jnp.abs(det) > _EPS_DET)
        & (u >= -_BARY_TOL)
        & (w >= -_BARY_TOL)
        & (u + w <= 1.0 + _BARY_TOL)
        & (t > _T_MIN)
        & (geo.tri_facet[None, :] != exclude_facet[:, None])
    )
    t = jnp.where(valid, t, jnp.inf)
    tri_hit = jnp.argmin(t, axis=1)
    t_hit = jnp.take_along_axis(t, tri_hit[:, None], axis=1)[:, 0]
    facet = jnp.where(
        jnp.isfinite(t_hit), geo.tri_facet[tri_hit], -1
    ).astype(jnp.int32)
    return t_hit, facet
