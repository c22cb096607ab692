"""Device ray casting: time of flight to the next boundary.

TPU-native replacement for the reference's all-pairs plane-intersection ray
cast (classes/Mesh.py:806-856, chunked at 1e6 particles in
classes/Population.py:797-830). Three paths, chosen statically per geometry:

  1. axis-aligned box: per-axis slab arithmetic — ~6 fused (N,) ops, no
     triangles at all (the flagship film/box configurations),
  2. small meshes (F <= UNROLL_MAX): the triangle loop is unrolled into (N,)
     vector ops with a running minimum — keeps the lane dimension full
     instead of wasting a (N, F~12) minor axis,
  3. large meshes on TPU: the Pallas chunked plane-solve kernel with a
     per-chunk bounding-box prefilter (ops/raycast_pallas.py — the
     reference prefilters by bbox too, classes/Mesh.py:828-831),
  4. large meshes on CPU / beyond the kernel's chunk cap: broadcast (N, F)
     Moller-Trumbore, scanned in 256-triangle chunks.

Returns (t_hit in ps [inf if none], facet id [-1 if none]).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nanokappa_tpu.geometry.device import DeviceGeometry

_EPS_DET = 1e-12
_BARY_TOL = 1e-5
# Accept slightly NEGATIVE flight times (clamped to 0 by callers): f32
# round-off can land a particle a hair outside a corner, where the only
# outward-blocking facet is "behind" it by ~1e-3 A. Without this the ray cast
# reports no boundary and the particle is quarantined (the TPU's fused f32
# rounding hits this ~600x more often than CPU XLA at 1e6 particles).
_T_BACK = -1e-4  # ps
UNROLL_MAX = 32


def raycast(
    geo: DeviceGeometry,
    pos: jax.Array,  # (N,3)
    vel: jax.Array,  # (N,3) group velocity, A/ps
    exclude_facet: jax.Array,  # (N,) i32 facet to ignore (-1 = none)
):
    if geo.is_box:
        return _raycast_box(geo, pos, vel, exclude_facet)
    if geo.tri_origin.shape[0] <= UNROLL_MAX:
        return _raycast_unrolled(geo, pos, vel, exclude_facet)
    if geo.tri_origin.shape[0] > _CHUNK_F and jax.default_backend() != "cpu":
        from nanokappa_tpu.ops.raycast_pallas import (
            pallas_eligible, raycast_pallas,
        )

        if pallas_eligible(geo):
            return raycast_pallas(geo, pos, vel, exclude_facet)
    return _raycast_broadcast(geo, pos, vel, exclude_facet)


def _raycast_box(geo, pos, vel, exclude_facet):
    """Slab test: facet f is plane x[axis] = plane with outward sign s;
    a particle hits it when moving toward it, at t = (plane - x)/v."""
    best_t = jnp.full(pos.shape[0], jnp.inf, dtype=pos.dtype)
    best_f = jnp.full(pos.shape[0], -1, dtype=jnp.int32)
    axis = np.asarray(geo.box_axis)
    sign = np.asarray(geo.box_sign)
    plane = np.asarray(geo.box_plane)
    for f in range(geo.n_facets):
        a = int(axis[f])
        v = vel[:, a]
        toward = v * sign[f] > 0.0
        t_raw = (plane[f] - pos[:, a]) / jnp.where(jnp.abs(v) > 1e-30, v, 1e-30)
        t = jnp.maximum(t_raw, 0.0)
        ok = (
            toward & (t_raw > _T_BACK) & (t < best_t) & (exclude_facet != f)
        )
        best_t = jnp.where(ok, t, best_t)
        best_f = jnp.where(ok, f, best_f)
    return best_t, best_f


def _raycast_unrolled(geo, pos, vel, exclude_facet):
    tri_o = np.asarray(geo.tri_origin)
    tri_e1 = np.asarray(geo.tri_e1)
    tri_e2 = np.asarray(geo.tri_e2)
    tfac = np.asarray(geo.tri_facet)
    best_t = jnp.full(pos.shape[0], jnp.inf, dtype=pos.dtype)
    best_f = jnp.full(pos.shape[0], -1, dtype=jnp.int32)
    for f in range(tri_o.shape[0]):
        a, e1, e2 = tri_o[f], tri_e1[f], tri_e2[f]
        h = jnp.cross(vel, e2[None, :])  # (N,3)
        det = h @ e1
        inv = jnp.where(jnp.abs(det) > _EPS_DET, 1.0 / det, 0.0)
        s = pos - a[None, :]
        u = jnp.einsum("nj,nj->n", s, h) * inv
        q = jnp.cross(s, e1[None, :])
        w = jnp.einsum("nj,nj->n", vel, q) * inv
        t_raw = (q @ e2) * inv
        t = jnp.maximum(t_raw, 0.0)
        ok = (
            (jnp.abs(det) > _EPS_DET)
            & (u >= -_BARY_TOL)
            & (w >= -_BARY_TOL)
            & (u + w <= 1.0 + _BARY_TOL)
            & (t_raw > _T_BACK)
            & (exclude_facet != int(tfac[f]))
            & (t < best_t)
        )
        best_t = jnp.where(ok, t, best_t)
        best_f = jnp.where(ok, int(tfac[f]), best_f)
    return best_t, best_f


_CHUNK_F = 256  # triangle-chunk width for large meshes: bounds the (N, F)
#   broadcast at (N, 256) regardless of triangle count (imported STLs can
#   carry thousands of triangles; an un-chunked (N, F, 3) would not fit)


def _raycast_chunk(pos, vel, exclude_facet, a, e1, e2, tfac):
    """(N, c) Moller-Trumbore against one triangle chunk; returns (t, facet)
    of the nearest valid hit within the chunk."""
    h = jnp.cross(vel[:, None, :], e2[None, :, :])  # (N,c,3)
    det = jnp.einsum("fj,nfj->nf", e1, h)  # (N,c)
    inv = jnp.where(jnp.abs(det) > _EPS_DET, 1.0 / det, 0.0)
    s = pos[:, None, :] - a[None, :, :]
    u = jnp.einsum("nfj,nfj->nf", s, h) * inv
    q = jnp.cross(s, e1[None, :, :])
    w = jnp.einsum("nj,nfj->nf", vel, q) * inv
    t = jnp.einsum("fj,nfj->nf", e2, q) * inv

    t = jnp.where(t > _T_BACK, jnp.maximum(t, 0.0), -jnp.inf)
    valid = (
        (jnp.abs(det) > _EPS_DET)
        & (u >= -_BARY_TOL)
        & (w >= -_BARY_TOL)
        & (u + w <= 1.0 + _BARY_TOL)
        & (t >= 0.0)
        & (tfac[None, :] != exclude_facet[:, None])
        & (tfac[None, :] >= 0)  # padding triangles carry facet -1
    )
    t = jnp.where(valid, t, jnp.inf)
    tri_hit = jnp.argmin(t, axis=1)
    t_hit = jnp.take_along_axis(t, tri_hit[:, None], axis=1)[:, 0]
    facet = jnp.where(jnp.isfinite(t_hit), tfac[tri_hit], -1).astype(jnp.int32)
    return t_hit, facet


def _raycast_broadcast(geo, pos, vel, exclude_facet):
    F = geo.tri_origin.shape[0]
    if F <= _CHUNK_F:
        return _raycast_chunk(
            pos, vel, exclude_facet,
            geo.tri_origin, geo.tri_e1, geo.tri_e2, geo.tri_facet,
        )
    # large mesh: scan triangle chunks with a running minimum, so memory
    # stays (N, _CHUNK_F) however many triangles the import carries
    n_pad = -(-F // _CHUNK_F) * _CHUNK_F
    pad = n_pad - F

    def pad0(x):
        width = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        return jnp.pad(x, width)

    a = pad0(geo.tri_origin).reshape(-1, _CHUNK_F, 3)
    e1 = pad0(geo.tri_e1).reshape(-1, _CHUNK_F, 3)
    e2 = pad0(geo.tri_e2).reshape(-1, _CHUNK_F, 3)
    tfac = jnp.pad(
        geo.tri_facet, (0, pad), constant_values=-1
    ).reshape(-1, _CHUNK_F)

    def body(carry, chunk):
        best_t, best_f = carry
        ca, ce1, ce2, ctf = chunk
        t, f = _raycast_chunk(pos, vel, exclude_facet, ca, ce1, ce2, ctf)
        closer = t < best_t
        return (
            jnp.where(closer, t, best_t),
            jnp.where(closer, f, best_f),
        ), None

    init = (
        jnp.full(pos.shape[0], jnp.inf, dtype=pos.dtype),
        jnp.full(pos.shape[0], -1, dtype=jnp.int32),
    )
    (t_hit, facet), _ = jax.lax.scan(body, init, (a, e1, e2, tfac))
    return t_hit, facet
