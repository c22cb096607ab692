"""DeviceGeometry: frozen SoA geometry arrays for the fused device step.

Everything the per-timestep XLA program needs from the domain: triangle soup
for ray casting, per-facet boundary-condition codes/values, periodic
translations (reference classes/Population.py:1463-1489), reservoir facet
surface-sampling tables, and subvolume centres for binning.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from nanokappa_tpu.geometry.domain import BC, Domain


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DeviceGeometry:
    # triangle soup (F triangles)
    tri_origin: jax.Array  # (F,3)
    tri_e1: jax.Array  # (F,3)
    tri_e2: jax.Array  # (F,3)
    tri_facet: jax.Array  # (F,) i32

    # per-facet data (NF facets)
    facet_normal: jax.Array  # (NF,3) outward unit normals
    facet_bc: jax.Array  # (NF,) i32 BC enum
    facet_value: jax.Array  # (NF,) f32 (reservoir T or roughness eta)
    facet_res: jax.Array  # (NF,) i32 reservoir index or -1
    facet_rough: jax.Array  # (NF,) i32 rough-facet index or -1
    periodic_shift: jax.Array  # (NF,3) translation to the paired facet
    periodic_pair: jax.Array  # (NF,) i32 paired facet id (-1 if none)

    # reservoir surface sampling: padded triangle tables per reservoir
    res_tri_idx: jax.Array  # (R,K) i32 triangle ids (padded with first id)
    res_tri_cdf: jax.Array  # (R,K) f32 cumulative area fraction (last = 1)
    res_facet: jax.Array  # (R,) i32 facet id of each reservoir
    res_temperature: jax.Array  # (R,) f32
    res_area: jax.Array  # (R,) f32
    res_normal: jax.Array  # (R,3) outward normal of each reservoir facet
    res_rect: jax.Array  # (R,9) [origin, span1, span2] rectangle
    #   parameterisation of each reservoir facet (box domains only; (0,9)
    #   otherwise): position sampling becomes origin + u1*s1 + u2*s2 — one
    #   tiny-row gather instead of the triangle-CDF inversion + three
    #   triangle-table gathers (distribution identical: the facet IS the
    #   rectangle)

    # subvolumes
    subvol_center: jax.Array  # (SV,3)
    subvol_volume: jax.Array  # (SV,)
    bounds: jax.Array  # (2,3)

    # axis-aligned-box fast path (empty arrays when not a box)
    box_axis: jax.Array  # (NF,) i32 axis of each facet plane
    box_sign: jax.Array  # (NF,) f32 outward direction sign
    box_plane: jax.Array  # (NF,) f32 plane coordinate

    n_facets: int = field(metadata=dict(static=True))
    n_reservoirs: int = field(metadata=dict(static=True))
    n_rough: int = field(metadata=dict(static=True))
    n_subvols: int = field(metadata=dict(static=True))
    subvol_type: str = field(metadata=dict(static=True))
    slice_axis: int = field(metadata=dict(static=True))
    volume: float = field(metadata=dict(static=True))
    is_box: bool = field(metadata=dict(static=True), default=False)


def build_device_geometry(domain: Domain, dtype=jnp.float32) -> DeviceGeometry:
    mesh = domain.mesh
    nf = mesh.n_facets

    tri = mesh.tri
    tri_origin = tri[:, 0]
    tri_e1 = tri[:, 1] - tri[:, 0]
    tri_e2 = tri[:, 2] - tri[:, 0]

    facet_res = np.full(nf, -1, dtype=np.int32)
    facet_res[domain.res_facets] = np.arange(len(domain.res_facets))
    facet_rough = np.full(nf, -1, dtype=np.int32)
    facet_rough[domain.rough_facets] = np.arange(len(domain.rough_facets))

    shifts = np.zeros((nf, 3))
    pairs = np.full(nf, -1, dtype=np.int32)
    for a, b in domain.connected_facets:
        shifts[a] = mesh.facet_centroids[b] - mesh.facet_centroids[a]
        shifts[b] = mesh.facet_centroids[a] - mesh.facet_centroids[b]
        pairs[a], pairs[b] = b, a

    # reservoir triangle tables
    R = len(domain.res_facets)
    if R > 0:
        K = max(len(mesh.facets[f]) for f in domain.res_facets)
        res_tri_idx = np.zeros((R, K), dtype=np.int32)
        res_tri_cdf = np.ones((R, K))
        for i, f in enumerate(domain.res_facets):
            fs = mesh.facets[f]
            res_tri_idx[i, : len(fs)] = fs
            res_tri_idx[i, len(fs) :] = fs[0]
            cdf = np.cumsum(mesh.face_areas[fs])
            cdf = cdf / cdf[-1]
            res_tri_cdf[i, : len(fs)] = cdf
    else:
        res_tri_idx = np.zeros((0, 1), dtype=np.int32)
        res_tri_cdf = np.ones((0, 1))

    # axis-aligned-box detection: 6 facets whose normals are +-e_i and whose
    # triangles all lie on the facet plane -> collision times become per-axis
    # slab arithmetic instead of triangle intersection
    is_box = False
    box_axis = np.zeros(nf, dtype=np.int32)
    box_sign = np.zeros(nf)
    box_plane = np.zeros(nf)
    if nf == 6:
        is_box = True
        for f in range(6):
            n = mesh.facet_normals[f]
            ax = int(np.argmax(np.abs(n)))
            if abs(abs(n[ax]) - 1.0) > 1e-9 or np.abs(np.delete(n, ax)).max() > 1e-9:
                is_box = False
                break
            pts = mesh.tri[mesh.facets[f]].reshape(-1, 3)
            if np.ptp(pts[:, ax]) > 1e-6:
                is_box = False
                break
            box_axis[f] = ax
            box_sign[f] = np.sign(n[ax])
            box_plane[f] = pts[0, ax]

    # rectangle parameterisation of reservoir facets (box walls are exact
    # rectangles: uniform (u1, u2) over [origin, origin+s1, origin+s2] is the
    # same uniform-on-facet distribution as the triangle-CDF sampler)
    if is_box and R > 0:
        res_rect = np.zeros((R, 9))
        for i, f in enumerate(domain.res_facets):
            pts = mesh.tri[mesh.facets[f]].reshape(-1, 3)
            ax = int(box_axis[f])
            a1, a2 = [a for a in range(3) if a != ax]
            lo, hi = pts.min(axis=0), pts.max(axis=0)
            s1 = np.zeros(3)
            s1[a1] = hi[a1] - lo[a1]
            s2 = np.zeros(3)
            s2[a2] = hi[a2] - lo[a2]
            res_rect[i] = np.concatenate([lo, s1, s2])
    else:
        res_rect = np.zeros((0, 9))

    return DeviceGeometry(
        tri_origin=jnp.asarray(tri_origin, dtype=dtype),
        tri_e1=jnp.asarray(tri_e1, dtype=dtype),
        tri_e2=jnp.asarray(tri_e2, dtype=dtype),
        tri_facet=jnp.asarray(mesh.face_facet, dtype=jnp.int32),
        facet_normal=jnp.asarray(mesh.facet_normals, dtype=dtype),
        facet_bc=jnp.asarray(domain.bound_cond, dtype=jnp.int32),
        facet_value=jnp.asarray(np.nan_to_num(domain.facet_values), dtype=dtype),
        facet_res=jnp.asarray(facet_res),
        facet_rough=jnp.asarray(facet_rough),
        periodic_shift=jnp.asarray(shifts, dtype=dtype),
        periodic_pair=jnp.asarray(pairs),
        res_tri_idx=jnp.asarray(res_tri_idx),
        res_tri_cdf=jnp.asarray(res_tri_cdf, dtype=dtype),
        res_facet=jnp.asarray(domain.res_facets, dtype=jnp.int32),
        res_temperature=jnp.asarray(
            np.nan_to_num(domain.res_values), dtype=dtype
        ),
        res_area=jnp.asarray(
            mesh.facet_areas[domain.res_facets], dtype=dtype
        ),
        res_normal=jnp.asarray(
            mesh.facet_normals[domain.res_facets], dtype=dtype
        ),
        res_rect=jnp.asarray(res_rect, dtype=dtype),
        box_axis=jnp.asarray(box_axis),
        box_sign=jnp.asarray(box_sign, dtype=dtype),
        box_plane=jnp.asarray(box_plane, dtype=dtype),
        subvol_center=jnp.asarray(domain.subvol_center, dtype=dtype),
        subvol_volume=jnp.asarray(domain.subvol_volume, dtype=dtype),
        bounds=jnp.asarray(mesh.bounds, dtype=dtype),
        n_facets=nf,
        n_reservoirs=R,
        n_rough=len(domain.rough_facets),
        n_subvols=domain.n_of_subvols,
        subvol_type=domain.subvol_type,
        slice_axis=domain.slice_axis,
        volume=float(mesh.volume),
        is_box=is_box,
    )
