"""Pallas large-mesh ray cast: chunked plane-solve + dual-basis barycentric
with a per-chunk bounding-box prefilter.

TPU-native successor of ops/raycast.py's broadcast XLA path for imported
STLs / finely tessellated primitives (> _CHUNK_F triangles). Semantics match
the reference's find_boundary (classes/Mesh.py:806-856): solve the ray-plane
intersection for every (particle, triangle) pair, prefilter by bounding box
(reference :828-831 — here per CHUNK of 128 Morton-ordered triangles, which
skips the math AND the HBM fetch for chunks the whole particle block cannot
hit), accept hits inside the triangle via barycentric coordinates, keep the
nearest. The formulation is MXU-shaped: with the dual edge basis
(T1 = e2 x n / n.n, T2 = n x e1 / n.n) precomputed per triangle, every
per-pair quantity is an (BP, 3) @ (3, BF) matmul followed by elementwise
combines —

    t = (d - x.n) / (v.n)          u = (p - a).T1 = x.T1 + t v.T1 - a.T1
    p = x + t v                    w = (p - a).T2 = x.T2 + t v.T2 - a.T2

Validity matches ops/raycast.py's broadcast path bit-for-bit in structure:
|v.n| > _EPS_DET (v.n == -det of Moller-Trumbore), u, w >= -_BARY_TOL,
u + w <= 1 + _BARY_TOL, t_raw > _T_BACK (clamped to 0), excluded/padding
facets rejected.

Memory plan: the triangle table stays in HBM (no VMEM cap on mesh size up to
_NC_MAX chunks); per-chunk AABBs ride as a scalar-prefetch SMEM table; each
particle block DMAs ONLY the chunks whose AABB its rays can reach. Morton
ordering of triangle centroids keeps chunks spatially tight, so typical
blocks touch a few chunks of a big mesh.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BP = 1024  # particles per block (lane budget of the (BP, BF) pair tiles)
BF = 128  # triangles per chunk (one lane row)
_NC_MAX = 512  # chunk cap: 16 * _NC_MAX * 4 B = 32 KB of SMEM for the
#   AABB/frame table (64k triangles; beyond that ops/raycast.py's XLA scan
#   path takes over)
_EPS_DET = 1e-12
_BARY_TOL = 1e-4  # wider than ops/raycast.py's 1e-5: the f32 plane-solve
#   rounds differently from Moller-Trumbore at shared edges, and a ray
#   falling in the tolerance gap BETWEEN two adjacent triangles reports no
#   boundary (quarantined lane). Overlapping acceptance is harmless — the
#   nearest-t tie-break picks one of the two coincident edge hits.
_T_BACK = -1e-4  # ps; see ops/raycast.py
_BIG_F = np.int32(2**30)


def _morton(x: np.ndarray) -> np.ndarray:
    """Morton (Z-order) codes of points normalised to a 1024^3 grid —
    spatial sort key so consecutive triangles land in the same chunk."""
    lo, hi = x.min(axis=0), x.max(axis=0)
    q = ((x - lo) / np.maximum(hi - lo, 1e-30) * 1023).astype(np.uint64)

    def spread(v):
        v &= 0x3FF
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return (
        spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    )


def _prep(geo):
    """Host-side table build (cached on the DeviceGeometry instance):
    Morton-sort triangles, pad to a BF multiple with degenerate rows,
    pack the (16, Fp) kernel table and the (8, nc) chunk-AABB table."""
    cached = getattr(geo, "_pallas_cast", None)
    if cached is not None:
        return cached

    o = np.asarray(geo.tri_origin, dtype=np.float64)
    e1 = np.asarray(geo.tri_e1, dtype=np.float64)
    e2 = np.asarray(geo.tri_e2, dtype=np.float64)
    tf = np.asarray(geo.tri_facet, dtype=np.int32)
    F = o.shape[0]

    order = np.argsort(_morton(o + (e1 + e2) / 3.0), kind="stable")
    o, e1, e2, tf = o[order], e1[order], e2[order], tf[order]

    Fp = -(-F // BF) * BF
    pad = Fp - F
    if pad:
        o = np.concatenate([o, np.zeros((pad, 3))])
        e1 = np.concatenate([e1, np.zeros((pad, 3))])
        e2 = np.concatenate([e2, np.zeros((pad, 3))])
        tf = np.concatenate([tf, np.full(pad, -1, np.int32)])

    nc = Fp // BF
    verts = np.stack([o, o + e1, o + e2], axis=1).reshape(nc, BF * 3, 3)
    # degenerate padding rows sit at the origin; exclude them from the AABB
    # (padding only exists in the LAST chunk, which holds >= 1 real triangle)
    margin = 1e-3
    bbox = np.zeros((16, nc), np.float32)
    real = np.repeat(tf.reshape(nc, BF) >= 0, 3, axis=1)
    for c in range(nc):
        pts = verts[c][real[c]]
        bbox[0:3, c] = pts.min(axis=0) - margin
        bbox[3:6, c] = pts.max(axis=0) + margin
        # chunk frame origin: the triangle math runs in CHUNK-LOCAL
        # coordinates — plane offsets shrink from ~|domain|*|n| to
        # ~|chunk extent|, which removes the f32 cancellation in
        # (d - x.n) that cost grazing rays their barycentric tolerance
        bbox[6:9, c] = 0.5 * (bbox[0:3, c] + bbox[3:6, c])

    c0 = np.repeat(bbox[6:9].T, BF, axis=0)  # (Fp, 3) per-triangle frame
    o_loc = o - c0
    n = np.cross(e1, e2)
    nrm = np.linalg.norm(n, axis=1, keepdims=True)
    n_hat = np.where(nrm > 0, n / np.maximum(nrm, 1e-300), 0.0)
    # dual edge basis of the UNIT normal: u = (p - a).T1, w = (p - a).T2
    # for p in the plane; unit n keeps every kernel dot product at chunk
    # magnitude
    d1 = np.cross(e2, n_hat)
    d2 = np.cross(n_hat, e1)
    s1 = np.einsum("ij,ij->i", d1, e1)
    s2 = np.einsum("ij,ij->i", d2, e2)
    T1 = d1 * np.where(s1 != 0, 1.0 / np.where(s1 == 0, 1.0, s1), 0.0)[:, None]
    T2 = d2 * np.where(s2 != 0, 1.0 / np.where(s2 == 0, 1.0, s2), 0.0)[:, None]
    tab = np.zeros((16, Fp), np.float32)
    tab[0:3] = T1.T
    tab[3:6] = T2.T
    tab[6:9] = n_hat.T
    tab[9] = np.einsum("ij,ij->i", n_hat, o_loc)
    tab[10] = np.einsum("ij,ij->i", T1, o_loc)
    tab[11] = np.einsum("ij,ij->i", T2, o_loc)
    # facet ids as float VALUES, not bit patterns: small-int f32 bit
    # patterns are denormals that real-hardware data paths flush to zero —
    # the bitcast exclusion column read back 0/garbage on chip, so every
    # reflected lane immediately re-hit its own facet (t = 0) and the
    # event backlog grew without bound. f32 represents ints exactly here.
    tab[12] = tf.astype(np.float32)

    out = (jnp.asarray(bbox), jnp.asarray(tab), nc)
    object.__setattr__(geo, "_pallas_cast", out)
    return out


def _kernel(bbox_ref, tri_hbm, pv_ref, out_ref, chunk, bt_ref, bf_ref, sem,
            *, nc):
    x = pv_ref[:, 0:3]  # (BP, 3)
    v = pv_ref[:, 3:6]
    ei = pv_ref[:, 6:7]  # (BP, 1) excluded facet as float VALUE (see _prep)

    bt_ref[:, :] = jnp.full((BP, 1), jnp.inf, jnp.float32)
    bf_ref[:, :] = jnp.full((BP, 1), -1, jnp.int32)

    # robust slab reciprocal (ops/raycast.py _raycast_box trick): exact-zero
    # velocity components become +-1e-30, which keeps the test conservative
    inv_v = 1.0 / jnp.where(jnp.abs(v) > 1e-30, v, 1e-30)  # (BP, 3)

    def body(c, _):
        # per-lane slab test against chunk c's AABB (6 SMEM scalars)
        lo = [bbox_ref[a, c] for a in range(3)]
        hi = [bbox_ref[3 + a, c] for a in range(3)]
        tmin = jnp.full((BP, 1), -jnp.inf, jnp.float32)
        tmax = jnp.full((BP, 1), jnp.inf, jnp.float32)
        for a in range(3):
            near = (lo[a] - x[:, a:a + 1]) * inv_v[:, a:a + 1]
            far = (hi[a] - x[:, a:a + 1]) * inv_v[:, a:a + 1]
            tmin = jnp.maximum(tmin, jnp.minimum(near, far))
            tmax = jnp.minimum(tmax, jnp.maximum(near, far))
        reach = (tmax >= jnp.maximum(tmin, _T_BACK)) & (tmin < bt_ref[:, :])
        possible = jnp.any(reach)

        @pl.when(possible)
        def _():
            cp = pltpu.make_async_copy(
                tri_hbm.at[:, pl.ds(pl.multiple_of(c * BF, BF), BF)],
                chunk, sem,
            )
            cp.start()
            cp.wait()
            ch = chunk[:, :]  # (16, BF)
            T1, T2, nrm = ch[0:3, :], ch[3:6, :], ch[6:9, :]
            d, c1, c2 = ch[9:10, :], ch[10:11, :], ch[11:12, :]
            fi = ch[12:13, :]  # (1, BF) facet id as float VALUE

            # chunk-local particle coordinates (see _prep): keeps the plane
            # solve at chunk magnitude instead of domain*|n| magnitude
            xl = x - jnp.concatenate(
                [
                    jnp.full((BP, 1), bbox_ref[6, c], jnp.float32),
                    jnp.full((BP, 1), bbox_ref[7, c], jnp.float32),
                    jnp.full((BP, 1), bbox_ref[8, c], jnp.float32),
                ],
                axis=1,
            )
            # HIGHEST precision is required: the TPU's default f32 matmul
            # runs bf16 passes, whose 8-bit mantissa wrecks the barycentric
            # tolerances (grazing rays missed BOTH adjacent triangles)
            dot = partial(
                jax.lax.dot_general,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            Vn = dot(v, nrm)  # (BP, BF)
            den_ok = jnp.abs(Vn) > _EPS_DET
            t_raw = (d - dot(xl, nrm)) / jnp.where(den_ok, Vn, 1.0)
            u = dot(xl, T1) + t_raw * dot(v, T1) - c1
            w = dot(xl, T2) + t_raw * dot(v, T2) - c2
            t = jnp.where(
                t_raw > _T_BACK, jnp.maximum(t_raw, 0.0), jnp.inf
            )
            valid = (
                den_ok
                & (u >= -_BARY_TOL)
                & (w >= -_BARY_TOL)
                & (u + w <= 1.0 + _BARY_TOL)
                & (fi != ei)
                & (fi >= 0.0)
            )
            t = jnp.where(valid, t, jnp.inf)
            tmin_c = jnp.min(t, axis=1, keepdims=True)  # (BP, 1)
            fi_i = fi.astype(jnp.int32)  # exact: small non-negative ints
            fmin_c = jnp.min(
                jnp.where(
                    t == tmin_c, jnp.broadcast_to(fi_i, t.shape), _BIG_F
                ),
                axis=1, keepdims=True,
            )
            closer = tmin_c < bt_ref[:, :]
            bt_ref[:, :] = jnp.where(closer, tmin_c, bt_ref[:, :])
            bf_ref[:, :] = jnp.where(closer, fmin_c, bf_ref[:, :])

        return 0

    jax.lax.fori_loop(0, nc, body, 0)
    # INT-domain output assembly: facet ids are small ints whose f32 bit
    # patterns are DENORMALS — an f32 out tile's column-write RMW selects
    # flush them to 0 on real hardware (verified: every facet read back 0
    # at nbp=49). Int selects and stores are bit-exact for both columns
    # (t rides as bitcast bits).
    out_ref[:, 0:1] = jax.lax.bitcast_convert_type(bt_ref[:, :], jnp.int32)
    out_ref[:, 1:2] = bf_ref[:, :]


def pallas_eligible(geo) -> bool:
    F = int(geo.tri_origin.shape[0])
    return (not geo.is_box) and -(-F // BF) <= _NC_MAX


def raycast_pallas(geo, pos, vel, exclude_facet, interpret: bool = False):
    """(t_hit, facet) for arbitrary-size triangle meshes; drop-in for
    ops/raycast.py's broadcast path."""
    bbox, tab, nc = _prep(geo)
    N = pos.shape[0]
    Np = -(-N // BP) * BP
    # exclusion as a float VALUE (not a bitcast — see _prep's facet row)
    ex_f = exclude_facet.astype(jnp.float32)
    pv = jnp.concatenate(
        [
            pos.astype(jnp.float32),
            vel.astype(jnp.float32),
            ex_f[:, None],
            jnp.zeros((N, 1), jnp.float32),
        ],
        axis=1,
    )
    if Np != N:
        pv = jnp.pad(pv, ((0, Np - N), (0, 0)))  # zero vel rows -> no hit

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Np // BP,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # triangle table, HBM
            pl.BlockSpec((BP, 8), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BP, 2), lambda b, *_: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((16, BF), jnp.float32),
            pltpu.VMEM((BP, 1), jnp.float32),
            pltpu.VMEM((BP, 1), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel, nc=nc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Np, 2), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(bbox, tab, pv)
    t = jax.lax.bitcast_convert_type(out[:N, 0], jnp.float32)
    f = out[:N, 1]
    return t, f
