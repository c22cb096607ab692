"""Fused drift mega-kernel: ONE dense HBM pass over the packed particle pool.

The round-2 step made ~5 full-width passes per timestep plus an XLA assembly
pipeline; the first round-3 kernel fused them but ran every vector op on
(1, BN) rows — one valid sublane out of eight, so the VPU worked at 1/8
utilisation (measured 2.4 ms of a 7.0 ms step at N=1.25e6). This version
processes each block as a dense (16, 8, BN8) tile: the pool RIDES in the
kernel-native 3-D (16, NR, L) layout through the entire scan (L = BN // 8;
lane p of attribute c at [c, p // L, p % L]), so the DMA delivers each
attribute as a fully-packed (8, BN8) vector register file, every elementwise
op runs at full sublane occupancy, and NO layout-conversion copy of the pool
exists anywhere in the per-step path (the (16, N) <-> blocked retile pair
cost 0.24 ms/step at N=1.25e6). Per tile, entirely in VMEM:

  1. deferred RTA relaxation — the previous step's lifetime scattering
     (reference classes/Population.py:1701-1710) applied at the START of the
     next step, which is algebraically identical because neither binning nor
     the ledger reads post-RTA occupations and positions don't move between
     the two points (see sim/fused.py for the full argument),
  2. stale-lane ray cast (fresh injections) against the axis-aligned box
     planes (the box fast path of ops/raycast.py:50-69, unrolled over the
     static facet tables) or, for general small meshes (every built-in
     primitive), a Möller–Trumbore cast unrolled over the static triangle
     table (ops/raycast.py:_raycast_unrolled semantics),
  3. drift by min(t_coll, remaining) (reference Population.py:1724-1769),
  4. bounded in-kernel resolution of PERIODIC translations, reservoir
     ABSORPTION, and (when the mirror cache is active, sim/fused.py
     mirror_eligible) SPECULAR reflections off eta = 0 walls — a pure
     register swap of (mode, omega, vel, tau) with the cached
     correspondence partner plus the occupation re-reference
     (reference Population.py:941-971, 1463-1489, 1565-1608) — and (on
     rough eta > 0 walls, sim/fused.py dkern_active) DIFFUSE re-emission:
     a hardware-PRNG Bernoulli against the in-register Ziman specularity
     (from the pool's |k|^2 and corr-bitmask rows) followed by a full mode
     replacement from a presampled window block (sim/diffuse_pool.py) —
     occupation reset to BE(T_wall), slope-form lifetime, family resolved
     by ONE sublane dynamic_gather per channel (reference
     Population.py:879-1015); specular winners export FLAGGED so the
     narrow machinery honours the kernel's draw instead of redrawing;
     the energy/flux ledger accumulates on the MXU at Precision.HIGHEST,
  5. compaction of the still-pending events (reflections and deep chains)
     into 128-aligned segments of ONE global index buffer via a running SMEM
     offset (the TPU grid is sequential). Exported lanes are marked DEAD in
     the pool: the particle bag is unordered, so the event machinery's
     results re-enter by APPENDING at the pool tail (sim/fused.py) — no
     scatter-back, no merge pass,
  6. subvolume binning of every lane that stays (one MXU one-hot matmul per
     tile at Precision.HIGHEST); the exported minority is binned
     post-machinery at buffer width in XLA, and the two sums partition the
     population exactly (sim/binning.py:124-167 semantics).

Index compaction runs in FLATTENED order p = r * BN8 + l over the dense
(8, BN8) registers: shifts by s < BN8 are a lane roll plus a one-row sublane
carry (3 ops), shifts by multiples of BN8 are pure sublane rolls (1 op) —
the same monotone log-shift network as ops/compact.py, at 8x the lane
occupancy of the (1, BN) formulation.

Dead slots are no longer scanned at all: sim/fused.py appends injections at
the pool TAIL and re-compacts the pool once per outer block
(ops/compact_pool.py), so the kernel only reports per-block alive counts.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanokappa_tpu.ops.kmath import (
    occupation_delta_T_k, occupation_delta_omega_k, signk,
)
from nanokappa_tpu.sim.state import (
    C_ALIVE, C_CF, C_DEV, C_MODE, C_OMEGA, C_ONF, C_REM, C_SV, C_TAU,
    C_TCOLL, STALE,
)

BN = 32768  # particles per tile; (24, 8, BN8) f32 tile = 3 MB VMEM (A/B-tested
#   2026-08-20 at 1e7/31^3: 16384 -> 9.9e8, 32768 -> 1.03e9, 65536 -> 1.00e9
#   updates/s; the larger tile halves the per-tile grid/SMEM bookkeeping)
BN8 = BN // 8  # lanes per sublane row of the dense tile
_BIG = 1 << 30
_SENT = 1 << 29  # sentinel index for padding lanes (>= any real N)
_REMAIN_EPS = 1e-5
_T_BACK_DT = -1e-4  # ops/raycast.py:33, in ps
_UNROLL_SV = 32  # centre count up to which the nearest-centre argmin
#   unrolls with immediate constants; beyond it a fori_loop walks the SMEM
#   centre table (tsv rows 1-3), keeping kernel code size O(1) in SV
_UNROLL_T = 64  # same budget for the per-lane T_sv gather select chains
_BIN_CHUNK = 64  # subvolume slab width of the one-hot binning matmul

SH = (8, BN8)  # the dense per-attribute register shape at full tile width


def _gather_tsv(tsv_ref, sv, SV, sh):
    """Per-lane T_sv[sv] gather from the SMEM table: a static select chain
    up to _UNROLL_T subvolumes, a fori_loop beyond."""
    if SV <= _UNROLL_T:
        T = jnp.zeros(sh, jnp.float32)
        for s in range(SV):
            T = jnp.where(sv == s, tsv_ref[0, s], T)
        return T
    return jax.lax.fori_loop(
        0, SV,
        lambda s, T: jnp.where(sv == s, tsv_ref[0, s], T),
        jnp.zeros(sh, jnp.float32),
    )


def tile_width(n: int) -> int | None:
    """Kernel tile width for an n-wide pool, or None if unsupported.

    Pools >= BN use BN-wide tiles (n % BN == 0 required); smaller pools run
    a single tile of their own width, which must be a power of two >= 1024
    (the log-shift networks need power-of-two shifts; the (8, bn/8) register
    shape needs bn/8 to be a multiple of the 128-lane vector width)."""
    if n >= BN:
        return BN if n % BN == 0 else None
    if n >= 1024 and (n & (n - 1)) == 0:
        return n
    return None


def _iota_flat(sh):
    r = jax.lax.broadcasted_iota(jnp.int32, sh, 0)
    l = jax.lax.broadcasted_iota(jnp.int32, sh, 1)
    return r * sh[1] + l


def _shift_down(x, s):
    """out[p] = in[p - s] in flattened order (wrapping; callers mask)."""
    bn8 = x.shape[-1]
    if s % bn8 == 0:
        return pltpu.roll(x, s // bn8, axis=0)
    rolled = pltpu.roll(x, s, axis=1)
    carry = pltpu.roll(rolled, 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < s, carry, rolled)


def _shift_up(x, s):
    """out[p] = in[p + s] in flattened order (wrapping; callers mask)."""
    bn8 = x.shape[-1]
    if s % bn8 == 0:
        return pltpu.roll(x, 8 - s // bn8, axis=0)
    rolled = pltpu.roll(x, bn8 - s, axis=1)
    carry = pltpu.roll(rolled, 8 - 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= bn8 - s, carry, rolled)


def _cumsum_flat(x):
    """Inclusive cumsum of an (8, bn8) i32 tile in flattened order
    (Hillis-Steele over the log-shift ladder)."""
    bn = 8 * x.shape[-1]
    p = _iota_flat(x.shape)
    c = x
    s = 1
    while s < bn:
        c = c + jnp.where(p >= s, _shift_down(c, s), 0)
        s *= 2
    return c


def _compact_flat(mask, values, fill):
    """Pack `values` at True positions of `mask` to the front of the tile in
    flattened order (LSB-first log-shift network, ops/compact.py:36-65).
    Returns (packed (8, bn8), count scalar, inclusive cumsum (8, bn8) — the
    1-based rank of each True lane, used for export clamps)."""
    BN = 8 * mask.shape[-1]
    p = _iota_flat(mask.shape)
    c = _cumsum_flat(mask.astype(jnp.int32))
    count = jnp.sum(mask.astype(jnp.int32))
    delta = jnp.where(mask, p - (c - 1), _BIG)
    val = values
    s = 1
    while s < BN:
        sh_val = _shift_up(val, s)
        sh_dlt = _shift_up(delta, s)
        take = (sh_dlt & s) != 0
        stay = (delta & s) == 0
        val = jnp.where(take, sh_val, val)
        delta = jnp.where(take, sh_dlt - s, jnp.where(stay, delta, _BIG))
        s *= 2
    packed = jnp.where(p < count, val, fill)
    return packed, count, c


def _unflat8(x):
    """(8, BN8) -> (1, BN) in flattened order (for the narrow MXU ledger).

    Each row is rotated to sublane 0 BEFORE the row-0 slice: Mosaic's lane
    concat requires every input at the same sublane offset, and a plain
    x[r:r+1] slice keeps its in-register offset r."""
    rows = []
    for r in range(8):
        xr = x if r == 0 else pltpu.roll(x, 8 - r, axis=0)
        rows.append(xr[0:1, :])
    return jnp.concatenate(rows, axis=1)


def _box_raycast(pos, vel, exclude, tables, do):
    """In-register axis-aligned box ray cast (ops/raycast.py:50-69 semantics,
    unrolled over the static facet tables). pos/vel: 3x(8,bn8); exclude
    (8,bn8) i32; `do` masks the lanes that need a cast. Returns (t ps, facet)."""
    sh = pos[0].shape
    best_t = jnp.full(sh, jnp.inf, jnp.float32)
    best_f = jnp.full(sh, -1, jnp.int32)
    for f in range(tables["F"]):
        a = int(tables["axis"][f])
        sgn = float(tables["sign"][f])
        plane = float(tables["plane"][f])
        v = vel[a]
        toward = v * sgn > 0.0
        t_raw = (plane - pos[a]) / jnp.where(jnp.abs(v) > 1e-30, v, 1e-30)
        t = jnp.maximum(t_raw, 0.0)
        ok = (
            do & toward & (t_raw > _T_BACK_DT) & (t < best_t) & (exclude != f)
        )
        best_t = jnp.where(ok, t, best_t)
        best_f = jnp.where(ok, f, best_f)
    return best_t, best_f


def _lin3(cs, vs, base=None):
    """sum(c * v) over the static coefficients `cs`, skipping statically-zero
    terms (primitive meshes are full of axis-aligned triangles whose edge
    vectors have one or two zero components)."""
    acc = base
    for c, v in zip(cs, vs):
        c = float(c)
        if c == 0.0:
            continue
        term = v if c == 1.0 else (-v if c == -1.0 else v * c)
        acc = term if acc is None else acc + term
    if acc is None:
        return jnp.zeros(vs[0].shape, jnp.float32)
    return acc


def _tri_raycast(pos, vel, exclude, tables, do):
    """In-register Möller–Trumbore ray cast, unrolled over the STATIC
    triangle table (ops/raycast.py:_raycast_unrolled semantics: inclusive
    barycentric tolerance, _T_BACK corner acceptance, facet-id exclusion).
    pos/vel: 3x(8,bn8); exclude (8,bn8) i32 facet id; `do` masks the lanes
    that need a cast. Returns (t ps, facet id). Static unroll keeps the
    lane dimension dense — viable for the <=128-triangle primitive meshes
    v2_eligible admits (imported STLs beyond that run the v1 step)."""
    px, py, pz = pos
    vx, vy, vz = vel
    sh = px.shape
    best_t = jnp.full(sh, jnp.inf, jnp.float32)
    best_f = jnp.full(sh, -1, jnp.int32)
    tri_o = tables["tri_o"]
    tri_e1 = tables["tri_e1"]
    tri_e2 = tables["tri_e2"]
    tri_f = tables["tri_f"]
    for k in range(tri_o.shape[0]):
        a = tri_o[k]
        e1 = tri_e1[k]
        e2 = tri_e2[k]
        fid = int(tri_f[k])
        # h = d x e2 (e2 static)
        hx = _lin3((e2[2], -e2[1]), (vy, vz))
        hy = _lin3((-e2[2], e2[0]), (vx, vz))
        hz = _lin3((e2[1], -e2[0]), (vx, vy))
        det = _lin3(e1, (hx, hy, hz))
        inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        sx = px - float(a[0])
        sy = py - float(a[1])
        sz = pz - float(a[2])
        u = (sx * hx + sy * hy + sz * hz) * inv
        # q = s x e1 (e1 static)
        qx = _lin3((e1[2], -e1[1]), (sy, sz))
        qy = _lin3((-e1[2], e1[0]), (sx, sz))
        qz = _lin3((e1[1], -e1[0]), (sx, sy))
        w = (vx * qx + vy * qy + vz * qz) * inv
        t_raw = _lin3(e2, (qx, qy, qz)) * inv
        t = jnp.maximum(t_raw, 0.0)
        ok = (
            do
            & (jnp.abs(det) > 1e-12)
            & (u >= -1e-5)
            & (w >= -1e-5)
            & (u + w <= 1.0 + 1e-5)
            & (t_raw > _T_BACK_DT)
            & (exclude != fid)
            & (t < best_t)
        )
        best_t = jnp.where(ok, t, best_t)
        best_f = jnp.where(ok, fid, best_f)
    return best_t, best_f


def _kernel(
    *refs,  # [dk_off_ref (scalar prefetch, dkern only),] tsv_ref, rta_ref,
    #   in_ref, [win_ref (dkern only),] out_ref, evt_hbm, cnt_ref,
    #   ledger_ref, bins_ref, acc_ref, bacc_ref, [evt_s,] off_ref, sem
    #
    # tsv_ref: (4, SVP) f32 SMEM — row 0 subvolume temperatures, rows 1-3
    #   subvolume centre x/y/z (padded; centres feed the beyond-unroll
    #   nearest-centre argmin loop)
    # rta_ref: (1, 1|2) i32 SMEM — [apply deferred RTA this step?
    #   (, per-step PRNG seed on the dkern path)]
    # in_ref: (C, 8, BN8) packed tile (a block of the (C, NR, L) pool);
    #   C = 24 on the mirror fast path — the specular-mirror cache rides as
    #   rows 16..23 of the SAME array (sim/state.py X_* columns + 16), so
    #   one block spec / one DMA stream / one append window serves both;
    #   C = 18 with dk set (in-kernel diffuse) — row 16 carries |k|^2 of
    #   each lane's mode (the Ziman specularity evaluates in-register) and
    #   row 17 its correspondence-existence bitmask
    # win_ref: (CHT, 1, L) presample block (sim/diffuse_pool.py), rotated
    #   per step/tile by the scalar-prefetched block offset
    tables: dict,
    cfg: dict,
):
    if cfg["dkern"]:
        (_dk_off_ref, tsv_ref, rta_ref, in_ref, win_ref, *rest) = refs
    else:
        (tsv_ref, rta_ref, in_ref, *rest) = refs
        win_ref = None
    (out_ref, evt_hbm, cnt_ref, ledger_ref, bins_ref, *tail_refs) = rest
    if cfg["export_rows"]:
        # evt_hbm is the VMEM-resident (16, ecap + 2*w_exp) rows output
        # (revisited block; rows merge in place, no DMA staging needed)
        rows_ref = evt_hbm
        acc_ref, bacc_ref, off_ref, sem = tail_refs
    else:
        # evt_hbm is the manual-DMA index buffer; evt_s its staging row
        acc_ref, bacc_ref, evt_s, off_ref, sem = tail_refs
    # out_ref: (16, 8, BN8) drifted tile
    # evt_hbm: (1, ECAP + BN) i32 global event-index buffer (ANY, manual DMA)
    # cnt_ref: (nb, 8) i32 SMEM [pend_count, alive_count, seg_start, kept]
    # ledger_ref: (8, 128) f32 reservoir ledger [e, fx, fy, fz, count]
    # bins_ref: (SV8, 128) f32 subvolume sums [e, e*vx, e*vy, e*vz, alive]
    # acc/bacc: VMEM accumulators; evt_s: (1, BN) i32 DMA staging row
    # off_ref: (1,) i32 SMEM running 128-aligned segment offset; sem: DMA
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    dt = cfg["dt"]
    t_ref = cfg["t_reference"]
    R8 = 8
    BN = cfg["bn"]  # tile width (shadows the module default)
    BN8 = BN // 8
    SH = (8, BN8)
    SV8 = cfg["sv8"]

    @pl.when(b == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros((8, 128), jnp.float32)
        bacc_ref[:, :] = jnp.zeros((SV8, 128), jnp.float32)
        off_ref[0] = 0

    gidx = b * BN + _iota_flat(SH)
    in_pool = gidx < cfg["n_real"]

    # per-attribute 2-D loads: indexing the two leading (untiled) block dims
    # yields dense (8, BN8) values — Mosaic cannot lower 3-D ref views whose
    # sublane dim gets sliced, so the kernel never materialises the 3-D tile
    f32 = jnp.float32
    i32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731
    bc32 = lambda a: jax.lax.bitcast_convert_type(a, f32)  # noqa: E731

    px = in_ref[0]
    py = in_ref[1]
    pz = in_ref[2]
    vx = in_ref[3]
    vy = in_ref[4]
    vz = in_ref[5]
    omega = in_ref[C_OMEGA]
    tau = in_ref[C_TAU]
    dev = in_ref[C_DEV]
    mode_b = in_ref[C_MODE]  # opaque bits, passed through
    cf = i32(in_ref[C_CF])
    t_coll = in_ref[C_TCOLL]
    onf = i32(in_ref[C_ONF])
    rem_col = in_ref[C_REM]
    alive = (in_ref[C_ALIVE] > 0.5) & in_pool
    if cfg["dkern"]:
        # |k|^2 of each lane's current mode (row 16): the Ziman specularity
        # p = exp(-(2 eta cos)^2 k^2) then evaluates in-register at any wall
        # (sim/boundary_tables.py _specularity semantics), so the rough-wall
        # Bernoulli needs NO (NU, M) table gather. Row 17 carries the mode's
        # correspondence-EXISTENCE bitmask over the NU table rows (as a
        # float value < 256): a mode with no specular partner at a wall
        # ALWAYS diffuses there (the reference zeroes its specularity,
        # sim/boundary_tables.py 'true specularity'), so its Bernoulli is
        # skipped instead of exporting a flagged lane the machinery would
        # just diffuse anyway.
        k2p = in_ref[16]
        cmaskp = in_ref[17]
        if not cfg["interpret"]:
            pltpu.prng_seed(rta_ref[0, 1], b)
        # lanes that already DECIDED specular in an earlier step but could
        # not export (event-buffer clamp) arrive flagged with C_TCOLL = -2
        # (see the export block below); they sit at their wall undecided-no-
        # more — skip the Bernoulli, keep them pending for export
        sflag = alive & (t_coll < -1.5)
        t_coll = jnp.where(sflag, 0.0, t_coll)
    if cfg["slim"]:
        # SLIM specular-mirror cache (sim/boundary_tables.py
        # slim_mirror_axis): the correspondence partner is the exact
        # crystal-symmetry mirror — its omega/tau bits EQUAL the main
        # mode's and its velocity is the main velocity with the wall-axis
        # component sign-flipped, so only the partner MODE id (row 16) and
        # the main tau slope (row 17) ride the pool: 18 rows instead of 24,
        # 25% less kernel HBM traffic, bit-identical step semantics
        m_mode_b = in_ref[16]
        tau_b = in_ref[17]
        m_mode = i32(m_mode_b)
    elif cfg["use_mirror"]:
        # specular-mirror cache (rows 16..23 = sim/state.py X_* + 16): the
        # cached correspondence partner's (mode, omega, vel) plus the
        # SLOPE-FORM lifetime pairs — C_TAU/X_TAU are intercepts,
        # X_TAUB/X_MTAUB the slopes of tau(T) = a + b*T on the current
        # T-grid bin
        m_mode_b = in_ref[16]
        m_omega = in_ref[17]
        m_vx = in_ref[18]
        m_vy = in_ref[19]
        m_vz = in_ref[20]
        m_tau = in_ref[21]
        tau_b = in_ref[22]
        m_tau_b = in_ref[23]
        m_mode = i32(m_mode_b)
    # position-derived subvolume id — identical to sim/binning.py subvol_id:
    # slice domains are index arithmetic; grid/voronoi domains are a
    # nearest-centre argmin, unrolled over the static centre table (the
    # reference's SubvolClassifier is a nearest-centre interpolator for
    # every type, classes/Geometry.py:1198-1213)
    SVn = cfg["n_subvols"]

    def _sv_of(qx, qy, qz):
        if cfg["sv_mode"] == "slice":
            qa = (qx, qy, qz)[cfg["slice_axis"]]
            return jnp.clip(
                ((qa - cfg["lo_b"]) * cfg["inv_len"]).astype(jnp.int32),
                0, SVn - 1,
            )
        # nearest centre: d2 = |c|^2 - 2 q.c (same algebra as the XLA
        # classifier; first-minimum tie-break like argmin). Small tables
        # unroll with immediate constants; big ones run a fori_loop over
        # the SMEM centre table (tsv_ref rows 1-3) so kernel code size
        # stays O(1) in the centre count
        if SVn <= _UNROLL_SV:
            cx, cy, cz = cfg["centers"][0]
            best = jnp.zeros(qx.shape, jnp.int32)
            bd = (cx * cx + cy * cy + cz * cz) - 2.0 * (
                qx * cx + qy * cy + qz * cz
            )
            for si in range(1, SVn):
                cx, cy, cz = cfg["centers"][si]
                d = (cx * cx + cy * cy + cz * cz) - 2.0 * (
                    qx * cx + qy * cy + qz * cz
                )
                take = d < bd
                best = jnp.where(take, si, best)
                bd = jnp.where(take, d, bd)
            return best

        def _cbody(si, carry):
            best, bd = carry
            cx, cy, cz = tsv_ref[1, si], tsv_ref[2, si], tsv_ref[3, si]
            d = (cx * cx + cy * cy + cz * cz) - 2.0 * (
                qx * cx + qy * cy + qz * cz
            )
            take = d < bd
            return jnp.where(take, si, best), jnp.where(take, d, bd)

        best, _ = jax.lax.fori_loop(
            0, SVn,
            _cbody,
            (
                jnp.zeros(qx.shape, jnp.int32),
                jnp.full(qx.shape, jnp.inf, f32),
            ),
        )
        return best

    sv = _sv_of(px, py, pz)

    # remaining dt fraction: frozen lanes resume their leftover, fresh
    # injections carry dt_in/dt, everyone else gets a full step
    rem = jnp.where(
        rem_col > _REMAIN_EPS, rem_col, jnp.where(alive, 1.0, 0.0)
    )

    # ---- 1. deferred RTA (previous step's lifetime scattering) -------------
    # skipped for STALE lanes (injected THIS step — they did not exist when
    # the deferred update was due) and on the very first step (rta_ref == 0)
    SV = cfg["n_subvols"]

    def _T_interp(qx, qy, qz, sv_q=None):
        # particle temperature at (qx, qy, qz) with params.temp_interp
        # semantics (sim/binning.py interp_T_particles) — shared by the
        # deferred RTA and the in-kernel diffuse branch (wall temperature)
        if cfg["temp_interp"] == "linear":
            # uniform slice centres: index arithmetic + lerp with
            # extrapolation (sim/binning.py:49-59)
            ax = cfg["slice_axis"]
            pa = (qx, qy, qz)[ax]
            fpos = (pa - cfg["c0"]) / cfg["dc"]
            ilo = jnp.clip(fpos.astype(jnp.int32), 0, SV - 2)
            ilo = jnp.where(fpos < 0, 0, ilo)
            w = fpos - ilo.astype(f32)
            if SV <= _UNROLL_T:
                T_lo = jnp.zeros(SH, f32)
                T_hi = jnp.zeros(SH, f32)
                for s in range(SV):
                    tv = tsv_ref[0, s]
                    T_lo = jnp.where(ilo == s, tv, T_lo)
                    T_hi = jnp.where(ilo + 1 == s, tv, T_hi)
            else:
                def _tbody(s, carry):
                    lo, hi = carry
                    tv = tsv_ref[0, s]
                    return (
                        jnp.where(ilo == s, tv, lo),
                        jnp.where(ilo + 1 == s, tv, hi),
                    )

                T_lo, T_hi = jax.lax.fori_loop(
                    0, SV, _tbody, (jnp.zeros(SH, f32), jnp.zeros(SH, f32))
                )
            return T_lo * (1.0 - w) + T_hi * w
        # nearest
        if sv_q is None:
            sv_q = _sv_of(qx, qy, qz)
        return _gather_tsv(tsv_ref, jnp.clip(sv_q, 0, SV - 1), SV, SH)

    T_p = _T_interp(px, py, pz, sv_q=sv)

    g = occupation_delta_T_k(T_p, t_ref, omega)
    if cfg["use_mirror"]:
        # slope-form lifetime: evaluate at the (table-clamped) local T —
        # continuously exact table lerp while T stays inside the grid bin
        # the pair was refreshed on (sim/scatter.py slope_pair)
        T_c = jnp.clip(T_p, cfg["tau_tmin"], cfg["tau_tmax"])
        tau_ev = tau + tau_b * T_c
    else:
        tau_ev = tau
    decay = jnp.where(
        tau_ev > 0, jnp.exp(-dt / jnp.maximum(tau_ev, 1e-12)), 0.0
    )
    # freshness marker (lanes injected THIS step skip the deferred RTA —
    # they did not exist when it was due): C_CF == STALE when the kernel
    # casts in-kernel; with kernel_cast off (large meshes) injections are
    # PRE-CAST outside (sim/fused.py) and carry the encoded flight time
    # t_enc = -(t/dt) - 1 < 0 in C_TCOLL with the REAL facet in C_CF
    if cfg["kernel_cast"]:
        fresh = cf == STALE
    else:
        fresh = t_coll < -0.5
    do_rta = alive & ~fresh & (rta_ref[0, 0] > 0)
    dev = jnp.where(do_rta, g + (dev - g) * decay, dev)

    # ---- 2. stale-lane ray cast (fresh injections sit on their facet) ------
    if cfg["kernel_cast"]:
        _cast = _box_raycast if tables["is_box"] else _tri_raycast
        stale = alive & fresh
        t_b, f_b = _cast((px, py, pz), (vx, vy, vz), onf, tables, stale)
        t_coll = jnp.where(stale, t_b / dt, t_coll)
        cf = jnp.where(stale, f_b, cf)
    else:
        # decode the pre-cast flight time; cf already carries the facet
        t_coll = jnp.where(fresh, -t_coll - 1.0, t_coll)

    # ---- 3. drift ----------------------------------------------------------
    sf = jnp.where(alive, jnp.minimum(t_coll, rem), 0.0)
    sf = jnp.where(sf < 1e30, sf, rem)  # isfinite: Mosaic-safe
    px = px + vx * (dt * sf)
    py = py + vy * (dt * sf)
    pz = pz + vz * (dt * sf)
    t_coll = t_coll - sf
    rem = jnp.where(alive, jnp.maximum(rem - sf, 0.0), 0.0)

    # ---- 4. in-kernel periodic / absorb rounds -----------------------------
    led_e = jnp.zeros(SH, f32)
    led_fx = jnp.zeros(SH, f32)
    led_fy = jnp.zeros(SH, f32)
    led_fz = jnp.zeros(SH, f32)
    led_n = jnp.zeros(SH, f32)
    led_seg = jnp.full(SH, R8 - 1, jnp.int32)

    F = tables["F"]
    abs_facets = [f for f in range(F) if tables["is_absorb"][f]]
    per_facets = [f for f in range(F) if tables["is_periodic"][f]]
    for _round in range(cfg["u_rounds"]):
        pend = alive & (rem > _REMAIN_EPS) & (cf >= 0) & (t_coll <= 1e-9)

        # facet properties by static unroll over only the relevant facets,
        # skipping statically-zero table components (a box wall's normal and
        # a periodic pair's shift have one nonzero component each)
        is_abs = jnp.zeros(SH, bool)
        is_per = jnp.zeros(SH, bool)
        T_res = jnp.zeros(SH, f32)
        res_id = jnp.zeros(SH, jnp.int32)
        shx = jnp.zeros(SH, f32)
        shy = jnp.zeros(SH, f32)
        shz = jnp.zeros(SH, f32)
        pair = jnp.full(SH, -1, jnp.int32)
        nx = jnp.zeros(SH, f32)
        ny = jnp.zeros(SH, f32)
        nz = jnp.zeros(SH, f32)
        for f in abs_facets:
            sel = cf == f
            is_abs = is_abs | sel
            T_res = jnp.where(sel, float(tables["value"][f]), T_res)
            if int(tables["res"][f]) != 0:
                res_id = jnp.where(sel, int(tables["res"][f]), res_id)
            nrm = tables["normal"][f]
            if abs(float(nrm[0])) > 1e-12:
                nx = jnp.where(sel, float(nrm[0]), nx)
            if abs(float(nrm[1])) > 1e-12:
                ny = jnp.where(sel, float(nrm[1]), ny)
            if abs(float(nrm[2])) > 1e-12:
                nz = jnp.where(sel, float(nrm[2]), nz)
        for f in per_facets:
            sel = cf == f
            is_per = is_per | sel
            sh = tables["shift"][f]
            if abs(float(sh[0])) > 1e-12:
                shx = jnp.where(sel, float(sh[0]), shx)
            if abs(float(sh[1])) > 1e-12:
                shy = jnp.where(sel, float(sh[1]), shy)
            if abs(float(sh[2])) > 1e-12:
                shz = jnp.where(sel, float(sh[2]), shz)
            pair = jnp.where(sel, int(tables["pair"][f]), pair)

        # absorption (reference Population.py:1565-1608 ledger semantics,
        # incl. the grazing-incidence obliquity clamp of sim/cascade.py)
        absorb = pend & is_abs
        dn_abs = dev - occupation_delta_T_k(T_res, t_ref, omega)
        e_abs = cfg["hbar"] * omega * dn_abs
        vdn = vx * nx + vy * ny + vz * nz
        vmag = jnp.sqrt(vx * vx + vy * vy + vz * vz)
        vdn_safe = signk(vdn) * jnp.maximum(jnp.abs(vdn), 1e-3 * vmag)
        flux_w = jnp.where(jnp.abs(vdn_safe) > 1e-30, e_abs / vdn_safe, 0.0)
        led_e = jnp.where(absorb, led_e + e_abs, led_e)
        led_fx = jnp.where(absorb, led_fx + flux_w * vx, led_fx)
        led_fy = jnp.where(absorb, led_fy + flux_w * vy, led_fy)
        led_fz = jnp.where(absorb, led_fz + flux_w * vz, led_fz)
        led_n = jnp.where(absorb, led_n + 1.0, led_n)
        led_seg = jnp.where(absorb, res_id, led_seg)
        alive = alive & ~absorb
        rem = jnp.where(absorb, 0.0, rem)

        # periodic translation (Population.py:1463-1489)
        per = pend & is_per
        px = px + jnp.where(per, shx, 0.0)
        py = py + jnp.where(per, shy, 0.0)
        pz = pz + jnp.where(per, shz, 0.0)
        onf = jnp.where(per, pair, onf)

        # in-kernel SPECULAR reflection (eta = 0 walls, velocity model):
        # occupation is conserved while the mode's reference occupation
        # changes (classes/Population.py:941-971), then (mode, omega, vel,
        # tau) SWAP with the cached mirror set — mirror-of-mirror is the
        # original mode, so the cache swap is exact. Lanes without a
        # correspondence (m_mode < 0) stay pending and export to the narrow
        # machinery as before.
        rfl = jnp.zeros(SH, bool)
        if cfg["use_mirror"]:
            is_rfl = jnp.zeros(SH, bool)
            for f in range(F):
                if tables["is_rough"][f]:
                    is_rfl = is_rfl | (cf == f)
            rfl = pend & is_rfl & (m_mode >= 0)
            if cfg["slim"]:
                # exact-symmetry partner: omega'/tau' bits equal the main
                # mode's (no dev re-reference — delta_omega is exactly 0;
                # no tau/slope swap), velocity mirrors by one sign flip
                fa = cfg["flip_axis"]
                if fa == 0:
                    vx = jnp.where(rfl, -vx, vx)
                elif fa == 1:
                    vy = jnp.where(rfl, -vy, vy)
                else:
                    vz = jnp.where(rfl, -vz, vz)
                mode_b, m_mode_b = (
                    jnp.where(rfl, m_mode_b, mode_b),
                    jnp.where(rfl, mode_b, m_mode_b),
                )
                m_mode = i32(m_mode_b)
                onf = jnp.where(rfl, cf, onf)
            else:
                dev = jnp.where(
                    rfl,
                    dev + occupation_delta_omega_k(t_ref, omega, m_omega),
                    dev,
                )

                def sw(a, bb):
                    return jnp.where(rfl, bb, a), jnp.where(rfl, a, bb)

                omega, m_omega = sw(omega, m_omega)
                tau, m_tau = sw(tau, m_tau)  # intercepts a <-> a_m
                tau_b, m_tau_b = sw(tau_b, m_tau_b)  # slopes b <-> b_m
                mode_b, m_mode_b = sw(mode_b, m_mode_b)
                m_mode = i32(m_mode_b)
                vx, m_vx = sw(vx, m_vx)
                vy, m_vy = sw(vy, m_vy)
                vz, m_vz = sw(vz, m_vz)
                onf = jnp.where(rfl, cf, onf)

        # in-kernel DIFFUSE reflection (rough walls, eta > 0): Bernoulli
        # against the in-register Ziman specularity, then a full mode
        # replacement from this tile's presample block (sim/diffuse_pool.py)
        # — occupation reset to BE(T_wall) and the slope-form lifetime, all
        # without a single mode-table gather (reference semantics:
        # classes/Population.py:941-1015 diffuse branch). Specular winners
        # are NOT resolved here (a general mesh has several wall normals —
        # no per-lane correspondence cache); they export to the narrow
        # machinery FLAGGED (C_TCOLL = -2) so its Bernoulli is skipped and
        # the in-kernel draw is the one and only draw (no double-draw bias).
        # Both unrolled rounds resolve diffuse (round 1 reads its window
        # entries LANE-ROLLED so a twice-diffusing lane draws a different
        # presample); only 3+-bounce chains export.
        dff = jnp.zeros(SH, bool)
        if cfg["dkern"]:
            is_rgh = jnp.zeros(SH, bool)
            eta_l = jnp.zeros(SH, f32)
            rowsel = jnp.zeros(SH, jnp.int32)
            rnx = jnp.zeros(SH, f32)
            rny = jnp.zeros(SH, f32)
            rnz = jnp.zeros(SH, f32)
            for f in range(F):
                if not tables["is_rough"][f]:
                    continue
                sel = cf == f
                is_rgh = is_rgh | sel
                eta_l = jnp.where(sel, float(cfg["dk_facet_eta"][f]), eta_l)
                rowsel = jnp.where(sel, int(cfg["dk_facet_row"][f]), rowsel)
                nrm = tables["normal"][f]
                if abs(float(nrm[0])) > 1e-12:
                    rnx = jnp.where(sel, float(nrm[0]), rnx)
                if abs(float(nrm[1])) > 1e-12:
                    rny = jnp.where(sel, float(nrm[1]), rny)
                if abs(float(nrm[2])) > 1e-12:
                    rnz = jnp.where(sel, float(nrm[2]), rnz)
            vdn_r = vx * rnx + vy * rny + vz * rnz
            if cfg["dk_two_sided"]:
                # internal rough membranes are hit from BOTH sides: a
                # back-side hit (v against the stored normal) uses the
                # table row built for the flipped normal
                # (sim/boundary_tables.py row_back)
                rback = jnp.zeros(SH, jnp.int32)
                for f in range(F):
                    if tables["is_rough"][f]:
                        rback = jnp.where(
                            cf == f, int(cfg["dk_facet_row_back"][f]), rback
                        )
                rowsel = jnp.where(vdn_r < 0.0, rback, rowsel)
            # Ziman p = exp(-(2 eta cos)^2 |k|^2), cos = v.n / |v|
            # (sim/boundary_tables.py _specularity)
            v2 = vx * vx + vy * vy + vz * vz
            cos2 = (vdn_r * vdn_r) / jnp.maximum(v2, 1e-30)
            p_spec = jnp.exp(-4.0 * eta_l * eta_l * cos2 * k2p)
            # TRUE specularity: zero where the mode has no correspondence
            # partner at this wall row (always-diffuse, reference
            # classes/Population.py:941-988 via the zeroed table)
            has_corr = (
                jax.lax.shift_right_logical(
                    cmaskp.astype(jnp.int32), rowsel
                ) & 1
            ) == 1
            p_spec = jnp.where(has_corr, p_spec, 0.0)
            if cfg["interpret"]:
                # interpret mode has no pltpu PRNG lowering: a counter-based
                # integer hash of (lane, seed, round) gives test-grade
                # uniforms (the compiled path always uses the hardware PRNG)
                h = gidx ^ (
                    rta_ref[0, 1] * 1000003 + b * 7919 + _round * 104729
                )
                h = (h * 0x27D4EB2F) ^ (h >> 15)
                h = (h * 0x165667B1) ^ (h >> 13)
                bits = h
            else:
                bits = pltpu.prng_random_bits(SH)
            # low 24 bits as a [0, 1) uniform — prng_random_bits returns
            # SIGNED int32 on this jax version, so a plain >> would be an
            # arithmetic shift and leave half the draws negative (every
            # such lane would flag specular)
            u = (bits & 0xFFFFFF).astype(f32) * (1.0 / (1 << 24))
            # wall temperature with params.temp_interp semantics (the
            # reference resets occupation to BE at the particle-interpolated
            # local T, classes/Population.py:984-988)
            T_w = _T_interp(px, py, pz)
            in_rng = (T_w >= cfg["dk_tlo"]) & (T_w <= cfg["dk_thi"])
            undecided = pend & is_rgh & ~sflag
            dff = undecided & (u >= p_spec) & in_rng
            # decided-specular: flag for export (the narrow machinery takes
            # the flag as THE Bernoulli outcome); out-of-range lanes export
            # unflagged (their in-kernel draw is discarded unconsumed — the
            # machinery redraws, which is unbiased because nothing here
            # depended on u for those lanes)
            sflag = sflag | (undecided & (u < p_spec) & in_rng)

            # presample replacement: each channel's 8-family table is ONE
            # (8, L) vreg; the per-lane family resolves with ONE sublane
            # dynamic_gather (tpu.dynamic_gather dims=[0] — the gather
            # axis is exactly one vreg of sublanes, the supported case).
            # Round 1 reads lane-ROLLED entries (static shift —
            # bit-preserving) so a lane diffusing twice in one step draws
            # independently.
            def wch(ch):
                src = win_ref[0, ch]  # (8, L) family-major table
                v = jnp.take_along_axis(src, rowsel, axis=0)
                if _round > 0:
                    v = pltpu.roll(v, 29 * _round, axis=1)
                return v

            n_mode = wch(0)  # mode id as a float VALUE (exact < 2^24)
            n_omega = wch(1)
            n_vx = wch(2)
            n_vy = wch(3)
            n_vz = wch(4)
            n_k2 = wch(5)
            n_cmask = wch(6)
            a_t = wch(7)
            b_t = wch(8)
            if cfg["dk_nbins"] == 2:
                hi_bin = T_w >= cfg["dk_tsplit"]
                a_t = jnp.where(hi_bin, wch(9), a_t)
                b_t = jnp.where(hi_bin, wch(10), b_t)
            T_ev = jnp.clip(T_w, cfg["dk_clamp_lo"], cfg["dk_clamp_hi"])
            n_tau = a_t + b_t * T_ev

            dev = jnp.where(
                dff, occupation_delta_T_k(T_w, t_ref, n_omega), dev
            )
            mode_b = jnp.where(
                dff, bc32(n_mode.astype(jnp.int32)), mode_b
            )
            omega = jnp.where(dff, n_omega, omega)
            vx = jnp.where(dff, n_vx, vx)
            vy = jnp.where(dff, n_vy, vy)
            vz = jnp.where(dff, n_vz, vz)
            k2p = jnp.where(dff, n_k2, k2p)
            cmaskp = jnp.where(dff, n_cmask, cmaskp)
            tau = jnp.where(dff, n_tau, tau)
            onf = jnp.where(dff, cf, onf)

        # re-cast + drift the remainder for translated/reflected lanes
        mv = per | rfl | dff
        t_b, f_b = _cast((px, py, pz), (vx, vy, vz), onf, tables, mv)
        t_coll = jnp.where(mv, t_b / dt, t_coll)
        cf = jnp.where(mv, f_b, cf)
        sf = jnp.where(mv & alive, jnp.minimum(t_coll, rem), 0.0)
        sf = jnp.where(sf < 1e30, sf, jnp.where(mv, rem, 0.0))
        px = px + vx * (dt * sf)
        py = py + vy * (dt * sf)
        pz = pz + vz * (dt * sf)
        t_coll = t_coll - sf
        rem = jnp.where(mv, jnp.maximum(rem - sf, 0.0), rem)

    # MXU ledger reduction (exact f32: Precision.HIGHEST); the narrow rows
    # are unflattened to (1, BN) so the dot stays a proven 2-D contraction.
    # With the in-kernel rounds off (kernel_cast=False) nothing absorbed in
    # kernel, so the reduction is skipped (the narrow machinery ledgers).
    if cfg["n_reservoirs"] > 0 and cfg["u_rounds"] > 0:
        seg_row = _unflat8(led_seg)
        oh = (
            seg_row == jax.lax.broadcasted_iota(jnp.int32, (R8, BN), 0)
        ).astype(f32)
        vals = jnp.concatenate(
            [_unflat8(led_e), _unflat8(led_fx), _unflat8(led_fy),
             _unflat8(led_fz), _unflat8(led_n)],
            axis=0,
        )
        led = jax.lax.dot_general(
            oh, vals, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (R8, 5)
        acc_ref[:, :] = acc_ref[:, :] + jnp.concatenate(
            [led, jnp.zeros((R8, 128 - 5), jnp.float32)], axis=1
        )

    if cfg["dkern"]:
        # decided-specular lanes carry the flag OUT (C_TCOLL = -2): exported
        # rows tell the narrow machinery to skip its Bernoulli; lanes the
        # event-buffer clamp freezes keep the flag in the pool and re-enter
        # this kernel already decided next step
        t_coll = jnp.where(sflag, -2.0, t_coll)

    # ---- 5. pending events -> a GLOBAL 128-aligned segment ------------------
    # The TPU grid runs sequentially, so a running SMEM offset chains the
    # per-block segments into one dense buffer IN-KERNEL — the XLA glue that
    # re-gathered per-block private slots into a packed list cost 0.55
    # ms/step at N=1.25e6 (round-3 trace, fused.py hist/cumsum + two 39k-lane
    # scalar gathers). Overrun past a segment's aligned width is overwritten
    # by the NEXT block's full-BN DMA window (same trick as compact_pool);
    # lanes clamped off by ECAP stay pending in the pool (frozen, counted
    # outside from pend_count - seg_kept).
    pend = alive & (rem > _REMAIN_EPS) & (cf >= 0) & (t_coll <= 1e-9)
    if cfg["export_rows"]:
        # ROW export (mirror fast path, pending lanes are ~2/tile): the
        # 14-stage log-shift value network is skipped — only the rank cumsum
        # runs, and the few pending lanes' 16 columns are extracted from the
        # written tile by a bounded scalar loop (step 5.9 below, after the
        # out_ref writes). This removes the XLA side's full-pool
        # layout-conversion copy + row gather entirely (0.25 + 0.15 ms/step
        # at N=1.25e6 in the round-3 trace). Rows pack TIGHTLY (off advances
        # by exactly kept): the index path's per-block 128-aligned segments
        # wasted ~64x buffer width at this event rate and silently froze
        # ~100 events/step against ECAP on the film config.
        rank = _cumsum_flat(pend.astype(jnp.int32))
        evt_cnt = jnp.sum(pend.astype(jnp.int32))
        off = off_ref[0]
        kept = jnp.minimum(
            jnp.minimum(evt_cnt, cfg["ecap"] - off), cfg["w_exp"]
        )
        off_ref[0] = off + kept
    else:
        evt_packed, evt_cnt, rank = _compact_flat(pend, gidx, _SENT)
        off = off_ref[0]
        kept = jnp.minimum(evt_cnt, cfg["ecap"] - off)
        row = _unflat8(evt_packed)  # (1, BN) ascending indices, _SENT fill
        lane_r = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
        evt_s[:, :] = jnp.where(lane_r < kept, row, _SENT)
        cp = pltpu.make_async_copy(
            evt_s, evt_hbm.at[:, pl.ds(pl.multiple_of(off, 128), BN)], sem
        )
        cp.start()
        cp.wait()
        off_ref[0] = off + ((kept + 127) // 128) * 128
    cnt_ref[b, 0] = evt_cnt
    cnt_ref[b, 1] = jnp.sum((alive & in_pool).astype(jnp.int32))
    cnt_ref[b, 2] = off
    cnt_ref[b, 3] = kept

    # exported lanes LEAVE the pool: the particle bag is unordered, so the
    # event machinery's results APPEND at the pool tail like injections
    # (sim/fused.py) instead of scattering back to their origin lanes — this
    # removed the O(BN log BN) expand-network merge pass entirely (0.98
    # ms/step at N=1.25e6 in the round-3 trace). Lanes clamped off by ECAP
    # (rank > kept) stay pending in the pool for one step (frozen, counted
    # outside from pend_count - kept).
    exported = pend & (rank <= kept)
    alive = alive & ~exported

    # ---- 5.5 subvolume binning of every lane that STAYS in the pool --------
    # (exported rows are binned post-machinery at buffer width in XLA; the
    # two sums partition the population, matching sim/binning.py:124-167 on
    # the end-of-step state). dn is taken against the SUBVOLUME temperature
    # (classes/Population.py:707), positions are post-drift.
    sv = _sv_of(px, py, pz)
    SV8 = cfg["sv8"]
    T_b = _gather_tsv(tsv_ref, sv, SVn, SH)
    dn_b = dev - occupation_delta_T_k(T_b, t_ref, omega)
    e_b = jnp.where(alive, cfg["hbar"] * omega * dn_b, 0.0)
    sv_row = _unflat8(jnp.where(alive, sv, SV8))  # SV8 -> matches no row
    vals_b = jnp.concatenate(
        [
            _unflat8(e_b),
            _unflat8(jnp.where(alive, e_b * vx, 0.0)),
            _unflat8(jnp.where(alive, e_b * vy, 0.0)),
            _unflat8(jnp.where(alive, e_b * vz, 0.0)),
            _unflat8(jnp.where(alive, 1.0, 0.0)),
        ],
        axis=0,
    )  # (5, BN)
    # one-hot MXU segment reduction, chunked in 64-subvol slabs so the
    # (slab, BN) one-hot stays <= 64*BN*4 B of VMEM at any subvolume count
    for s0 in range(0, SV8, _BIN_CHUNK):
        sc = min(_BIN_CHUNK, SV8 - s0)
        oh_b = (
            sv_row - s0
            == jax.lax.broadcasted_iota(jnp.int32, (sc, BN), 0)
        ).astype(f32)
        sums_b = jax.lax.dot_general(
            oh_b, vals_b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (sc, 5)
        bacc_ref[s0:s0 + sc, :] = bacc_ref[s0:s0 + sc, :] + jnp.concatenate(
            [sums_b, jnp.zeros((sc, 128 - 5), jnp.float32)], axis=1
        )

    # ---- 6. write the drifted tile (per-attribute 2-D stores) --------------
    for c, v in enumerate(
        [
            px, py, pz, vx, vy, vz, omega, tau, dev, mode_b,
            bc32(cf), t_coll, bc32(onf), rem,
            jnp.where(alive, 1.0, 0.0),
            bc32(sv),
        ]
    ):
        out_ref[c] = v
    if cfg["dkern"]:
        out_ref[16] = k2p
        out_ref[17] = cmaskp
    elif cfg["slim"]:
        out_ref[16] = m_mode_b
        out_ref[17] = tau_b
    elif cfg["use_mirror"]:
        for c, v in enumerate(
            [m_mode_b, m_omega, m_vx, m_vy, m_vz, m_tau, tau_b, m_tau_b]
        ):
            out_ref[16 + c] = v

    # ---- 5.9 exported-row extraction (export_rows path) --------------------
    # Pending lanes' 16 columns are read back from the freshly written tile
    # (out_ref aliases in_ref — the values are the post-step pool bits, the
    # exact rows the XLA gather used to fetch) by a dynamic-trip-count scalar
    # loop: per exported slot k, find its lane by rank, load the aligned
    # (16, 8, 128) chunk containing it, mask-reduce the (sublane, lane)
    # position out, and PLACE it at window lane d + k (d = this block's
    # unaligned offset inside the aligned 2*W window). ~1.5 us/lane measured
    # — at the mirror path's ~2 pending lanes/tile this is ~0.03 ms/step, vs
    # 0.4 ms for the XLA copy+gather. The window then merges into the
    # VMEM-resident rows output with pure selects (bit-preserving for the
    # bitcast int columns — no roll, no unaligned store).
    if cfg["export_rows"]:
        W = cfg["w_exp"]
        CC = cfg["n_rows"]
        a0 = pl.multiple_of((off // 128) * 128, 128)
        d = off - a0
        lidx = _iota_flat(SH)
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (CC, 8, 128), 1)
        lane2d = jax.lax.broadcasted_iota(jnp.int32, (CC, 128), 1)
        laneW2 = jax.lax.broadcasted_iota(jnp.int32, (CC, 2 * W), 1)

        @pl.when(b == 0)
        def _zero_rows():
            rows_ref[:, :] = jnp.zeros(rows_ref.shape, jnp.float32)

        def _extract(k, acc):
            p = jnp.sum(jnp.where(pend & (rank == k + 1), lidx, 0))
            r = p // BN8
            l = p - r * BN8
            l0 = pl.multiple_of((l // 128) * 128, 128)
            loff = l - l0
            v = out_ref[:, :, pl.ds(l0, 128)]  # (CC, 8, 128) aligned load
            # mask-reduce in the INT domain: several columns are bitcast
            # int32 (C_MODE/C_CF/C_ONF, small ids whose f32 bit patterns are
            # DENORMALS) — a float add flushes them to zero, which turned
            # every exported lane's collision facet into facet 0 (absorbed
            # at reservoir 0). Int adds are bit-exact for every column.
            vi = i32(v)
            v2d = jnp.sum(jnp.where(sub8 == r, vi, 0), axis=1)  # (CC,128)
            col = jnp.sum(
                jnp.where(lane2d == loff, v2d, 0), axis=1, keepdims=True
            )  # (CC,1)
            return jnp.where(laneW2 == d + k, col, acc)

        @pl.when(kept > 0)
        def _export():
            acc_rows = jax.lax.fori_loop(
                0, kept, _extract, jnp.zeros((CC, 2 * W), jnp.int32)
            )
            window = rows_ref[:, pl.ds(a0, 2 * W)]
            rows_ref[:, pl.ds(a0, 2 * W)] = jnp.where(
                (laneW2 >= d) & (laneW2 < d + kept), bc32(acc_rows), window
            )

    @pl.when(b == nb - 1)
    def _fin():
        ledger_ref[:, :] = acc_ref[:, :]
        bins_ref[:, :] = bacc_ref[:, :]


def drift_megastep(
    pool3: jax.Array,  # (C, NR, L) f32 pool in the kernel-native 3-D
    #   layout (L = tile_width(N) // 8, NR = N // L): lane p of attribute c
    #   lives at [c, p // L, p % L]. Carrying THIS layout through the whole
    #   scan removes the two per-step (16, N) <-> blocked retile copies
    #   (0.24 ms/step at N=1.25e6 in the round-3 trace). C = 16 plain, or
    #   24 with the specular-mirror cache as rows 16..23 (sim/state.py X_*
    #   columns + 16) — the COMBINED layout enables the in-kernel specular
    #   fast path with one block spec / one append window for both halves
    T_sv: jax.Array,  # (SV,) f32
    rta_on: jax.Array,  # () i32/bool — apply the deferred RTA this step?
    geo,  # DeviceGeometry (host constants are baked in statically)
    params,
    n_real: int | None = None,  # real pool width (< N only for pad lanes)
    ecap: int = 0,  # event-buffer capacity (128-multiple); 0 -> N // 64
    interpret: bool = False,
    vma=None,
    export_rows: bool = False,  # export full 16-column ROWS instead of
    #   indices (scalar extraction loop — only viable at the mirror fast
    #   path's ~2 pending lanes/tile); w_exp lanes max per tile
    w_exp: int = 128,
    tau_bounds: tuple | None = None,  # (tau_T[0], tau_T[-1]) clamp for the
    #   slope-form lifetime evaluation (mirror path)
    kernel_cast: bool = True,  # False for meshes beyond the in-kernel cast
    #   budget: injections arrive PRE-CAST (sign-encoded C_TCOLL), the
    #   in-kernel periodic/absorb rounds are disabled, and EVERY boundary
    #   event exports to the narrow machinery (which runs the Pallas
    #   large-mesh ray cast, ops/raycast_pallas.py)
    dk: dict | None = None,  # in-kernel diffuse reflection (C = 18 pools):
    #   {'window': (CHT, NB, L) presample pool, 'off': (1,) i32 per-step
    #   block offset, 'seed': () i32 per-step PRNG seed, 'pool': DiffusePool
    #   (static metadata), 'facet_eta'/'facet_row'/'facet_row_back': (F,)
    #   host arrays, 'two_sided': bool} — see sim/diffuse_pool.py
):
    """Returns (pool3' (C, NR, L), evt_buf, pend_counts (nb,) i32,
    alive_counts (nb,) i32, starts (nb,) i32, kept (nb,) i32, ledger (8, 5)
    f32, bins (SV8, 5) f32 raw subvolume sums [e, e*vx, e*vy, e*vz, Np] over
    the lanes that stay in the pool).

    evt_buf: with export_rows=False, (ecap + BN,) i32 ascending event
    indices packed into per-block 128-aligned segments
    [starts[b], starts[b] + kept[b]), sentinel _SENT elsewhere; with
    export_rows=True, (C, ecap + 2*w_exp) f32 — the pending lanes' packed
    POOL ROWS (incl. mirror rows 16..23 when C = 24), TIGHTLY packed
    (valid lanes = [0, sum(kept)), zero rows beyond — consumers gate on
    the kept counts).

    Exported lanes are marked DEAD in pool3' — their live copies ride the
    event buffer and re-enter at the pool tail (sim/fused.py append)."""
    from nanokappa_tpu.constants import HBAR
    from nanokappa_tpu.geometry.domain import BC

    C, NR, L = pool3.shape
    N = NR * L
    bn = tile_width(N)
    assert C in (16, 18, 24) and bn is not None and bn // 8 == L, (
        C, NR, L,
    )
    # C == 18 is EITHER the slim mirror cache OR the in-kernel diffuse pool
    # (rows 16 = |k|^2, 17 = corr bitmask) — the dk parameter disambiguates
    dkern = dk is not None
    if dkern:
        assert C == 18, C
    use_mirror = C >= 18 and not dkern
    slim = C == 18 and not dkern  # slim cache (boundary_tables.slim_mirror_axis)
    bn8 = L
    nb = N // bn
    SV = int(T_sv.shape[0])

    bc_np = np.asarray(geo.facet_bc)
    tables = dict(
        F=int(geo.n_facets),
        is_box=bool(geo.is_box),
        axis=np.asarray(geo.box_axis),
        sign=np.asarray(geo.box_sign),
        plane=np.asarray(geo.box_plane),
        # general (non-box) geometry: the STATIC triangle table for the
        # in-kernel unrolled Möller–Trumbore cast (primitive meshes are
        # 32-96 triangles; v2_eligible caps at TRI_KERNEL_MAX)
        tri_o=np.asarray(geo.tri_origin),
        tri_e1=np.asarray(geo.tri_e1),
        tri_e2=np.asarray(geo.tri_e2),
        tri_f=np.asarray(geo.tri_facet),
        is_absorb=(bc_np == int(BC.TEMPERATURE)) | (bc_np == int(BC.FLUX)),
        is_rough=bc_np == int(BC.ROUGH),
        is_periodic=bc_np == int(BC.PERIODIC),
        value=np.nan_to_num(np.asarray(geo.facet_value)),
        res=np.asarray(geo.facet_res),
        normal=np.asarray(geo.facet_normal),
        shift=np.asarray(geo.periodic_shift),
        pair=np.asarray(geo.periodic_pair),
    )
    center = np.asarray(geo.subvol_center)
    bounds = np.asarray(geo.bounds)
    ax = int(geo.slice_axis)
    c0 = float(center[0, ax]) if SV > 1 else 0.0
    dc = (
        float((center[-1, ax] - center[0, ax]) / (SV - 1)) if SV > 1 else 1.0
    )
    SV8 = max(8, -(-SV // 8) * 8)
    cfg = dict(
        dt=float(params.dt),
        t_reference=float(params.t_reference),
        n_real=int(n_real if n_real is not None else N),
        n_subvols=SV,
        temp_interp=str(params.temp_interp),
        slice_axis=ax,
        c0=c0,
        dc=dc,
        # in-kernel periodic/absorb rounds: multi-event chains are rare
        # (<2% of events) and the XLA buffer handles them generically. With
        # the mirror fast path a SECOND unrolled round resolves 2-bounce
        # chains (specular->specular corner hits, specular->periodic, ...)
        # in-register, cutting both the event export and the narrow
        # machinery's while-loop rounds (0.36 ms/step at N=1.25e6);
        # without it the extra facet-select pass isn't worth it. With
        # kernel_cast off no in-kernel round can run (an event resolution
        # needs a re-cast the kernel cannot do)
        u_rounds=0 if not kernel_cast else (
            2 if (use_mirror or dkern) else 1
        ),
        dkern=dkern,
        interpret=bool(interpret),
        kernel_cast=bool(kernel_cast),
        sv_mode="slice" if geo.subvol_type == "slice" else "nearest",
        # immediate-constant centres only inside the unroll budget; bigger
        # tables ride the SMEM tsv rows 1-3 instead
        centers=tuple(
            (float(c[0]), float(c[1]), float(c[2])) for c in center
        ) if SV <= _UNROLL_SV else (),
        n_reservoirs=int(geo.n_reservoirs),
        hbar=HBAR,
        bn=bn,
        ecap=ecap,
        use_mirror=use_mirror,
        slim=slim,
        n_rows=C,
        export_rows=bool(export_rows),
        w_exp=int(w_exp),
        tau_tmin=float(tau_bounds[0]) if tau_bounds else 0.0,
        tau_tmax=float(tau_bounds[1]) if tau_bounds else 3.0e38,
        sv8=SV8,
        lo_b=float(bounds[0, ax]),
        inv_len=float(SV / (bounds[1, ax] - bounds[0, ax])),
    )
    if dkern:
        dpool = dk["pool"]
        assert dk["window"].shape == (dpool.nb, dpool.chf, 8, L), (
            dk["window"].shape, dpool.nb, dpool.chf, L,
        )
        cfg.update(
            dk_nu=int(dpool.nu),
            dk_chf=int(dpool.chf),
            dk_nbins=int(dpool.n_bins),
            dk_tsplit=float(dpool.t_split),
            dk_tlo=float(max(dpool.t_lo, -3.0e38)),
            dk_thi=float(min(dpool.t_hi, 3.0e38)),
            dk_clamp_lo=float(dpool.t_clamp_lo),
            dk_clamp_hi=float(dpool.t_clamp_hi),
            dk_facet_eta=np.asarray(dk["facet_eta"]),
            dk_facet_row=np.asarray(dk["facet_row"]),
            dk_facet_row_back=np.asarray(dk["facet_row_back"]),
            dk_two_sided=bool(dk["two_sided"]),
        )
    if slim:
        # in-register reflection axis: the single axis-aligned rough-wall
        # family the slim gate (boundary_tables.slim_mirror_axis) verified
        rough_n = np.asarray(geo.facet_normal)[tables["is_rough"]]
        assert len(rough_n) > 0
        fa = int(np.argmax(np.abs(rough_n[0])))
        assert np.all(np.abs(rough_n[:, fa]) == 1.0) and np.all(
            np.abs(np.delete(rough_n, fa, axis=1)) < 1e-12
        ), rough_n
        cfg["flip_axis"] = fa

    SVP = max(128, -(-SV // 128) * 128)
    # row 0: subvolume temperatures; rows 1-3: centre coordinates (read by
    # the fori_loop nearest-centre argmin when SV exceeds the unroll budget)
    tsv = (
        jnp.zeros((4, SVP), jnp.float32)
        .at[0, :SV].set(T_sv)
        .at[1:4, :SV].set(jnp.asarray(center.T, jnp.float32))
    )
    if dkern:
        # rta row also carries the per-step PRNG seed (mixed with the tile
        # index in-kernel)
        rta = jnp.stack(
            [
                jnp.asarray(rta_on, jnp.int32).reshape(()),
                jnp.asarray(dk["seed"], jnp.int32).reshape(()),
            ]
        ).reshape(1, 2)
    else:
        rta = jnp.asarray(rta_on, jnp.int32).reshape(1, 1)
    if ecap <= 0:
        ecap = max(2048, -(-(N // 64) // 128) * 128)
    assert ecap % 128 == 0
    cfg["ecap"] = ecap
    w_exp = -(-int(w_exp) // 128) * 128  # DMA window: whole 128-lane rows
    cfg["w_exp"] = w_exp
    cfg["export_rows"] = bool(export_rows)

    # every index map tolerates the trailing scalar-prefetch ref the dkern
    # path adds (PrefetchScalarGridSpec passes it after the grid indices)
    pool_spec = pl.BlockSpec(
        (C, 8, bn8), lambda b, *_: (0, b, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # T_sv: scalar reads
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pool_spec,
    ]
    operands = [tsv, rta, pool3]
    n_prefetch = 0
    if dkern:
        # presample window: ONE (CHT, 1, L) block per tile, rotated through
        # the (CHT, NB, L) pool by scalar-prefetched per-TILE block indices
        # (the canonical PrefetchScalarGridSpec pattern — index maps stay a
        # plain array read; modulo arithmetic in an index_map is rejected)
        NBd = int(dk["pool"].nb)
        CHFd = int(dk["window"].shape[1])
        in_specs.append(
            pl.BlockSpec(
                (1, CHFd, 8, L),
                lambda b, off_ref: (off_ref[b], 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        blk_off = jax.lax.rem(
            jnp.asarray(dk["off"], jnp.int32).reshape(())
            + jnp.arange(nb, dtype=jnp.int32),
            jnp.int32(NBd),
        )
        operands = [blk_off] + operands
        operands.append(dk["window"])
        n_prefetch = 1
    out_specs = [pool_spec]
    out_shape = [jax.ShapeDtypeStruct((C, NR, L), jnp.float32)]
    # alias the pool operand onto the pool output (operand index counts the
    # scalar-prefetch operand)
    aliases = {2 + n_prefetch: 0}
    out_specs += [
        (
            # rows output: ONE VMEM-resident block revisited by every grid
            # step — rows merge in place, written back once at the end
            pl.BlockSpec(
                (C, ecap + 2 * w_exp), lambda b, *_: (0, 0),
                memory_space=pltpu.VMEM,
            )
            if export_rows
            else pl.BlockSpec(memory_space=pl.ANY)  # evt idx: manual DMA
        ),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # counts: whole array
        pl.BlockSpec((8, 128), lambda b, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (SV8, 128), lambda b, *_: (0, 0), memory_space=pltpu.VMEM
        ),
    ]
    evt_shape = (
        jax.ShapeDtypeStruct((C, ecap + 2 * w_exp), jnp.float32)
        if export_rows
        else jax.ShapeDtypeStruct((1, ecap + bn), jnp.int32)
    )
    out_shape += [
        evt_shape,
        jax.ShapeDtypeStruct((nb, 8), jnp.int32),
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
        jax.ShapeDtypeStruct((SV8, 128), jnp.float32),
    ]
    kw = dict(vma=frozenset(vma)) if vma else {}
    if kw:
        out_shape = [
            jax.ShapeDtypeStruct(o.shape, o.dtype, **kw) for o in out_shape
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=(
            [
                pltpu.VMEM((8, 128), jnp.float32),
                pltpu.VMEM((SV8, 128), jnp.float32),
            ]
            + ([] if export_rows else [pltpu.VMEM((1, bn), jnp.int32)])
            + [
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ]
        ),
    )
    outs = pl.pallas_call(
        partial(_kernel, tables=tables, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        # the pool (and mirror cache) update in place (block b is written
        # only after it is read; the sequential grid never revisits it) —
        # halves the step's pool footprint and lets XLA drop defensive
        # copies
        input_output_aliases=aliases,
        interpret=interpret,
    )(*operands)
    pool_out, evt_buf, cnts, ledger, bins = outs
    return (
        pool_out,
        # (C, ecap + 2*w_exp) packed rows (export_rows) or (ecap + bn,)
        # segmented ascending event indices
        evt_buf if export_rows else evt_buf[0],
        cnts[:, 0],  # full pending-event counts
        cnts[:, 1],  # alive counts
        cnts[:, 2],  # segment starts
        cnts[:, 3],  # kept counts (post-ECAP clamp)
        ledger[:, :5],
        bins[:, :5],  # raw subvolume sums over non-exported lanes
    )
