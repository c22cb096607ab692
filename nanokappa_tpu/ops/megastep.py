"""Fused drift mega-kernel: ONE HBM pass over the packed (16, N) state.

The round-2 step made ~5 full-width passes per timestep (drift rebuild,
event-mask compaction, binning, RTA, stale-raycast scatters) plus an XLA
assembly pipeline costing ~2.5 ms at N=1e6. This kernel replaces all of them
with a single tiled pass; per (16, 16384) tile, entirely in VMEM:

  1. deferred RTA relaxation — the previous step's lifetime scattering
     (reference classes/Population.py:1701-1710) applied at the START of the
     next step, which is algebraically identical because neither binning nor
     the ledger reads post-RTA occupations and positions don't move between
     the two points (see sim/fused.py for the full argument),
  2. stale-lane ray cast (fresh injections) against the axis-aligned box
     planes (the box fast path of ops/raycast.py:50-69, unrolled over the
     static facet tables),
  3. drift by min(t_coll, remaining) (reference Population.py:1724-1769),
  4. bounded in-kernel resolution of PERIODIC translations and reservoir
     ABSORPTION (reference Population.py:1463-1489, 1565-1608) — pure
     arithmetic for a box; the energy/flux ledger accumulates on the MXU at
     Precision.HIGHEST,
  5. compaction of the still-pending events (reflections and deep chains)
     into aligned segments of a global event index buffer: only the (1, BN)
     lane-index row moves through the LSB-first log-shift network
     (ops/compact.py's trick), then one XLA row gather pulls the event ROWS —
     the expensive 16-row compaction network never runs,
  6. compaction of dead-slot indices for next step's injection allocator
     (replaces the persistent free-list push scatters).

Sequential-grid trick: each block DMAs a full static BN-wide window of its
compacted indices at its dynamic aligned offset; the overrun garbage past a
segment's aligned end is overwritten by the NEXT block's window (TPU grids
run sequentially), so segments stay densely packed with only sub-128-lane
padding. SMEM scratch carries the running offsets across blocks.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanokappa_tpu.ops.kmath import occupation_delta_T_k, signk
from nanokappa_tpu.sim.state import (
    C_ALIVE, C_CF, C_DEV, C_MODE, C_OMEGA, C_ONF, C_REM, C_SV, C_TAU,
    C_TCOLL, STALE,
)

BN = 16384  # lanes per tile; (16, BN) f32 = 1 MB VMEM
_BIG = 1 << 30
_SENT = 1 << 29  # sentinel index for padding lanes (>= any real N)
_REMAIN_EPS = 1e-5
_T_BACK_DT = -1e-4  # ops/raycast.py:33, in ps


def _iota_lane():
    return jax.lax.broadcasted_iota(jnp.int32, (1, BN), 1)


def _cumsum_lanes(x):
    """Inclusive cumsum of an (1, BN) i32 row (Hillis-Steele over lanes)."""
    lane = _iota_lane()
    c = x
    s = 1
    while s < BN:
        c = c + jnp.where(lane >= s, pltpu.roll(c, s, axis=1), 0)
        s *= 2
    return c


def _compact_row(mask, values, fill):
    """Pack `values` at True lanes of `mask` to the front of the row
    (LSB-first log-shift network, ops/compact.py:36-65). Returns
    (packed (1, BN), count scalar)."""
    lane = _iota_lane()
    c = _cumsum_lanes(mask.astype(jnp.int32))
    count = jnp.sum(mask.astype(jnp.int32))
    delta = jnp.where(mask, lane - (c - 1), _BIG)
    val = values
    s = 1
    while s < BN:
        sh_val = pltpu.roll(val, BN - s, axis=1)  # left-roll by s
        sh_dlt = pltpu.roll(delta, BN - s, axis=1)
        take = (sh_dlt & s) != 0
        stay = (delta & s) == 0
        val = jnp.where(take, sh_val, val)
        delta = jnp.where(take, sh_dlt - s, jnp.where(stay, delta, _BIG))
        s *= 2
    packed = jnp.where(lane < count, val, fill)
    return packed, count


def _box_raycast(pos, vel, exclude, tables, do):
    """In-register axis-aligned box ray cast (ops/raycast.py:50-69 semantics,
    unrolled over the static facet tables). pos/vel: 3x(1,BN); exclude (1,BN)
    i32; `do` masks the lanes that need a cast. Returns (t ps, facet)."""
    best_t = jnp.full((1, BN), jnp.inf, jnp.float32)
    best_f = jnp.full((1, BN), -1, jnp.int32)
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


def _kernel(
    tsv_ref,  # (1, SVP) f32 subvolume temperatures (padded)
    rta_ref,  # (1, 1) i32 SMEM: apply deferred RTA this step?
    in_ref,  # (16, BN) packed tile
    out_ref,  # (16, BN) drifted tile
    evt_hbm,  # (1, EVT_CAP + BN) i32 event slot indices (ANY)
    dead_hbm,  # (1, DEAD_CAP + BN) i32 dead slot indices (ANY)
    seg_ref,  # (4, nb + 1) i32 SMEM: evt start/count, dead start/count
    ledger_ref,  # (8, 128) f32 reservoir ledger [e, fx, fy, fz, count]
    stats_ref,  # (8,) i32 SMEM: [frozen, end_evt, end_dead]
    scratch_i,  # (1, BN) i32 VMEM staging for index DMA
    scratch_d,  # (1, BN) i32 VMEM staging for dead DMA
    acc_ref,  # (8, 128) f32 VMEM ledger accumulator
    sem_e,
    sem_d,
    *,
    tables: dict,
    cfg: dict,
):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    dt = cfg["dt"]
    t_ref = cfg["t_reference"]
    N = cfg["n_cap"]
    EVT_CAP = cfg["evt_cap"]
    DEAD_CAP = cfg["dead_cap"]
    R8 = 8

    @pl.when(b == 0)
    def _init():
        stats_ref[0] = 0  # frozen
        seg_ref[0, 0] = 0
        seg_ref[2, 0] = 0
        acc_ref[:, :] = jnp.zeros((8, 128), jnp.float32)

    lane = _iota_lane()
    gidx = b * BN + lane
    in_pool = gidx < N

    tile = in_ref[:, :]
    f32 = jnp.float32
    i32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731
    bc32 = lambda a: jax.lax.bitcast_convert_type(a, f32)  # noqa: E731

    px = tile[0:1, :]
    py = tile[1:2, :]
    pz = tile[2:3, :]
    vx = tile[3:4, :]
    vy = tile[4:5, :]
    vz = tile[5:6, :]
    omega = tile[C_OMEGA:C_OMEGA + 1, :]
    tau = tile[C_TAU:C_TAU + 1, :]
    dev = tile[C_DEV:C_DEV + 1, :]
    mode_b = tile[C_MODE:C_MODE + 1, :]  # opaque bits, passed through
    cf = i32(tile[C_CF:C_CF + 1, :])
    t_coll = tile[C_TCOLL:C_TCOLL + 1, :]
    onf = i32(tile[C_ONF:C_ONF + 1, :])
    rem_col = tile[C_REM:C_REM + 1, :]
    alive = (tile[C_ALIVE:C_ALIVE + 1, :] > 0.5) & in_pool
    sv = i32(tile[C_SV:C_SV + 1, :])

    # remaining dt fraction: frozen lanes resume their leftover, fresh
    # injections carry dt_in/dt, everyone else gets a full step
    rem = jnp.where(
        rem_col > _REMAIN_EPS, rem_col, jnp.where(alive, 1.0, 0.0)
    )

    # ---- 1. deferred RTA (previous step's lifetime scattering) -------------
    # skipped for STALE lanes (injected THIS step — they did not exist when
    # the deferred update was due) and on the very first step (rta_ref == 0)
    SV = cfg["n_subvols"]
    sv_c = jnp.clip(sv, 0, SV - 1)
    if cfg["temp_interp"] == "linear":
        # uniform slice centres: index arithmetic + lerp with extrapolation
        # (sim/binning.py:49-59)
        ax = cfg["slice_axis"]
        pa = (px, py, pz)[ax]
        fpos = (pa - cfg["c0"]) / cfg["dc"]
        ilo = jnp.clip(fpos.astype(jnp.int32), 0, SV - 2)
        ilo = jnp.where(fpos < 0, 0, ilo)
        w = fpos - ilo.astype(f32)
        T_lo = jnp.zeros((1, BN), f32)
        T_hi = jnp.zeros((1, BN), f32)
        for s in range(SV):
            tv = tsv_ref[0, s]
            T_lo = jnp.where(ilo == s, tv, T_lo)
            T_hi = jnp.where(ilo + 1 == s, tv, T_hi)
        T_p = T_lo * (1.0 - w) + T_hi * w
    else:  # nearest
        T_p = jnp.zeros((1, BN), f32)
        for s in range(SV):
            T_p = jnp.where(sv_c == s, tsv_ref[0, s], T_p)

    g = occupation_delta_T_k(T_p, t_ref, omega)
    decay = jnp.where(tau > 0, jnp.exp(-dt / jnp.maximum(tau, 1e-12)), 0.0)
    do_rta = alive & (cf != STALE) & (rta_ref[0, 0] > 0)
    dev = jnp.where(do_rta, g + (dev - g) * decay, dev)

    # ---- 2. stale-lane ray cast (fresh injections sit on their facet) ------
    stale = alive & (cf == STALE)
    t_b, f_b = _box_raycast((px, py, pz), (vx, vy, vz), onf, tables, stale)
    t_coll = jnp.where(stale, t_b / dt, t_coll)
    cf = jnp.where(stale, f_b, cf)

    # ---- 3. drift ----------------------------------------------------------
    sf = jnp.where(alive, jnp.minimum(t_coll, rem), 0.0)
    sf = jnp.where(sf < 1e30, sf, rem)  # isfinite: Mosaic-safe
    px = px + vx * (dt * sf)
    py = py + vy * (dt * sf)
    pz = pz + vz * (dt * sf)
    t_coll = t_coll - sf
    rem = jnp.where(alive, jnp.maximum(rem - sf, 0.0), 0.0)

    # ---- 4. in-kernel periodic / absorb rounds -----------------------------
    led_e = jnp.zeros((1, BN), f32)
    led_fx = jnp.zeros((1, BN), f32)
    led_fy = jnp.zeros((1, BN), f32)
    led_fz = jnp.zeros((1, BN), f32)
    led_n = jnp.zeros((1, BN), f32)
    led_seg = jnp.full((1, BN), R8 - 1, jnp.int32)

    F = tables["F"]
    for _round in range(cfg["u_rounds"]):
        pend = alive & (rem > _REMAIN_EPS) & (cf >= 0) & (t_coll <= 1e-9)

        # facet properties by static unroll
        is_abs = jnp.zeros((1, BN), bool)
        is_per = jnp.zeros((1, BN), bool)
        T_res = jnp.zeros((1, BN), f32)
        res_id = jnp.zeros((1, BN), jnp.int32)
        shx = jnp.zeros((1, BN), f32)
        shy = jnp.zeros((1, BN), f32)
        shz = jnp.zeros((1, BN), f32)
        pair = jnp.full((1, BN), -1, jnp.int32)
        nx = jnp.zeros((1, BN), f32)
        ny = jnp.zeros((1, BN), f32)
        nz = jnp.zeros((1, BN), f32)
        for f in range(F):
            sel = cf == f
            if tables["is_absorb"][f]:
                is_abs = is_abs | sel
                T_res = jnp.where(sel, float(tables["value"][f]), T_res)
                res_id = jnp.where(sel, int(tables["res"][f]), res_id)
                nrm = tables["normal"][f]
                nx = jnp.where(sel, float(nrm[0]), nx)
                ny = jnp.where(sel, float(nrm[1]), ny)
                nz = jnp.where(sel, float(nrm[2]), nz)
            if tables["is_periodic"][f]:
                is_per = is_per | sel
                sh = tables["shift"][f]
                shx = jnp.where(sel, float(sh[0]), shx)
                shy = jnp.where(sel, float(sh[1]), shy)
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

        # periodic translation + re-cast + drift (Population.py:1463-1489)
        per = pend & is_per
        px = px + jnp.where(per, shx, 0.0)
        py = py + jnp.where(per, shy, 0.0)
        pz = pz + jnp.where(per, shz, 0.0)
        onf = jnp.where(per, pair, onf)
        t_b, f_b = _box_raycast((px, py, pz), (vx, vy, vz), onf, tables, per)
        t_coll = jnp.where(per, t_b / dt, t_coll)
        cf = jnp.where(per, f_b, cf)
        sf = jnp.where(per & alive, jnp.minimum(t_coll, rem), 0.0)
        sf = jnp.where(sf < 1e30, sf, jnp.where(per, rem, 0.0))
        px = px + vx * (dt * sf)
        py = py + vy * (dt * sf)
        pz = pz + vz * (dt * sf)
        t_coll = t_coll - sf
        rem = jnp.where(per, jnp.maximum(rem - sf, 0.0), rem)

    # MXU ledger reduction (exact f32: Precision.HIGHEST)
    if cfg["n_reservoirs"] > 0:
        oh = (
            led_seg == jax.lax.broadcasted_iota(jnp.int32, (R8, BN), 0)
        ).astype(f32)
        vals = jnp.concatenate([led_e, led_fx, led_fy, led_fz, led_n], axis=0)
        led = jax.lax.dot_general(
            oh, vals, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (R8, 5)
        acc_ref[:, :] = acc_ref[:, :] + jnp.concatenate(
            [led, jnp.zeros((R8, 128 - 5), jnp.float32)], axis=1
        )

    # ---- 5. pending events -> aligned index segments -----------------------
    pend = alive & (rem > _REMAIN_EPS) & (cf >= 0) & (t_coll <= 1e-9)
    evt_packed, evt_cnt = _compact_row(pend, gidx, _SENT)
    ea = seg_ref[0, b]  # running aligned offset (written by block b-1)
    seg_ref[1, b] = evt_cnt
    write_evt = ea < EVT_CAP

    @pl.when(write_evt)
    def _dma_evt():
        scratch_i[:, :] = evt_packed
        cp = pltpu.make_async_copy(
            scratch_i,
            evt_hbm.at[:, pl.ds(pl.multiple_of(ea, 128), BN)],
            sem_e,
        )
        cp.start()
        cp.wait()

    # lanes that did not make it below EVT_CAP freeze until next step (their
    # packed rows keep the pending state)
    wrote = jnp.where(
        write_evt, jnp.minimum(evt_cnt, EVT_CAP - ea), 0
    )
    stats_ref[0] = stats_ref[0] + (evt_cnt - wrote)
    ea_next = jnp.where(
        write_evt, ea + ((evt_cnt + 127) // 128) * 128, ea
    )
    seg_ref[0, b + 1] = ea_next

    # ---- 6. dead slots for next step's injection ---------------------------
    dead = (~alive) & in_pool
    dead_packed, dead_cnt = _compact_row(dead, gidx, _SENT)
    da = seg_ref[2, b]
    seg_ref[3, b] = dead_cnt
    write_dead = da < DEAD_CAP

    @pl.when(write_dead)
    def _dma_dead():
        scratch_d[:, :] = dead_packed
        cp = pltpu.make_async_copy(
            scratch_d,
            dead_hbm.at[:, pl.ds(pl.multiple_of(da, 128), BN)],
            sem_d,
        )
        cp.start()
        cp.wait()

    da_next = jnp.where(
        write_dead, da + ((dead_cnt + 127) // 128) * 128, da
    )
    seg_ref[2, b + 1] = da_next

    # ---- 7. write the drifted tile -----------------------------------------
    out = jnp.concatenate(
        [
            px, py, pz, vx, vy, vz, omega, tau, dev, mode_b,
            bc32(cf), t_coll, bc32(onf), rem,
            jnp.where(alive, 1.0, 0.0),
            bc32(sv),
        ],
        axis=0,
    )
    out_ref[:, :] = out

    @pl.when(b == nb - 1)
    def _fin():
        ledger_ref[:, :] = acc_ref[:, :]
        stats_ref[1] = ea_next
        stats_ref[2] = da_next


def drift_megastep(
    packedT: jax.Array,  # (16, N) f32 transposed packed pool
    T_sv: jax.Array,  # (SV,) f32
    rta_on: jax.Array,  # () i32/bool — apply the deferred RTA this step?
    geo,  # DeviceGeometry (host constants are baked in statically)
    params,
    evt_cap: int,
    dead_cap: int,
    interpret: bool = False,
    vma=None,
):
    """Returns (packedT', evt_idx (EVT_CAP,) i32, evt_starts (nb+1,),
    evt_counts (nb,), dead_idx (DEAD_CAP,), dead_starts (nb+1,),
    dead_counts (nb,), ledger (8,5) f32, frozen ()). Sentinel indices are
    _SENT (>= any N)."""
    from nanokappa_tpu.constants import HBAR
    from nanokappa_tpu.geometry.domain import BC

    C, N = packedT.shape
    assert C == 16
    nb = -(-N // BN)
    SV = int(T_sv.shape[0])

    bc_np = np.asarray(geo.facet_bc)
    tables = dict(
        F=int(geo.n_facets),
        axis=np.asarray(geo.box_axis),
        sign=np.asarray(geo.box_sign),
        plane=np.asarray(geo.box_plane),
        is_absorb=(bc_np == int(BC.TEMPERATURE)) | (bc_np == int(BC.FLUX)),
        is_periodic=bc_np == int(BC.PERIODIC),
        value=np.nan_to_num(np.asarray(geo.facet_value)),
        res=np.asarray(geo.facet_res),
        normal=np.asarray(geo.facet_normal),
        shift=np.asarray(geo.periodic_shift),
        pair=np.asarray(geo.periodic_pair),
    )
    center = np.asarray(geo.subvol_center)
    ax = int(geo.slice_axis)
    c0 = float(center[0, ax]) if SV > 1 else 0.0
    dc = (
        float((center[-1, ax] - center[0, ax]) / (SV - 1)) if SV > 1 else 1.0
    )
    cfg = dict(
        dt=float(params.dt),
        t_reference=float(params.t_reference),
        n_cap=N,
        evt_cap=evt_cap,
        dead_cap=dead_cap,
        n_subvols=SV,
        temp_interp=str(params.temp_interp),
        slice_axis=ax,
        c0=c0,
        dc=dc,
        u_rounds=2,
        n_reservoirs=int(geo.n_reservoirs),
        hbar=HBAR,
    )

    SVP = max(128, -(-SV // 128) * 128)
    tsv = jnp.zeros((1, SVP), jnp.float32).at[0, :SV].set(T_sv)
    rta = jnp.asarray(rta_on, jnp.int32).reshape(1, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # T_sv: scalar reads
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((16, BN), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, BN), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, BN), jnp.int32),
            pltpu.VMEM((1, BN), jnp.int32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kw = dict(vma=frozenset(vma)) if vma else {}
    outs = pl.pallas_call(
        partial(_kernel, tables=tables, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((16, nb * BN), jnp.float32, **kw),
            jax.ShapeDtypeStruct((1, evt_cap + BN), jnp.int32, **kw),
            jax.ShapeDtypeStruct((1, dead_cap + BN), jnp.int32, **kw),
            jax.ShapeDtypeStruct((4, nb + 1), jnp.int32, **kw),
            jax.ShapeDtypeStruct((8, 128), jnp.float32, **kw),
            jax.ShapeDtypeStruct((8,), jnp.int32, **kw),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tsv, rta, packedT)
    packed_out, evt_idx, dead_idx, seg, ledger, stats = outs
    return (
        packed_out[:, :N],
        evt_idx[0, :evt_cap],
        seg[0],  # evt aligned starts (nb+1)
        seg[1, :nb],  # evt counts
        dead_idx[0, :dead_cap],
        seg[2],  # dead aligned starts
        seg[3, :nb],  # dead counts
        ledger[:, :5],
        stats[0],  # frozen
    )
