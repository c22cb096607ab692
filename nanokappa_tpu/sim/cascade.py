"""The boundary-event cascade: drift + absorb/periodic/reflect.

Replaces the reference's data-dependent `while np.any(calculated_ts < 1)` loop
with boolean-mask subsetting and np.delete (classes/Population.py:1546-1683).

TPU architecture: only a few percent of particles hit a boundary per timestep,
so the cascade splits into
  A. one full-width fused drift (everyone advances min(t_coll, remaining)),
  B. a compacted event loop: boundary-hitting particles are gathered into a
     fixed EVT_CAP buffer (cumsum-rank compaction), the absorb/periodic/
     reflect machinery and the re-ray-casts run at buffer width inside a
     bounded lax.while_loop, and results scatter back.
This keeps the expensive machinery (mode-table gathers, alias sampling,
reflection tables) off the 95% of particles that just drift.

Event semantics per round (parity with the reference cascade):
  T/F facet -> particle killed, energy/flux ledgered per reservoir
              (classes/Population.py:1565-1608);
  P facet   -> translated by the facet-pair centroid offset
              (classes/Population.py:1463-1489);
  R facet   -> specular with probability = Ziman specularity (dense
              correspondence-table lookup, occupation conserved) else diffuse
              re-emission from the creation-rate distribution at the local
              wall temperature (classes/Population.py:941-1015), via Walker
              alias sampling.

Particle order and shapes never change; absorbed particles clear the alive
mask and their slots are refilled by reservoir injection next step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nanokappa_tpu.constants import HBAR
from nanokappa_tpu.geometry.device import DeviceGeometry
from nanokappa_tpu.geometry.domain import BC
from nanokappa_tpu.material.tables import MaterialTables
from nanokappa_tpu.ops.raycast import raycast
from nanokappa_tpu.sim.binning import interp_T_particles, subvol_id
from nanokappa_tpu.sim.bose import occupation_delta_T, occupation_delta_omega
from nanokappa_tpu.sim.boundary_tables import BoundaryTables
from nanokappa_tpu.sim.state import SimParams, SimState, STALE

_REMAIN_EPS = 1e-5  # fraction of dt below which the remaining path is dust


def _pad8(n: int) -> int:
    return max(8, -(-n // 8) * 8)


def _compact(mask: jax.Array, cap: int):
    """Indices of True entries, packed to the front of a (cap,) buffer.

    Returns (pidx (cap,) int32 with sentinel N for unused lanes, n_valid).

    Formulated as searchsorted over the running count (index of the j-th True
    element = first position where cumsum reaches j+1): ~log2(N) rounds of
    (cap,)-sized gathers. The scatter formulation (write rank -> index) costs
    ~10 ms at N=1e6 on TPU (dense scatters run at ~1e8 elements/s)."""
    if _COMPACT_IMPL == "pallas" and mask.ndim == 1:
        import jax as _jax

        if _jax.default_backend() != "cpu":  # Pallas TPU kernel
            from nanokappa_tpu.ops.compact import compact_indices_pallas

            return compact_indices_pallas(mask, cap)
    n = mask.shape[0]
    csum = jnp.cumsum(mask.astype(jnp.int32))
    n_valid = jnp.minimum(csum[-1], cap)
    if _COMPACT_IMPL != "scatter":  # searchsorted (also the non-TPU fallback
        # for "pallas": no scatters anywhere)
        j = jnp.arange(cap, dtype=jnp.int32)
        pidx = jnp.searchsorted(csum, j + 1, side="left").astype(jnp.int32)
        pidx = jnp.where(j < n_valid, pidx, n)
        return pidx, n_valid
    rank = csum - 1
    slot = jnp.where(mask & (rank < cap), rank, cap)
    pidx = (
        jnp.full(cap + 1, n, dtype=jnp.int32)
        .at[slot]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")[:cap]
    )
    return pidx, n_valid


_MERGE_IMPL = "pallas"  # "pallas" expand-network kernel | "xla" scatter —
#   back-to-back at N=1e6: pallas 9.7 ms/step vs xla 12.6 ms/step (the XLA
#   row scatter serialises at ~3 ms; ops/scatter_rows.py measured 2.7x
#   faster standalone and fuses better in-program). CPU falls back to xla.


def _merge_rows(packed, rows_out, pidx):
    """Merge event-buffer rows back into the pool at sorted unique pidx."""
    if _MERGE_IMPL == "pallas" and jax.default_backend() != "cpu":
        from nanokappa_tpu.ops.scatter_rows import scatter_rows_sorted

        return scatter_rows_sorted(packed, rows_out, pidx)
    return packed.at[pidx].set(
        rows_out, mode="drop", indices_are_sorted=True, unique_indices=True
    )


_COMPACT_IMPL = "pallas"  # "pallas" (TPU kernel) | "scatter" | "searchsorted".
#   A profile trace showed the scatter formulation's s32[cap] scatter costs
#   7.3 ms/step at N=1.25e6 inside the fused program (XLA lowers it to a
#   serial scatter); the Pallas kernel runs the same compaction in ~25 us.
#   Non-TPU backends fall through to "searchsorted" (0.03 ms, no scatter).


class _Buf(NamedTuple):
    pos: jax.Array  # (E,3)
    mode: jax.Array
    vel: jax.Array
    omega: jax.Array
    tau: jax.Array
    dev: jax.Array
    alive: jax.Array
    t_coll: jax.Array
    coll_facet: jax.Array
    on_facet: jax.Array
    remaining: jax.Array
    ledger: jax.Array  # (R8,5): [energy, flux xyz, absorbed count]
    lost: jax.Array
    key: jax.Array
    round: jax.Array


def run_cascade(
    state: SimState,
    stale_idx: jax.Array,  # (inj_cap,) slot ids needing a ray cast (from the
    #   allocator pop in inject); sentinel N for unused lanes
    geo: DeviceGeometry,
    mat: MaterialTables,
    btab: BoundaryTables,
    params: SimParams,
    key: jax.Array,
    psum=lambda x: x,
    axis_name: str | tuple | None = None,
) -> SimState:
    from nanokappa_tpu.sim.state import (
        C_ALIVE, C_CF, C_DEV, C_MODE, C_OMEGA, C_ONF, C_POS, C_REM, C_SV,
        C_TAU, C_TCOLL, C_VEL,
    )

    dt = params.dt
    N = state.packed.shape[0]
    R = geo.n_reservoirs
    R8 = _pad8(R + 1)
    EVT_CAP = _pad8(params.evt_cap or max(params.inj_cap, N // 16))
    f32 = jnp.float32
    bc32 = lambda a: jax.lax.bitcast_convert_type(a, f32)  # noqa: E731
    i32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731

    def pvary(x):
        # declare loop-carry zeros device-varying over every mesh axis the
        # particle data varies over (they become varying after one round)
        if not axis_name:
            return x
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(x, axis_name, to="varying")
        return jax.lax.pvary(x, axis_name)  # pre-0.9 fallback

    # ---- stale ray casts at the freshly injected slots ------------------------
    # (the allocator pop in inject IS the stale set — no N-wide compaction;
    # one row gather serves position, velocity and excluded facet)
    sidx = stale_idx
    rows_s = jnp.take(state.packed, sidx, axis=0, mode="clip")  # (inj_cap, N_COLS)
    t_b, f_b = raycast(
        geo, rows_s[:, C_POS], rows_s[:, C_VEL], i32(rows_s[:, C_ONF])
    )
    t_coll = state.packed[:, C_TCOLL].at[sidx].set(
        (t_b / dt).astype(f32), mode="drop", unique_indices=True
    )
    coll_facet = state.coll_facet.at[sidx].set(
        f_b, mode="drop", unique_indices=True
    )
    # defensive: any remaining STALE alive entry (e.g. an externally edited
    # state) freezes for this step instead of drifting blindly
    was_stale = state.coll_facet == STALE
    still_stale = state.alive & (coll_facet == STALE)
    t_coll = jnp.where(still_stale, jnp.inf, t_coll)

    # remaining dt fraction: freshly injected slots carry their partial
    # dt_in/dt in C_REM (they are exactly the slots that were STALE before
    # the ray cast above); everyone else alive gets a full step
    remaining = jnp.where(
        was_stale & state.alive,
        state.packed[:, C_REM],
        jnp.where(state.alive, 1.0, 0.0),
    ).astype(f32)

    # ---- phase A: one fused full-width drift ---------------------------------
    step_frac = jnp.where(
        state.alive & ~still_stale, jnp.minimum(t_coll, remaining), 0.0
    )
    step_frac = jnp.where(jnp.isfinite(step_frac), step_frac, remaining)
    step_frac = jnp.where(still_stale, 0.0, step_frac)
    pos = state.pos + state.vel * (dt * step_frac)[:, None]
    t_coll = t_coll - step_frac
    rem_after = jnp.where(state.alive, remaining - step_frac, 0.0)
    event = state.alive & (rem_after > _REMAIN_EPS) & (coll_facet >= 0)

    # one fused elementwise pass rebuilds the packed matrix with the drifted
    # columns (pos, coll_facet, t_coll, rem_after)
    packed = jnp.concatenate(
        [
            pos,  # C_POS
            state.packed[:, C_VEL],
            state.packed[:, C_OMEGA:C_MODE + 1],  # omega, tau, dev, mode
            bc32(coll_facet)[:, None],
            t_coll[:, None],
            state.packed[:, C_ONF][:, None],
            rem_after[:, None],
            state.packed[:, C_ALIVE][:, None],
            state.packed[:, C_SV][:, None],
        ],
        axis=1,
    )

    # ---- phase B: compacted event loop ----------------------------------------
    pidx, n_evt = _compact(event, EVT_CAP)
    n_evt_all = event.sum(dtype=jnp.int32)
    frozen = n_evt_all - n_evt  # events beyond capacity: path frozen this step
    vbuf = jnp.arange(EVT_CAP) < n_evt

    # buffer fill: ONE row gather serves every per-particle field
    # (pidx from _compact is ascending with a sentinel-N tail)
    # mode="clip": jnp.take defaults to 'fill' which returns NaN ROWS for
    # the sentinel lanes — masked everywhere EXCEPT the ledger matmul,
    # where 0 * NaN poisons every segment's flux columns
    rows = jnp.take(packed, pidx, axis=0, indices_are_sorted=True, mode="clip")

    rows_out, ledger, lost_stuck, lost_def, frozen2 = run_event_buffer(
        rows, vbuf, geo, mat, btab, params, key, state.T_sv, R8, pvary,
        evt2_cap=EVT_CAP // 16,  # kinetic buffer: survivors are rare
    )
    buf_alive = rows_out[:, C_ALIVE] > 0.5
    frozen_total = frozen + frozen2 + still_stale.sum(dtype=jnp.int32)

    # pidx ascending + unique (sentinel N lanes drop out of bounds)
    merged = _merge_rows(packed, rows_out, pidx)

    # push freed slots (absorbed / defective / stuck lanes) onto the free list
    freed = vbuf & ~buf_alive
    frank = jnp.cumsum(freed) - 1  # buffer-sized
    n_freed = freed.sum(dtype=jnp.int32)
    fc0 = state.free_count[0]
    fidx = jnp.where(freed, fc0 + frank, N)
    free_list = state.free_list.at[fidx].set(
        pidx, mode="drop", unique_indices=True
    )
    free_count = state.free_count.at[0].add(n_freed)

    ledger = psum(ledger)
    new_state = SimState(
        packed=merged,
        mirror=state.mirror,
        sv_id=state.sv_id,
        T_sv=state.T_sv,
        Np_sv=state.Np_sv,
        T_tau=state.T_tau,
        free_list=free_list,
        free_count=free_count,
        res_counter=state.res_counter,
        n_leaving=ledger[:R, 4].astype(jnp.int32),
        res_energy_balance=state.res_energy_balance - ledger[:R, 0],
        res_heat_flux=state.res_heat_flux + ledger[:R, 1:4],
        lost=state.lost + psum(jnp.stack(
            [jnp.zeros((), jnp.int32), lost_stuck, lost_def]
        )),
        frozen=state.frozen + psum(frozen_total),
        key=state.key,
        step=state.step,
    )
    return new_state


def run_event_buffer(
    rows: jax.Array,  # (E,16) packed rows of pending-event particles
    vbuf: jax.Array,  # (E,) validity mask (False = padding/sentinel lane)
    geo: DeviceGeometry,
    mat: MaterialTables,
    btab: BoundaryTables,
    params: SimParams,
    key: jax.Array,
    T_sv: jax.Array,
    R8: int,
    pvary=lambda x: x,
    evt2_cap: int | None = None,  # width of the rounds-2+ narrow buffer;
    #   None -> E // 4 (the mirror fast path's deep-chain sizing)
):
    """The boundary-event machinery on a fixed-width buffer of packed rows.

    Shared by the v1 cascade (rows gathered by stream compaction) and the
    fused v2 step (rows from the drift kernel's aligned segments). Lanes
    enter sitting on facet C_CF with C_REM > 0; runs one full-width round,
    then re-compacts the few survivors into a narrow buffer for the bounded
    while-loop (reference `while np.any(calculated_ts < 1)`,
    classes/Population.py:1546-1683).

    Returns (rows_out (E,16) with C_ALIVE updated, ledger (R8,5),
    lost_stuck (quarantined after k_max rounds), lost_defective (ray cast
    found no boundary), frozen (narrow-buffer overflow)).
    """
    from nanokappa_tpu.sim.state import (
        C_ALIVE, C_CF, C_DEV, C_MODE, C_OMEGA, C_ONF, C_POS, C_REM, C_SV,
        C_TAU, C_TCOLL, C_VEL,
    )

    E = rows.shape[0]
    f32 = jnp.float32
    bc32 = lambda a: jax.lax.bitcast_convert_type(a, f32)  # noqa: E731
    i32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731

    buf = _Buf(
        pos=rows[:, C_POS],
        mode=i32(rows[:, C_MODE]),
        vel=rows[:, C_VEL],
        omega=rows[:, C_OMEGA],
        tau=rows[:, C_TAU],
        dev=rows[:, C_DEV],
        alive=vbuf,
        t_coll=pvary(jnp.zeros(E, dtype=jnp.float32)),
        coll_facet=jnp.where(vbuf, i32(rows[:, C_CF]), -1),
        on_facet=i32(rows[:, C_ONF]),
        remaining=jnp.where(vbuf, rows[:, C_REM], 0.0),
        ledger=pvary(jnp.zeros((R8, 5), dtype=jnp.float32)),
        lost=pvary(jnp.zeros((), jnp.int32)),
        key=key,
        round=jnp.zeros((), jnp.int32),
    )

    if params.temp_interp == "nearest":
        from nanokappa_tpu.sim.scatter import blend_tau_sv

        tau_sv_blend = blend_tau_sv(mat, T_sv)
    else:
        tau_sv_blend = None
    body = partial(
        _event_round, geo=geo, mat=mat, btab=btab, params=params, R8=R8,
        T_sv=T_sv, tau_sv_blend=tau_sv_blend,
    )

    # ---- round 1 at full buffer width; most events finish here ---------------
    # FORCED-specular lanes (C_TCOLL = -2): the drift mega-kernel's
    # in-register Bernoulli already decided these lanes reflect specularly
    # (ops/megastep.py dkern branch) — honouring the flag instead of
    # redrawing keeps the total specular probability exactly p (a redraw
    # would compose to p^2 / added diffuse mass). Only round 1 sees flags:
    # later rounds are fresh wall hits with fresh decisions.
    forced1 = vbuf & (rows[:, C_TCOLL] < -1.5)
    buf1 = body(buf, forced=forced1)

    # ---- rounds 2+ on a re-compacted narrow buffer (survivors: lanes that
    # hit ANOTHER wall within the same dt. With the in-kernel mirror path
    # the buffer's population is ALREADY the deep-bouncing tail — at 1e7
    # particles ~900 lanes/step survive round 1 (corner grazers bounce many
    # times per dt), and an undersized buffer freezes them EVERY step,
    # accumulating a standing frozen population. E/4 covers the measured
    # tail with ~2x headroom there. On the KINETIC (non-mirror) path E
    # tracks the wall-collision rate and first-bounce events dominate —
    # the 1e6-particle nanowire measures 0 round-1 survivors in 16x26.5k
    # event trials — so callers pass evt2_cap = E//16 (scripts/
    # wire trace: rounds 2+ at E/4 = 16.9k lanes cost 1.15 ms/step for an
    # ~empty buffer). Overflow lanes freeze until the next step, are
    # counted in `frozen`, and the driver's storm adaptation grows
    # evt_cap (and with it this width) on sustained overflow. ---------------
    EVT2 = _pad8(max(evt2_cap if evt2_cap is not None else E // 4, 512))
    surv = buf1.alive & (buf1.remaining > _REMAIN_EPS)
    sidx2, n2 = _compact(surv, EVT2)
    frozen2 = surv.sum(dtype=jnp.int32) - n2  # overflow: stay alive, frozen
    lane2 = jnp.arange(EVT2, dtype=jnp.int32)
    v2 = lane2 < n2

    # ONE (E, 14) row gather instead of ten per-field gathers (each gather
    # is a separial HLO op; the ten cost 1.1 ms/step at the nanowire's
    # EVT2 = 14k vs ~0.1 ms for the packed row form — wire trace,
    # round 3). Int columns ride bitcast f32 through concat/gather/slice —
    # all bit-preserving ops.
    mat14 = jnp.concatenate(
        [
            buf1.pos,  # 0:3
            buf1.vel,  # 3:6
            buf1.omega[:, None],  # 6
            buf1.tau[:, None],  # 7
            buf1.dev[:, None],  # 8
            bc32(buf1.mode)[:, None],  # 9
            bc32(buf1.coll_facet)[:, None],  # 10
            buf1.t_coll[:, None],  # 11
            bc32(buf1.on_facet)[:, None],  # 12
            buf1.remaining[:, None],  # 13
        ],
        axis=1,
    )
    g2 = jnp.take(
        mat14, sidx2, axis=0, indices_are_sorted=True, mode="clip"
    )  # (EVT2, 14)
    buf2 = _Buf(
        pos=g2[:, 0:3],
        mode=i32(g2[:, 9]),
        vel=g2[:, 3:6],
        omega=g2[:, 6],
        tau=g2[:, 7],
        dev=g2[:, 8],
        alive=v2,
        t_coll=jnp.where(v2, g2[:, 11], 0.0),
        coll_facet=jnp.where(v2, i32(g2[:, 10]), -1),
        on_facet=i32(g2[:, 12]),
        remaining=jnp.where(v2, g2[:, 13], 0.0),
        ledger=buf1.ledger,
        lost=buf1.lost,
        key=buf1.key,
        round=buf1.round,
    )

    def cond(b: _Buf):
        return jnp.any(b.alive & (b.remaining > _REMAIN_EPS)) & (
            b.round < params.k_max
        )

    out2 = jax.lax.while_loop(cond, body, buf2)

    # ---- merge narrow results as ONE row scatter into the wide rows ---------
    # (replaces 10 per-field column scatters — XLA serialises each scatter,
    # ~0.5 ms/step at EVT2=2048 measured in the round-2 trace)
    sv_bits = rows[:, C_SV]
    rows_out = jnp.concatenate(
        [
            buf1.pos,  # C_POS
            buf1.vel,  # C_VEL
            buf1.omega[:, None],
            buf1.tau[:, None],
            buf1.dev[:, None],
            bc32(buf1.mode)[:, None],
            bc32(buf1.coll_facet)[:, None],
            buf1.t_coll[:, None],
            bc32(buf1.on_facet)[:, None],
            buf1.remaining[:, None],  # leftover (~0 for finished events)
            buf1.alive.astype(f32)[:, None],
            sv_bits[:, None],  # refreshed by the binning pass
        ],
        axis=1,
    )  # (E, N_COLS)

    # stuck after k_max rounds: quarantine (reference indexes_del_extra,
    # classes/Population.py:1553,1572)
    stuck2 = out2.alive & (out2.remaining > _REMAIN_EPS)
    alive2 = out2.alive & ~stuck2
    lost_stuck = stuck2.sum(dtype=jnp.int32)
    lost_defective = out2.lost  # _Buf.lost accumulates defective lanes only
    rows2 = jnp.concatenate(
        [
            out2.pos,
            out2.vel,
            out2.omega[:, None],
            out2.tau[:, None],
            out2.dev[:, None],
            bc32(out2.mode)[:, None],
            bc32(out2.coll_facet)[:, None],
            out2.t_coll[:, None],
            bc32(out2.on_facet)[:, None],
            out2.remaining[:, None],
            alive2.astype(f32)[:, None],
            jnp.take(
                sv_bits, sidx2, axis=0, indices_are_sorted=True, mode="clip"
            )[:, None],
        ],
        axis=1,
    )  # (EVT2, N_COLS)
    # sidx2 ascending + unique; sentinel lanes (>= E) drop out of bounds
    rows_out = rows_out.at[sidx2].set(
        rows2, mode="drop", indices_are_sorted=True, unique_indices=True
    )
    return rows_out, out2.ledger, lost_stuck, lost_defective, frozen2


def _event_round(
    b: _Buf,
    geo: DeviceGeometry,
    mat: MaterialTables,
    btab: BoundaryTables,
    params: SimParams,
    R8: int,
    T_sv: jax.Array,
    tau_sv_blend: jax.Array | None = None,  # per-step (SV, M) lifetime
    #   table (scatter.blend_tau_sv); None recomputes per call
    forced: jax.Array | None = None,  # lanes whose specular Bernoulli was
    #   already WON in the drift kernel (run_event_buffer round 1 only)
) -> _Buf:
    dt = params.dt
    key = jax.random.fold_in(b.key, b.round)
    # ONE uniform tensor serves specularity, alias slot, alias accept and
    # the degenerate-split draw: each jax.random call is its own threefry
    # op + launch gap, and the narrow stage is op-count bound. The alias
    # slot uses floor(u * M) (2^-24 modulo bias, far below MC noise).
    u4 = jax.random.uniform(key, (b.pos.shape[0], 4))

    # particles in the buffer sit exactly on facet coll_facet with
    # remaining > 0 (t_coll == 0); dead/finished lanes are masked out
    at_wall = b.alive & (b.remaining > _REMAIN_EPS) & (b.t_coll <= 1e-9)
    cf = jnp.clip(b.coll_facet, 0, geo.n_facets - 1)
    at_wall = at_wall & (b.coll_facet >= 0)
    bc = geo.facet_bc[cf]

    # --- absorption at reservoirs (T/F) ----------------------------------------
    absorb = at_wall & ((bc == int(BC.TEMPERATURE)) | (bc == int(BC.FLUX)))
    res_id = geo.facet_res[cf]
    T_res = geo.facet_value[cf]
    dn_abs = b.dev - occupation_delta_T(T_res, params.t_reference, b.omega)
    e_abs = HBAR * b.omega * dn_abs
    n_out = geo.facet_normal[cf]
    vdn = jnp.einsum("nj,nj->n", b.vel, n_out)
    # reference ledger: hflux += e*v/(v.n) (classes/Population.py:1599-1600).
    # The 1/(v.n) obliquity factor diverges for grazing-incidence modes; at
    # production mode-table sizes a single near-tangent absorption overflows
    # f32 and poisons the ledger with inf/NaN. Clamp the obliquity at 1e3x
    # (|v.n| >= 1e-3 |v|): grazing modes almost never cross, so the bias is
    # far below Monte Carlo noise while the sum stays finite.
    vmag = jnp.linalg.norm(b.vel, axis=1)
    vdn_safe = jnp.sign(vdn) * jnp.maximum(jnp.abs(vdn), 1e-3 * vmag)
    flux_w = jnp.where(jnp.abs(vdn_safe) > 1e-30, e_abs / vdn_safe, 0.0)
    seg = jnp.where(absorb & (res_id >= 0), res_id, R8 - 1)
    vals = jnp.stack(
        [
            jnp.where(absorb, e_abs, 0.0),
            jnp.where(absorb, flux_w, 0.0) * b.vel[:, 0],
            jnp.where(absorb, flux_w, 0.0) * b.vel[:, 1],
            jnp.where(absorb, flux_w, 0.0) * b.vel[:, 2],
            absorb.astype(jnp.float32),
        ],
        axis=1,
    )
    from nanokappa_tpu.sim.binning import segment_matmul

    ledger = b.ledger + segment_matmul(vals, seg, R8)
    alive = b.alive & ~absorb
    remaining = jnp.where(absorb, 0.0, b.remaining)

    # --- periodic translation ---------------------------------------------------
    per = at_wall & (bc == int(BC.PERIODIC))
    pos = b.pos + jnp.where(per, 1.0, 0.0)[:, None] * geo.periodic_shift[cf]
    on_facet = jnp.where(per, geo.periodic_pair[cf], b.on_facet)

    # --- rough-wall reflection ---------------------------------------------------
    ref = at_wall & (bc == int(BC.ROUGH))
    i_rough = jnp.clip(geo.facet_rough[cf], 0, btab.row_of_rough.shape[0] - 1)
    if btab.n_rough > 0:
        # internal membranes are two-sided: a back-side hit (arriving
        # velocity against the stored facet normal) uses the table row
        # built for the flipped normal; boundary facets have row_back ==
        # row_of_rough so the select is free there
        row = jnp.where(
            vdn < 0.0, btab.row_back[i_rough], btab.row_of_rough[i_rough]
        )
    else:
        row = jnp.zeros_like(i_rough)
    i32b = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731
    # narrow DECISION gathers from the per-normal tables (2 columns each),
    # then ONE shared (M,4) omega_vel gather for the final mode — the old
    # 8/10-column bundles that carried per-(normal, mode) copies of the
    # outgoing properties cost 1.6 ms/step of gather traffic on the 31^3
    # nanowire (and 18x NU*M*4 bytes of table memory)
    sc = btab.spec2[row, b.mode]  # (E,2) [specularity, bitcast(corr)]
    p_spec = sc[:, 0]
    corr_m = i32b(sc[:, 1])
    u_spec = u4[:, 0]
    bern = u_spec <= p_spec
    if forced is not None:
        bern = bern | forced  # no-corr forced lanes still fall to diffuse,
        #   exactly the reference's always-diffuse rule for unmapped modes
    spec = ref & bern & (corr_m >= 0)
    diff = ref & ~spec

    mode_spec = jnp.where(spec, corr_m, b.mode)

    # diffuse re-emission by Walker alias sampling
    M = btab.diffuse_prob.shape[1]
    j = jnp.minimum((u4[:, 1] * M).astype(jnp.int32), M - 1)
    u = u4[:, 2]
    pa = btab.diff2[row, j]  # (E,2) [alias prob, bitcast(alias idx)]
    accept = u < pa[:, 0]
    mode_diff = jnp.where(accept, j, i32b(pa[:, 1]))

    changed = spec | diff
    if params.scat_model in ("k", "wavevector", "wave_vector"):
        partner = btab.degen_partner[mode_spec]
        u_deg = u4[:, 3]
        swap = spec & (partner >= 0) & (u_deg >= 0.5)
        mode_spec = jnp.where(swap, partner, mode_spec)
    mode = jnp.where(spec, mode_spec, jnp.where(diff, mode_diff, b.mode))
    ov = mat.omega_vel[mode]  # (E,4) hot shared table
    omega_new = jnp.where(changed, ov[:, 0], b.omega)
    vel_new = jnp.where(changed[:, None], ov[:, 1:4], b.vel)

    sv_here = subvol_id(geo, pos)
    T_wall = interp_T_particles(geo, T_sv, pos, sv_here, params.temp_interp)
    from nanokappa_tpu.sim.scatter import lifetime_by_sv, lifetime_lookup

    if params.temp_interp == "nearest":
        # tau_sv_blend precomputed ONCE per step by run_event_buffer —
        # this round runs up to k_max times inside a while_loop, and XLA
        # does not hoist the (SV, M) blend out of it
        tau_new = lifetime_by_sv(mat, T_sv, sv_here, mode, tau_sv=tau_sv_blend)
    else:
        tau_new = lifetime_lookup(mat, T_wall, mode)
    tau_new = jnp.where(changed, tau_new, b.tau)
    dev = jnp.where(
        spec,
        b.dev + occupation_delta_omega(params.t_reference, b.omega, omega_new),
        jnp.where(
            diff,
            occupation_delta_T(T_wall, params.t_reference, omega_new),
            b.dev,
        ),
    )
    on_facet = jnp.where(ref, cf, on_facet)

    # --- re-cast + drift the buffer ----------------------------------------------
    recast = per | ref
    t_ps, facet_new = raycast(geo, pos, vel_new, on_facet)
    t_coll = jnp.where(recast, t_ps / dt, b.t_coll)
    coll_facet = jnp.where(recast, facet_new, b.coll_facet)

    step_frac = jnp.where(
        alive & (remaining > 0), jnp.minimum(t_coll, remaining), 0.0
    )
    step_frac = jnp.where(jnp.isfinite(step_frac), step_frac, remaining)
    pos = pos + vel_new * (dt * step_frac)[:, None]
    t_coll = t_coll - step_frac
    remaining = jnp.maximum(remaining - step_frac, 0.0)
    # defective lanes (no boundary found): drain them like the reference's
    # indexes_del_extra
    bad = alive & (remaining > _REMAIN_EPS) & (coll_facet < 0)
    alive = alive & ~bad
    lost = b.lost + bad.sum(dtype=jnp.int32)
    remaining = jnp.where(bad, 0.0, remaining)

    return _Buf(
        pos=pos,
        mode=mode,
        vel=vel_new,
        omega=omega_new,
        tau=tau_new,
        dev=dev,
        alive=alive,
        t_coll=t_coll,
        coll_facet=coll_facet,
        on_facet=on_facet,
        remaining=remaining,
        ledger=ledger,
        lost=lost,
        key=b.key,
        round=b.round + 1,
    )
