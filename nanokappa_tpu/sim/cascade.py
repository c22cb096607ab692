"""The boundary-event cascade: drift + absorb/periodic/reflect, fully masked.

Replaces the reference's data-dependent `while np.any(calculated_ts < 1)` loop
with boolean-mask subsetting and np.delete (classes/Population.py:1546-1683)
by a bounded `lax.while_loop` over full-width masked updates:

  round:  I.  particles whose cached collision happens within the remaining
              time fraction move to the collision point;
          II. by facet condition: T/F -> killed, ledgered per reservoir;
              P -> translated to the paired facet; R -> specular (dense
              correspondence-table lookup) or diffuse (per-row roulette)
              re-emission;
          III.everyone else drifts out their remaining fraction;
          IV. translated/reflected particles are ray cast again.

Particle order and shapes never change; absorbed particles simply clear the
alive mask (their slots are refilled by reservoir injection next step).

TPU specifics: group velocity / omega are read from the per-particle cache
(state.vel/state.omega) rather than gathered from the (M,) mode tables every
round; the reservoir ledgers reduce through ONE segment_sum with the segment
count padded to a lane-friendly multiple of 8.
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
from nanokappa_tpu.sim.binning import interp_T_particles
from nanokappa_tpu.sim.bose import occupation_delta_T, occupation_delta_omega
from nanokappa_tpu.sim.boundary_tables import BoundaryTables
from nanokappa_tpu.sim.state import SimParams, SimState, STALE

_REMAIN_EPS = 1e-5  # fraction of dt below which the remaining path is dust


def _pad8(n: int) -> int:
    return max(8, -(-n // 8) * 8)


class _Carry(NamedTuple):
    pos: jax.Array
    mode: jax.Array
    vel: jax.Array
    omega: jax.Array
    dev: jax.Array
    alive: jax.Array
    t_coll: jax.Array
    coll_facet: jax.Array
    on_facet: jax.Array
    remaining: jax.Array
    T_sv: jax.Array  # (SV,) pre-step subvolume temperatures (constant here)
    ledger: jax.Array  # (R8, 5): [energy, flux xyz, absorbed count]
    lost: jax.Array  # ()
    key: jax.Array
    round: jax.Array  # ()


def run_cascade(
    state: SimState,
    remaining: jax.Array,  # (N,) time fraction each particle must travel
    on_facet: jax.Array,  # (N,) facet each particle stands on (-1 interior)
    geo: DeviceGeometry,
    mat: MaterialTables,
    btab: BoundaryTables,
    params: SimParams,
    key: jax.Array,
    psum=lambda x: x,
    axis_name: str | None = None,
) -> SimState:
    dt = params.dt
    R = geo.n_reservoirs
    R8 = _pad8(R + 1)

    def pvary(x):
        # inside shard_map the ledger accumulators start replicated but become
        # device-varying after one round; declare them varying up front so the
        # while_loop carry type is stable
        return jax.lax.pvary(x, axis_name) if axis_name else x

    # refresh stale ray casts (fresh injections / first step / resamples)
    stale = (state.coll_facet == STALE) & state.alive
    t_ps, facet = raycast(geo, state.pos, state.vel, on_facet)
    t_coll = jnp.where(stale, t_ps / dt, state.t_coll)
    coll_facet = jnp.where(stale, facet, state.coll_facet)

    carry = _Carry(
        pos=state.pos,
        mode=state.mode,
        vel=state.vel,
        omega=state.omega,
        dev=state.dev,
        alive=state.alive,
        t_coll=t_coll.astype(jnp.float32),
        coll_facet=coll_facet,
        on_facet=on_facet,
        remaining=remaining,
        T_sv=state.T_sv,
        ledger=pvary(jnp.zeros((R8, 5), dtype=jnp.float32)),
        lost=pvary(jnp.zeros((), jnp.int32)),
        key=key,
        round=jnp.zeros((), jnp.int32),
    )

    def cond(c: _Carry):
        return jnp.any(c.alive & (c.remaining > _REMAIN_EPS)) & (
            c.round < params.k_max
        )

    body = partial(
        _cascade_round, geo=geo, mat=mat, btab=btab, params=params, R8=R8
    )
    out = jax.lax.while_loop(cond, body, carry)

    # particles that ran out of rounds: quarantine like the reference's
    # indexes_del_extra (classes/Population.py:1553,1572)
    stuck = out.alive & (out.remaining > _REMAIN_EPS)
    alive = out.alive & ~stuck
    lost = out.lost + stuck.sum(dtype=jnp.int32)

    # all-reduce the per-shard ledger deltas AFTER the data-dependent loop so
    # no collective ever sits inside the while_loop body (shards may run a
    # different number of rounds)
    ledger = psum(out.ledger)
    lost_d = psum(lost)

    return SimState(
        pos=out.pos,
        mode=out.mode,
        vel=out.vel,
        omega=out.omega,
        dev=out.dev,
        alive=alive,
        t_coll=out.t_coll,
        coll_facet=out.coll_facet,
        sv_id=state.sv_id,
        T_sv=state.T_sv,
        Np_sv=state.Np_sv,
        res_counter=state.res_counter,
        n_leaving=ledger[:R, 4].astype(jnp.int32),
        res_energy_balance=state.res_energy_balance - ledger[:R, 0],
        res_heat_flux=state.res_heat_flux + ledger[:R, 1:4],
        lost=state.lost + lost_d,
        key=state.key,
        step=state.step,
    )


def _cascade_round(
    c: _Carry,
    geo: DeviceGeometry,
    mat: MaterialTables,
    btab: BoundaryTables,
    params: SimParams,
    R8: int,
) -> _Carry:
    dt = params.dt
    key = jax.random.fold_in(c.key, c.round)
    k_spec, k_diff, k_deg = jax.random.split(key, 3)

    active = c.alive & (c.remaining > _REMAIN_EPS)
    defective = active & (c.coll_facet == -1)  # ray cast found no boundary
    hit = active & ~defective & (c.t_coll < c.remaining)
    drift_only = active & ~defective & ~hit

    # --- III. pure drift: advance the remaining fraction -----------------------
    pos = c.pos + c.vel * (dt * jnp.where(drift_only, c.remaining, 0.0))[:, None]
    t_coll = jnp.where(drift_only, c.t_coll - c.remaining, c.t_coll)
    remaining = jnp.where(drift_only, 0.0, c.remaining)

    # defective particles: quarantine (reference deletes them and counts them
    # as leaving, classes/Population.py:1572-1586)
    alive = c.alive & ~defective
    lost = c.lost + defective.sum(dtype=jnp.int32)

    # --- move hit particles to their collision point ---------------------------
    pos = pos + c.vel * (dt * jnp.where(hit, c.t_coll, 0.0))[:, None]
    remaining = jnp.where(hit, remaining - c.t_coll, remaining)

    cf = jnp.clip(c.coll_facet, 0, geo.n_facets - 1)
    bc = geo.facet_bc[cf]

    # --- I. absorption at reservoirs (T / F) -----------------------------------
    absorb = hit & ((bc == int(BC.TEMPERATURE)) | (bc == int(BC.FLUX)))
    res_id = geo.facet_res[cf]
    T_res = geo.facet_value[cf]
    dn_abs = c.dev - occupation_delta_T(T_res, params.t_reference, c.omega)
    e_abs = HBAR * c.omega * dn_abs
    n_out = geo.facet_normal[cf]
    vdn = jnp.einsum("nj,nj->n", c.vel, n_out)
    flux_w = jnp.where(jnp.abs(vdn) > 1e-12, e_abs / vdn, 0.0)
    seg = jnp.where(absorb & (res_id >= 0), res_id, R8 - 1)
    vals = jnp.stack(
        [
            jnp.where(absorb, e_abs, 0.0),
            jnp.where(absorb, flux_w, 0.0) * c.vel[:, 0],
            jnp.where(absorb, flux_w, 0.0) * c.vel[:, 1],
            jnp.where(absorb, flux_w, 0.0) * c.vel[:, 2],
            absorb.astype(jnp.float32),
        ],
        axis=1,
    )  # (N,5)
    ledger = c.ledger + jax.ops.segment_sum(vals, seg, num_segments=R8)
    alive = alive & ~absorb
    remaining = jnp.where(absorb, 0.0, remaining)

    # --- II.a periodic translation (classes/Population.py:1463-1489) -----------
    per = hit & (bc == int(BC.PERIODIC))
    pos = pos + jnp.where(per, 1.0, 0.0)[:, None] * geo.periodic_shift[cf]
    on_facet = jnp.where(per, geo.periodic_pair[cf], c.on_facet)

    # --- II.b rough-wall reflection (classes/Population.py:941-1015) -----------
    ref = hit & (bc == int(BC.ROUGH))
    i_rough = jnp.clip(geo.facet_rough[cf], 0, btab.row_of_rough.shape[0] - 1)
    row = (
        btab.row_of_rough[i_rough]
        if btab.n_rough > 0
        else jnp.zeros_like(i_rough)
    )
    p_spec = btab.specularity[row, c.mode]
    corr_m = btab.corr[row, c.mode]
    u_spec = jax.random.uniform(k_spec, p_spec.shape)
    spec = ref & (u_spec <= p_spec) & (corr_m >= 0)
    diff = ref & ~spec

    # specular: table lookup; occupation number is conserved, so the stored
    # deviation shifts by the reference-occupation difference of the two modes
    mode_spec = jnp.where(spec, corr_m, c.mode)
    if params.scat_model in ("k", "wavevector", "wave_vector"):
        partner = btab.degen_partner[mode_spec]
        u_deg = jax.random.uniform(k_deg, partner.shape)
        swap = spec & (partner >= 0) & (u_deg >= 0.5)
        mode_spec = jnp.where(swap, partner, mode_spec)

    # diffuse: roulette over the facet's creation CDF (one searchsorted per
    # unique table row), occupation at the local wall temperature
    u_diff = jax.random.uniform(k_diff, p_spec.shape)
    mode_diff = c.mode
    for r in range(btab.n_rows):
        m_r = jnp.searchsorted(btab.diffuse_cdf[r], u_diff).astype(jnp.int32)
        m_r = jnp.minimum(m_r, btab.diffuse_cdf.shape[1] - 1)
        mode_diff = jnp.where(diff & (row == r), m_r, mode_diff)

    changed = spec | diff
    mode = jnp.where(spec, mode_spec, jnp.where(diff, mode_diff, c.mode))
    omega_new = jnp.where(changed, mat.omega[mode], c.omega)
    vel_new = jnp.where(changed[:, None], mat.velocity[mode], c.vel)

    sv_here = _subvol_of(geo, pos)
    T_wall = interp_T_particles(geo, c.T_sv, pos, sv_here, params.temp_interp)
    dev = jnp.where(
        spec,
        c.dev + occupation_delta_omega(params.t_reference, c.omega, omega_new),
        jnp.where(
            diff,
            occupation_delta_T(T_wall, params.t_reference, omega_new),
            c.dev,
        ),
    )
    on_facet = jnp.where(ref, cf, on_facet)

    # --- IV. re-cast translated/reflected particles ----------------------------
    recast = per | ref
    t_ps, facet_new = raycast(geo, pos, vel_new, on_facet)
    t_coll = jnp.where(recast, t_ps / dt, t_coll)
    coll_facet = jnp.where(recast, facet_new, c.coll_facet)

    return _Carry(
        pos=pos,
        mode=mode,
        vel=vel_new,
        omega=omega_new,
        dev=dev,
        alive=alive,
        t_coll=t_coll,
        coll_facet=coll_facet,
        on_facet=on_facet,
        remaining=jnp.maximum(remaining, 0.0),
        T_sv=c.T_sv,
        ledger=ledger,
        lost=lost,
        key=c.key,
        round=c.round + 1,
    )


def _subvol_of(geo: DeviceGeometry, pos: jax.Array) -> jax.Array:
    from nanokappa_tpu.sim.binning import subvol_id

    return subvol_id(geo, pos)
