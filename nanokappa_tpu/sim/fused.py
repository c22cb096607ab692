"""The fused (v2) timestep: two Pallas HBM passes + a narrow event stage.

Reference semantics preserved (classes/Population.py:1724-1769 run_timestep):
injection -> drift + boundary cascade -> binning/temperature refresh -> RTA.
The implementation reorders ONE thing: the RTA lifetime scattering of step k
is applied at the START of step k+1's drift kernel ("deferred RTA"). This is
algebraically identical because

  * binning and the reservoir ledger never read post-RTA occupations (heat
    flux uses pre-scatter energies, Population.py:1754-1763),
  * nothing moves or scatters between the end of step k's binning and the
    start of step k+1's drift, so the T_p interpolation sees the same
    positions and the same (stored) T_sv profile,
  * particles injected at step k+1 are excluded (they carry C_CF == STALE
    when the kernel runs) and receive their first RTA at step k+2 — exactly
    one application per lived step, like the reference.

The driver applies the one pending RTA with `make_finalize` before writing
particle data, so checkpoints match the reference bit-for-bit in ordering.

Pipeline per step:
  1. reservoir injection (sim/reservoir.py) writes STALE rows into dead
     slots taken from the previous kernel pass's dead-slot scan,
  2. ops/megastep.py drift kernel: deferred RTA + stale ray cast + drift +
     in-kernel periodic/absorb + event/dead index compaction (ONE pass),
  3. the narrow event machinery (sim/cascade.py run_event_buffer) handles
     reflections and deep chains on the gathered event rows,
  4. ops/merge_bin.py merges results back and computes subvolume binning in
     the same pass,
  5. an O(SV) postlude inverts T(E) and assembles StepOutputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nanokappa_tpu.constants import EVPSA2_IN_WM2
from nanokappa_tpu.geometry.device import DeviceGeometry
from nanokappa_tpu.material.tables import MaterialTables
from nanokappa_tpu.sim.binning import lookup_E_of_T, lookup_T_of_E
from nanokappa_tpu.sim.boundary_tables import BoundaryTables
from nanokappa_tpu.sim.cascade import _pad8, run_event_buffer
from nanokappa_tpu.sim.reservoir import ReservoirTables, inject
from nanokappa_tpu.sim.state import C_SV, SimParams, SimState


def v2_eligible(geo: DeviceGeometry, params: SimParams) -> bool:
    """The fused step covers the production envelope: axis-aligned box
    geometry + slice subvolumes + nearest/linear interpolation. Everything
    else (imported STL, voronoi/grid subvolumes, radial RBF interpolation,
    debug ablations) runs the v1 step."""
    if params.step_impl == "v1" or params.debug_skip:
        return False
    if not geo.is_box or geo.subvol_type != "slice":
        return False
    if params.temp_interp not in ("nearest", "linear"):
        return False
    if geo.n_subvols > 64 or geo.n_reservoirs > 7:
        return False
    if params.step_impl == "v2":
        return True
    return jax.default_backend() != "cpu"


def make_step_v2(
    geo: DeviceGeometry,
    mat: MaterialTables,
    btab: BoundaryTables,
    rtab: ReservoirTables,
    params: SimParams,
    axis_name: str | None = None,
    vary_axes: tuple | None = None,
):
    from nanokappa_tpu.ops.megastep import _SENT, drift_megastep
    from nanokappa_tpu.ops.merge_bin import merge_bin
    from nanokappa_tpu.sim.step import StepOutputs

    interpret = jax.default_backend() == "cpu"

    if axis_name is None:
        psum = lambda x: x  # noqa: E731

        def shard_idx():
            return 0
    else:
        psum = lambda x: jax.lax.psum(x, axis_name)  # noqa: E731

        def shard_idx():
            return jax.lax.axis_index(axis_name)

    vary = vary_axes if vary_axes is not None else (axis_name,) if axis_name else None

    def pvary(x):
        if not vary:
            return x
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(x, vary, to="varying")
        return jax.lax.pvary(x, vary)

    R = geo.n_reservoirs
    R8 = _pad8(R + 1)
    SV = geo.n_subvols

    def step(state: SimState, _=None):
        from nanokappa_tpu.ops.megastep import BN

        N = state.packed.shape[0]
        # the v2 buffer only holds REFLECTIONS and deep chains (periodic and
        # absorbing events resolve inside the drift kernel), so the default
        # is half the v1 event-buffer default, plus per-block alignment slack
        EVT_CAP = -(-(params.evt_cap or max(params.inj_cap, N // 32)) // 128) * 128
        nb = -(-N // BN)
        DEAD_CAP = nb * BN  # full pool: see the rotation note below
        key = jax.random.fold_in(state.key, state.step)
        key = jax.random.fold_in(key, shard_idx())
        k_inj, k_casc = jax.random.split(key)

        # 1. reservoir injection into last pass's dead slots
        state, _stale = inject(
            state, geo, mat, rtab, params, k_inj, shard_idx(), psum
        )

        # 2. drift mega-kernel (one full HBM pass)
        (
            packedT,
            evt_idx,
            estarts,
            ecounts,
            dead_idx,
            dstarts,
            dcounts,
            kledger,
            frozen_k,
        ) = drift_megastep(
            state.packed.T, state.T_sv, state.step > 0, geo, params,
            EVT_CAP, DEAD_CAP, interpret=interpret, vma=vary,
        )

        # clamp segments to the static buffer (overflow lanes froze in-kernel)
        estarts_c = jnp.minimum(estarts, EVT_CAP)
        ecounts_c = jnp.clip(ecounts, 0, EVT_CAP - estarts_c[:-1])
        end_evt = estarts_c[-1]

        # 3. event machinery on the gathered rows (reflections, deep chains)
        lane = jnp.arange(EVT_CAP, dtype=jnp.int32)
        vbuf = (lane < end_evt) & (evt_idx < N)
        rows = jnp.take(
            packedT.T, jnp.minimum(evt_idx, N - 1), axis=0,
            indices_are_sorted=False, mode="clip",
        )
        rows_out, mledger, lost2, frozen2 = run_event_buffer(
            rows, vbuf, geo, mat, btab, params, k_casc, state.T_sv, R8, pvary
        )
        # target pool index rides row 15 into the merge kernel
        rows_out = rows_out.at[:, C_SV].set(
            jax.lax.bitcast_convert_type(
                jnp.where(vbuf, evt_idx, _SENT), jnp.float32
            )
        )

        # 4. merge + subvolume binning (one full HBM pass)
        mergedT, bins = merge_bin(
            packedT, rows_out.T, estarts_c, ecounts_c, state.T_sv, geo,
            params, interpret=interpret, vma=vary,
        )
        packed_new = mergedT.T

        # 5. dead-slot densification for next step's injection allocator.
        # The scan covers the WHOLE pool and the inj_cap-wide window ROTATES
        # by step: drawing from a fixed prefix would keep filling the first
        # pool blocks while absorption frees slots uniformly, draining the
        # prefix until injections start dropping (observed as a lost-counter
        # leak at N=1e6 before the rotation).
        ce = jnp.cumsum(dcounts)
        total_dead = jnp.maximum(ce[-1], 1)
        cap_i = params.inj_cap
        j_rel = jnp.arange(cap_i, dtype=jnp.int32)
        j0 = (state.step * cap_i) % total_dead
        j = (j0 + j_rel) % total_dead
        rowid = jnp.searchsorted(ce, j, side="right").astype(jnp.int32)
        rowid = jnp.minimum(rowid, ce.shape[0] - 1)
        cc = jnp.stack([ce, dcounts, dstarts[:-1]], axis=1)
        cc_rows = jnp.take(cc, rowid, axis=0, mode="clip")
        within = j - (cc_rows[:, 0] - cc_rows[:, 1])
        src = jnp.clip(cc_rows[:, 2] + within, 0, DEAD_CAP - 1)
        dead_dense = jnp.take(dead_idx, src, mode="clip")
        n_free = jnp.minimum(ce[-1], cap_i)
        dead_dense = jnp.where(j_rel < n_free, dead_dense, N)
        free_list = jax.lax.dynamic_update_slice(
            state.free_list, dead_dense, (0,)
        )
        free_count = state.free_count.at[0].set(n_free)

        # 6. postlude: normalisation + T inversion (sim/binning.py:124-167)
        sums = psum(bins)[:SV]
        e_raw = sums[:, 0]
        phi_raw = sums[:, 1:4]
        np_sv = sums[:, 4].astype(jnp.int32)
        if params.energy_normal == "fixed":
            norm = jnp.asarray(
                params.n_active_modes
                / (params.particle_density * geo.subvol_volume),
                dtype=e_raw.dtype,
            )
        else:  # 'mean'
            norm = params.n_active_modes / jnp.maximum(np_sv, 1).astype(
                e_raw.dtype
            )
            norm = jnp.where(np_sv == 0, 0.0, norm)
        dens = 1.0 / (mat.n_qpoints * mat.volume_unitcell)
        e_sv = e_raw * norm * dens
        phi = phi_raw * (norm * dens)[:, None] * EVPSA2_IN_WM2
        E_sv = e_sv + lookup_E_of_T(mat, state.T_sv)
        T_sv_new = lookup_T_of_E(mat, E_sv)

        ledger = psum(kledger[:R8] + mledger)
        new_state = SimState(
            packed=packed_new,
            sv_id=state.sv_id,
            T_sv=T_sv_new,
            Np_sv=np_sv,
            free_list=free_list,
            free_count=free_count,
            res_counter=state.res_counter,
            n_leaving=ledger[:R, 4].astype(jnp.int32),
            res_energy_balance=state.res_energy_balance - ledger[:R, 0],
            res_heat_flux=state.res_heat_flux + ledger[:R, 1:4],
            lost=state.lost + psum(lost2),
            frozen=state.frozen + psum(frozen_k + frozen2),
            key=state.key,
            step=state.step + 1,
        )
        outputs = StepOutputs(
            T_sv=T_sv_new,
            E_sv=E_sv,
            phi_sv=phi,
            Np_sv=np_sv,
            N_p=np_sv.sum(),
            total_energy=psum(e_raw.sum()),
            res_energy_balance=new_state.res_energy_balance,
            res_heat_flux=new_state.res_heat_flux,
            n_leaving=new_state.n_leaving,
            lost=new_state.lost,
            frozen=new_state.frozen,
        )
        return new_state, outputs

    return step


def make_finalize(geo, mat, params):
    """Apply the PENDING deferred RTA so written particle data matches the
    reference's end-of-step state exactly (the running state itself must stay
    un-finalised — the next drift kernel applies it there)."""
    from nanokappa_tpu.sim.binning import interp_T_particles
    from nanokappa_tpu.sim.scatter import rta_scatter
    from nanokappa_tpu.sim.state import STALE, with_cols

    @jax.jit
    def finalize(state: SimState) -> SimState:
        sv = state.sv_col
        T_p = interp_T_particles(
            geo, state.T_sv, state.pos, sv, params.temp_interp
        )
        ok = state.alive & (state.coll_facet != STALE) & (state.step > 0)
        dev = rta_scatter(
            mat, state.dev, state.mode, state.omega, T_p, ok,
            params.dt, params.t_reference, tau=state.tau,
        )
        return with_cols(state, dev=dev)

    return finalize
