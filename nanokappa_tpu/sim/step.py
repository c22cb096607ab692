"""The fused timestep: one XLA program per step, scanned for multi-step runs.

Order of operations matches the reference run_timestep
(classes/Population.py:1724-1769):
  1. reservoir injection (fill_reservoirs + add_reservoir_particles),
  2. drift + boundary-event cascade (drift + boundary_scattering),
  3. subvolume energy binning + temperature refresh (refresh_temperatures),
  4. RTA scattering (lifetime_scattering),
with per-step observables (T_sv, E_sv, flux, Np, reservoir ledgers) returned
for the host-side convergence machinery.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from nanokappa_tpu.constants import EVPSA2_IN_WM2
from nanokappa_tpu.geometry.device import DeviceGeometry
from nanokappa_tpu.material.tables import MaterialTables
from nanokappa_tpu.sim.binning import (
    bin_all,
    interp_T_particles,
    lookup_E_of_T,
    lookup_T_of_E,
    particle_energies,
    subvol_id,
)
from nanokappa_tpu.sim.boundary_tables import BoundaryTables
from nanokappa_tpu.sim.cascade import run_cascade
from nanokappa_tpu.sim.reservoir import ReservoirTables, inject
from nanokappa_tpu.sim.scatter import rta_scatter
from nanokappa_tpu.sim.state import SimParams, SimState


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class StepOutputs:
    T_sv: jax.Array  # (SV,)
    E_sv: jax.Array  # (SV,) energy density eV/A^3 (incl. reference)
    phi_sv: jax.Array  # (SV,3) heat flux W/m^2
    Np_sv: jax.Array  # (SV,) i32
    N_p: jax.Array  # () i32
    total_energy: jax.Array  # () f32, sum of particle deviation energies (eV)
    res_energy_balance: jax.Array  # (R,) raw ledger (eV)
    res_heat_flux: jax.Array  # (R,3) raw ledger
    n_leaving: jax.Array  # (R,)
    lost: jax.Array  # () dead/quarantined particles (cumulative, total)
    lost_split: jax.Array  # (3,) cumulative loss by mechanism:
    #   [capacity drops, k_max-stuck quarantine, defective ray cast]
    frozen: jax.Array  # () frozen-but-alive postponed events (cumulative)


def make_step(
    geo: DeviceGeometry,
    mat: MaterialTables,
    btab: BoundaryTables,
    rtab: ReservoirTables,
    params: SimParams,
    axis_name: str | None = None,
    vary_axes: tuple | None = None,
):
    """Returns step(state) -> (state, StepOutputs). Pure; jit/scan-ready.

    With `axis_name` set (inside shard_map over the particle axis) the
    subvolume reductions and reservoir ledgers are all-reduced with psum over
    ICI; everything else is embarrassingly parallel (SURVEY.md section 5.8:
    particles never interact pairwise, so no migration between shards).
    `vary_axes` lists every mesh axis the particle data varies over (defaults
    to (axis_name,)); an ensemble replica axis goes here too.

    Dispatches to the fused two-kernel v2 step (sim/fused.py) when the
    configuration is eligible; this XLA formulation remains the reference
    implementation and the fallback for general geometry."""
    from nanokappa_tpu.sim.fused import make_step_v2, v2_eligible

    if v2_eligible(geo, params):
        return make_step_v2(geo, mat, btab, rtab, params, axis_name, vary_axes)

    if axis_name is None:
        psum = lambda x: x  # noqa: E731

        def shard_idx():
            return 0
    else:
        psum = lambda x: jax.lax.psum(x, axis_name)  # noqa: E731

        def shard_idx():
            return jax.lax.axis_index(axis_name)

    vary = vary_axes if vary_axes is not None else (axis_name,) if axis_name else None

    skip = set(params.debug_skip.split(",")) if params.debug_skip else set()

    def step(state: SimState, _=None):
        key = jax.random.fold_in(state.key, state.step)
        key = jax.random.fold_in(key, shard_idx())
        k_inj, k_casc = jax.random.split(key)

        # 1. reservoir injection
        if "inject" not in skip:
            state, stale_idx = inject(
                state, geo, mat, rtab, params, k_inj, shard_idx(), psum
            )
        else:
            stale_idx = jnp.full(
                params.inj_cap, state.alive.shape[0], dtype=jnp.int32
            )

        # 2. drift + boundary cascade
        if "cascade" not in skip:
            state = run_cascade(
                state, stale_idx, geo, mat, btab, params, k_casc, psum, vary,
            )

        # 3. rebin + refresh temperatures (classes/Population.py:685-728)
        if "bin" in skip:
            sv = state.sv_id
            energies = state.dev
            np_sv = state.Np_sv
            phi = jnp.zeros((geo.n_subvols, 3), jnp.float32)
            E_sv = lookup_E_of_T(mat, state.T_sv)
            T_sv_new = state.T_sv
            T_p = state.T_sv[sv]
            dev = state.dev if "rta" in skip else rta_scatter(
                mat, state.dev, state.mode, state.omega, T_p, state.alive,
                params.dt, params.t_reference, tau=state.tau,
            )
            return _mk(state, dev, sv, T_sv_new, np_sv, E_sv, phi, energies, psum)
        sv = subvol_id(geo, state.pos)
        # dn is taken against the *subvolume* temperature, not the particle-
        # interpolated one (classes/Population.py:707); heat flux uses the
        # pre-scatter energies (classes/Population.py:1754-1763)
        energies = particle_energies(
            state.omega, state.dev, state.alive,
            state.T_sv[sv], params.t_reference,
        )
        e_dev_sv, phi, np_sv = bin_all(
            geo, mat, energies, state.vel, sv, state.alive,
            params.energy_normal, params.particle_density, psum,
        )
        phi = phi * EVPSA2_IN_WM2
        E_sv = e_dev_sv + lookup_E_of_T(mat, state.T_sv)
        T_sv_new = lookup_T_of_E(mat, E_sv)

        # particle temperatures from the *new* profile
        T_p = interp_T_particles(geo, T_sv_new, state.pos, sv, params.temp_interp)

        # 4. RTA scattering toward the local equilibrium (cached lifetimes)
        if "rta" not in skip:
            dev = rta_scatter(
                mat, state.dev, state.mode, state.omega, T_p, state.alive,
                params.dt, params.t_reference, tau=state.tau,
            )
        else:
            dev = state.dev

        from nanokappa_tpu.sim.state import with_cols

        new_state = with_cols(
            state,
            dev=dev,
            sv=sv,  # C_SV column (the fused v2 step reads it for deferred RTA)
            sv_id=sv,
            T_sv=T_sv_new,
            Np_sv=np_sv,
            step=state.step + 1,
        )
        outputs = StepOutputs(
            T_sv=T_sv_new,
            E_sv=E_sv,
            phi_sv=phi,
            Np_sv=np_sv,
            N_p=np_sv.sum(),
            total_energy=psum(energies.sum()),
            res_energy_balance=new_state.res_energy_balance,
            res_heat_flux=new_state.res_heat_flux,
            n_leaving=new_state.n_leaving,
            lost=new_state.lost.sum(),
            lost_split=new_state.lost,
            frozen=new_state.frozen,
        )
        return new_state, outputs

    return step


def _mk(state, dev, sv, T_sv_new, np_sv, E_sv, phi, energies, psum):
    from nanokappa_tpu.sim.state import with_cols

    new_state = with_cols(
        state, dev=dev, sv_id=sv, T_sv=T_sv_new, Np_sv=np_sv,
        step=state.step + 1,
    )
    outputs = StepOutputs(
        T_sv=T_sv_new, E_sv=E_sv, phi_sv=phi, Np_sv=np_sv, N_p=np_sv.sum(),
        total_energy=psum(energies.sum()),
        res_energy_balance=new_state.res_energy_balance,
        res_heat_flux=new_state.res_heat_flux,
        n_leaving=new_state.n_leaving, lost=new_state.lost.sum(),
        lost_split=new_state.lost, frozen=new_state.frozen,
    )
    return new_state, outputs


_BIG_CONST_BYTES = 200 * 1024 * 1024  # the remote-compile tunnel rejects
#   programs whose baked CONSTANTS grow too large (HTTP 413 'length limit
#   exceeded'; a 96-normal boundary table is 1.6 GB) — past this threshold
#   the tables ride as jit PARAMETERS instead. The threshold stays above
#   the production film config (~165 MB of 31^3 material+boundary tables),
#   which measures 1.4-3x FASTER with tables baked as constants (XLA
#   specialises gathers/layouts against known buffers), and below any
#   observed 413.


def _array_fields(obj) -> dict:
    """Device-array dataclass fields of a tables pytree (skips static ints
    and the host-side stashes)."""
    out = {}
    for f in obj.__dataclass_fields__:
        v = getattr(obj, f)
        if hasattr(v, "nbytes") and hasattr(v, "dtype"):
            out[f] = v
    return out


@contextlib.contextmanager
def _swap_fields(obj, new_fields: dict):
    """Temporarily rebind array fields of a (frozen) dataclass INSTANCE —
    used to substitute tracers during jit tracing so the arrays become
    program parameters instead of baked constants. Host-side stashes
    (object.__setattr__ attributes like btab._host) are untouched, so
    host-logic run during tracing still sees concrete tables."""
    old = {k: getattr(obj, k) for k in new_fields}
    try:
        for k, v in new_fields.items():
            object.__setattr__(obj, k, v)
        yield
    finally:
        for k, v in old.items():
            object.__setattr__(obj, k, v)


def _parameterize_tables(run_core, objs: dict):
    """Wrap run_core(state) so the array fields of the given table objects
    are jit PARAMETERS: tracing happens with tracers swapped onto the same
    instances (closures keep working), and every call passes the concrete
    arrays (zero-copy — they already live on device)."""
    tabs = {name: _array_fields(obj) for name, obj in objs.items()}

    def outer(state, tabs_in):
        with contextlib.ExitStack() as stack:
            for name, obj in objs.items():
                stack.enter_context(_swap_fields(obj, tabs_in[name]))
            return run_core(state)

    jitted = jax.jit(outer, donate_argnums=0)

    def run(state):
        return jitted(state, tabs)

    return run


def build_step(geo, mat, btab, rtab, params, n_inner: int = 1, n_outer: int = 1):
    """Jitted multi-step: advances n_outer blocks of n_inner steps.

    n_outer == 1 returns the last StepOutputs (one convergence datapoint per
    host sync, like the reference's n_dt_to_conv = 10 cadence,
    classes/Population.py:41,1762). n_outer > 1 BATCHES datapoints on device:
    each block contributes one stacked StepOutputs row and resets the
    reservoir ledgers (reference restart_reservoir_balance), so the host
    syncs once per n_outer datapoints with the convergence-row cadence
    unchanged. Every ~0.6 s host round trip through a remote-TPU tunnel
    amortises over 10x more simulated steps.

    On the v2 path the pool rides in the kernel-native 3-D (16, NR, L)
    layout through the scans and is defragmented on a statically-sized
    compaction cadence (make_v2_block_runner) so tail appends never hit
    capacity; the layout converts back at the run() boundary only."""
    import dataclasses

    from nanokappa_tpu.sim.fused import v2_eligible

    step = make_step(geo, mat, btab, rtab, params)
    is_v2 = v2_eligible(geo, params)

    # many-normal geometries carry GB-scale boundary tables; baked as jit
    # constants they exceed the remote-compile size limit, so past the
    # threshold the tables ride as parameters (_parameterize_tables)
    table_objs = {"mat": mat, "btab": btab, "rtab": rtab}
    table_bytes = sum(
        v.nbytes for obj in table_objs.values()
        for v in _array_fields(obj).values()
    )
    big_tables = table_bytes > _BIG_CONST_BYTES
    # the in-kernel-diffuse presample pool is itself hundreds of MB
    # (sim/diffuse_pool.py): ALWAYS a parameter, so only it rides the
    # parameterized path when the physics tables still fit as (faster)
    # baked constants
    from nanokappa_tpu.sim.fused import dkern_active as _dka

    _dp = _dka(
        geo, btab, params, mat, params.n_cap // max(1, params.n_shards)
    )
    param_objs = dict(table_objs) if big_tables else {}
    if _dp is not None and _dp.window.nbytes > 64 * 1024 * 1024:
        param_objs["dpool"] = _dp

    if is_v2:
        run_blocks = make_v2_block_runner(
            geo, mat, btab, params, step, n_inner, n_outer
        )
        if param_objs:
            return _parameterize_tables(run_blocks, param_objs)
        # donate the carried state: without donation XLA must preserve the
        # 126 MB input pool across the call (an extra copy + 2x the pool's
        # HBM footprint per run)
        return jax.jit(run_blocks, donate_argnums=0)

    def block(state: SimState, _=None):
        state = maybe_refresh_tau(state, geo, mat, params)
        state, outs = jax.lax.scan(step, state, length=n_inner)
        last = jax.tree.map(lambda x: x[-1], outs)
        state = reset_ledgers(state)
        return state, last

    def run_core(state: SimState):
        if n_outer == 1:
            state = maybe_refresh_tau(state, geo, mat, params)
            state, outs = jax.lax.scan(step, state, length=n_inner)
            out = jax.tree.map(lambda x: x[-1], outs)
        else:
            state, out = jax.lax.scan(block, state, length=n_outer)
        return state, out

    # v1 never touches the diffuse pool — original behaviour
    if big_tables:
        return _parameterize_tables(run_core, table_objs)
    return jax.jit(run_core)


def make_v2_block_runner(
    geo, mat, btab, params, step, n_inner, n_outer, vary=None
):
    """The v2 scan harness: pool in the kernel-native 3-D layout, a
    compaction cadence sized so tail appends never hit capacity, drift-gated
    tau refresh, one ledger reset per n_inner block. Shared by the
    single-chip build_step (jit the result directly) and the shard_map
    paths in parallel/sharding.py (call inside run_local with `vary` set to
    the mesh axes the particle data varies over).

    Returns run_blocks(state) -> (state, last_outputs): ONE StepOutputs when
    n_outer == 1, else n_outer stacked rows."""
    import dataclasses
    from functools import partial as _partial

    from nanokappa_tpu.ops.compact_pool import compact_pool
    from nanokappa_tpu.sim import fused as _fused
    from nanokappa_tpu.sim.fused import (
        from_transposed, mirror_eligible, refresh_tau_T, to_transposed,
    )

    interp = jax.default_backend() == "cpu" or _fused.FORCE_INTERPRET
    use_mirror = mirror_eligible(geo, btab, params, mat)
    from nanokappa_tpu.sim.boundary_tables import slim_mirror_axis
    from nanokappa_tpu.sim.fused import dkern_active

    slim_axis = slim_mirror_axis(geo, btab, mat) if use_mirror else None
    _N_shard0 = params.n_cap // max(1, params.n_shards)
    use_dkern = dkern_active(geo, btab, params, mat, _N_shard0) is not None
    if use_dkern:
        # mode-derived pool rows 16-17 ([|k|^2, corr bitmask]) for the
        # C = 18 dkern layout (one N-wide small-table gather per run()
        # boundary; sim/fused.py to_transposed)
        from nanokappa_tpu.sim.fused import dkern_mode_rows

        dk2tab_r = dkern_mode_rows(btab, mat)

    # Tail-room invariant: each step appends up to EVT_CAP + inj_cap rows
    # at the pool tail (event re-entry + injections, sim/fused.py) and
    # only compaction reclaims dead lanes. Compact every m steps with m
    # sized so the appends cannot outrun ~N/5 of slack (the driver sizes
    # the pool with >= 25% margin, sim/state.py round_pool_cap callers).
    N_shard = params.n_cap // max(1, params.n_shards)
    from nanokappa_tpu.sim.fused import autosize_evt_cap

    evt_default = autosize_evt_cap(
        geo, mat, params, use_mirror, N_shard, btab=btab
    )
    evt_eff = -(-(params.evt_cap or evt_default) // 128) * 128
    per_step = evt_eff + params.inj_cap
    m = max(1, min(n_inner, (N_shard // 5) // max(1, per_step)))
    while n_inner % m:  # largest divisor of n_inner <= the safe bound
        m -= 1
    n_sub = n_inner // m

    def compacted(stateT: SimState) -> SimState:
        # on the mirror path stateT.packed is the COMBINED (24, NR, L)
        # pool (mirror rows 16..23 compact through the same delta network
        # by construction — one DMA stream)
        pool, _, tail = compact_pool(
            stateT.packed, None, interpret=interp, vma=vary,
        )
        return dataclasses.replace(
            stateT,
            packed=pool,
            free_count=stateT.free_count.at[0].set(tail),
        )

    need = m * per_step  # worst-case tail growth of one sub-block

    def sub(stateT: SimState, _=None):
        # compact only when the coming sub-block could outrun the tail room
        # (a 2.4 GB full-pool pass at 1e7 particles — unconditional
        # per-sub-block compaction cost 0.49 ms/step there while actual
        # growth needs it only every ~100 steps). The m-sizing bound above
        # guarantees a freshly compacted pool always fits `need`.
        stateT = jax.lax.cond(
            stateT.free_count[0] + need > N_shard,
            compacted, lambda s: s, stateT,
        )
        stateT, outs = jax.lax.scan(step, stateT, length=m)
        return stateT, jax.tree.map(lambda x: x[-1], outs)

    def block(stateT: SimState, _=None):
        stateT = maybe_refresh_tau(
            stateT, geo, mat, params,
            fn=_partial(refresh_tau_T, use_mirror=use_mirror),
            slope=use_mirror,
        )
        if n_sub == 1:
            stateT, last = sub(stateT)
        else:
            stateT, outs = jax.lax.scan(sub, stateT, length=n_sub)
            last = jax.tree.map(lambda x: x[-1], outs)
        stateT = reset_ledgers(stateT)
        return stateT, last

    def run_blocks(state: SimState):
        stateT = to_transposed(
            state, combined=use_mirror, slim=slim_axis is not None,
            extra=(
                dk2tab_r[jnp.clip(state.mode, 0, dk2tab_r.shape[0] - 1)]
                if use_dkern else None
            ),
        )
        # ONE unconditional compaction at run entry: it establishes the
        # tail-pointer semantics of free_count[0] (init_state spreads
        # particles across the whole pool and leaves free_count as a
        # free-LIST depth — appending at that "tail" would overwrite live
        # lanes). Subsequent sub-blocks compact only on tail pressure.
        stateT = compacted(stateT)
        if n_outer == 1:
            stateT, out = block(stateT)
        else:
            stateT, out = jax.lax.scan(block, stateT, length=n_outer)
        state = from_transposed(stateT, flip_axis=slim_axis)
        # host-side figure/postprocess consumers read sv via state.sv_col
        # directly (the sv_id leaf is carried but stale on the v2 path —
        # refreshing it every run cost a full (N,) slice+store per boundary)
        return state, out

    return run_blocks


def maybe_refresh_tau(
    state: SimState, geo, mat, params, fn=None, slope: bool = False
) -> SimState:
    """Run the full-width lifetime refresh `fn` ONLY when needed.

    The refresh is one random gather per particle from the (SV, M) lifetime
    table — the single most expensive XLA op per outer block (~9 ms at
    N=1.25e6, TPU scalar gathers run ~1.4e8/s).

    Plain (cached-tau) form: trigger when some subvolume temperature
    drifted more than params.tau_dT since the last refresh (default 0.05 K,
    a <0.1% lifetime error against the reference's every-step interpolator,
    classes/Phonon.py:326-336).

    Slope form (`slope=True`, the v2 mirror path): tau(T) = a + b*T is
    continuously exact within a T-grid bin, so the trigger is a subvolume
    temperature CROSSING a bin boundary — effectively never on a converging
    film (phono3py grids are ~10 K wide). No collectives run inside the
    branch, so per-replica divergence under shard_map is safe."""
    import dataclasses

    if fn is None:
        fn = refresh_tau

    def do(s):
        s = fn(s, geo, mat, params)
        return dataclasses.replace(s, T_tau=s.T_sv)

    if slope:
        nT = mat.tau_T.shape[0]

        def tbin(T):
            return jnp.clip(
                jnp.searchsorted(mat.tau_T, T) - 1, 0, max(nT - 2, 0)
            )

        pred = jnp.any(tbin(state.T_sv) != tbin(state.T_tau))
    else:
        pred = jnp.any(jnp.abs(state.T_sv - state.T_tau) > params.tau_dT)
    return jax.lax.cond(pred, do, lambda s: s, state)


def refresh_tau(state: SimState, geo, mat, params) -> SimState:
    """Full-width lifetime refresh, once per outer scan (~every 10 steps):
    between refreshes tau only goes stale by the slow subvolume-temperature
    drift (<0.1 K), a <0.1% lifetime error, far below Monte Carlo noise."""
    from nanokappa_tpu.sim.scatter import lifetime_by_sv, lifetime_lookup
    from nanokappa_tpu.sim.state import with_cols

    sv = subvol_id(geo, state.pos)
    if params.temp_interp == "nearest":
        tau = lifetime_by_sv(mat, state.T_sv, sv, state.mode)
    else:
        T_p = interp_T_particles(
            geo, state.T_sv, state.pos, sv, params.temp_interp
        )
        tau = lifetime_lookup(mat, T_p, state.mode)
    return with_cols(state, tau=jnp.where(state.alive, tau, state.tau))


def reset_ledgers(state: SimState) -> SimState:
    """Zero the reservoir balance ledgers (reference restart_reservoir_balance,
    classes/Population.py:1695-1699)."""
    import dataclasses

    return dataclasses.replace(
        state,
        res_energy_balance=jnp.zeros_like(state.res_energy_balance),
        res_heat_flux=jnp.zeros_like(state.res_heat_flux),
    )
