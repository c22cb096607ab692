"""Simulation state: one immutable pytree of fixed-shape device arrays.

The reference mutates 13 parallel NumPy arrays with np.delete / np.vstack
every event (classes/Population.py:525-552, 832-850). On TPU the population
lives in a fixed-capacity pool with an alive mask; reservoir injection fills
dead slots and absorption clears the mask, so shapes never change and the
whole timestep stays compiled.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from nanokappa_tpu.constants import HBAR, KB
from nanokappa_tpu.geometry.device import DeviceGeometry
from nanokappa_tpu.geometry.domain import BC, Domain
from nanokappa_tpu.material.tables import Material, bose_einstein

# coll_facet sentinels
STALE = -2  # needs a ray cast (fresh injection / initialisation / resample)
NOHIT = -1  # ray cast found nothing (defective; particle is quarantined)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SimParams:
    dt: float = field(metadata=dict(static=True))  # ps
    n_cap: int = field(metadata=dict(static=True))  # particle pool capacity
    inj_cap: int = field(metadata=dict(static=True))  # injection buffer size
    k_max: int = field(metadata=dict(static=True), default=8)  # cascade rounds
    c_max: int = field(metadata=dict(static=True), default=3)  # max particles
    #   injected per (reservoir, mode) per step
    energy_normal: str = field(metadata=dict(static=True), default="mean")
    temp_interp: str = field(metadata=dict(static=True), default="linear")
    res_gen: str = field(metadata=dict(static=True), default="constant")
    scat_model: str = field(metadata=dict(static=True), default="velocity")
    particle_density: float = field(metadata=dict(static=True), default=0.0)
    n_active_modes: int = field(metadata=dict(static=True), default=0)
    t_reference: float = field(metadata=dict(static=True), default=300.0)
    evt_cap: int = field(metadata=dict(static=True), default=0)  # event-buffer
    #   width (0 = max(inj_cap, n_cap // 16))
    debug_skip: str = field(metadata=dict(static=True), default="")  # comma list
    #   of phases to skip for perf dissection ONLY (physics-breaking):
    #   'inject' | 'cascade' | 'bin' | 'rta' 
    n_shards: int = field(metadata=dict(static=True), default=1)  # particle-
    #   axis data parallelism: each shard runs the reservoir process at
    #   rate/n_shards with its own accumulator


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SimState:
    # particle pool (N = capacity)
    pos: jax.Array  # (N,3) f32, angstrom
    mode: jax.Array  # (N,) i32 flattened mode index
    vel: jax.Array  # (N,3) f32 cached group velocity of `mode` (A/ps) —
    #   random-index gathers from the (M,) tables are the most expensive
    #   primitive on TPU, so per-mode properties are cached per particle and
    #   refreshed only when the mode changes (reflection / injection)
    omega: jax.Array  # (N,) f32 cached angular frequency of `mode`
    tau: jax.Array  # (N,) f32 cached lifetime tau(T_local, mode), ps; the
    #   random-index (nT*M) gather is the single most expensive op in the RTA
    #   phase, so tau refreshes only on mode change (event/injection buffers)
    #   and once per outer scan (T drifts ~0.01 K/step -> negligible error)
    dev: jax.Array  # (N,) f32 occupation deviation n - n0(T_ref)
    alive: jax.Array  # (N,) bool
    t_coll: jax.Array  # (N,) f32 time to next boundary hit, in dt units
    coll_facet: jax.Array  # (N,) i32 facet of next hit / STALE / NOHIT

    # fields refreshed every step
    sv_id: jax.Array  # (N,) i32
    T_sv: jax.Array  # (SV,) f32 subvolume temperatures
    Np_sv: jax.Array  # (SV,) i32

    # free-slot allocator: injection pops, the event cascade pushes freed
    # slots — keeps every per-step allocation at buffer width instead of
    # recomputing an N-wide dead-slot compaction each step
    free_list: jax.Array  # (N,) i32 stack of dead slot indices (shard-local)
    free_count: jax.Array  # (S,) i32 stack depth per particle shard

    # reservoir machinery
    res_counter: jax.Array  # (S,R,M) f32 fractional accumulator ('constant'
    #   generation); leading axis = particle shard (S=1 single chip), so the
    #   per-shard view under shard_map keeps the same rank
    n_leaving: jax.Array  # (R,) i32 absorbed count (for 'one_to_one')
    res_energy_balance: jax.Array  # (R,) f32 ledger (reset every n_dt_to_conv)
    res_heat_flux: jax.Array  # (R,3) f32 ledger
    lost: jax.Array  # () i32 particles LOST from the population: quarantined
    #   defective lanes, k_max-stuck lanes, dropped injections
    frozen: jax.Array  # () i32 frozen-but-alive telemetry: event-buffer
    #   overflow lanes and stale-raycast lanes whose event was postponed one
    #   step (the population is intact; a storm here means evt_cap too small)

    key: jax.Array  # PRNG key
    step: jax.Array  # () i32


def particle_count(spec: tuple, mat: Material, domain: Domain) -> tuple[int, float]:
    """Resolve the --particles (kind, value) spec into (N_p, particle_density).

    Reference classes/Population.py:50-63."""
    kind, value = spec[0], float(spec[1])
    n_sv = domain.n_of_subvols
    if kind == "pmps":
        n_p = int(np.ceil(value * mat.n_active_modes * n_sv))
    elif kind == "total":
        n_p = int(np.ceil(value))
    elif kind == "pv":
        n_p = int(np.ceil(value * domain.volume))
    else:
        raise ValueError(f"unknown particle spec '{kind}'")
    return n_p, n_p / domain.volume


def initial_modes(n_p: int, mat: Material) -> np.ndarray:
    """Tile the active modes cyclically (reference classes/Population.py:127-144)."""
    active = np.nonzero(~mat.inactive_mask.reshape(-1))[0]
    reps = int(np.ceil(n_p / len(active)))
    return np.tile(active, reps)[:n_p].astype(np.int32)


def initial_subvol_temperatures(
    temp_dist: str,
    domain: Domain,
    subvol_temp=(),
) -> np.ndarray:
    """Initial per-subvolume temperatures (reference classes/Population.py:565-655)."""
    n_sv = domain.n_of_subvols
    bound_T = domain.res_values[
        domain.bound_cond[domain.res_facets] == BC.TEMPERATURE
    ]
    if temp_dist == "custom":
        return np.asarray(subvol_temp, dtype=float)
    if len(bound_T) == 0:
        bound_T = np.array([300.0])
    if temp_dist == "cold":
        return np.full(n_sv, bound_T.min())
    if temp_dist == "hot":
        return np.full(n_sv, bound_T.max())
    if temp_dist == "mean":
        return np.full(n_sv, bound_T.mean())
    if temp_dist == "random":
        return np.random.rand(n_sv) * np.ptp(bound_T) + bound_T.min()
    if temp_dist == "linear":
        res_T_facets = domain.res_facets[
            domain.bound_cond[domain.res_facets] == BC.TEMPERATURE
        ]
        bp = domain.mesh.facet_centroids[res_T_facets]
        if len(bound_T) == 1:
            return np.full(n_sv, bound_T[0])
        if len(bound_T) == 2:
            direction = bp[1] - bp[0]
            alphas = ((domain.subvol_center - bp[0]) * direction).sum(axis=1)
            alphas /= (direction**2).sum()
            return bound_T[0] + alphas * (bound_T[1] - bound_T[0])
        d = np.linalg.norm(
            domain.subvol_center[None, :, :] - bp[:, None, :], axis=2
        ).T  # (SV,R)
        w = 1.0 / np.maximum(d, 1e-12)
        w /= w.sum(axis=1, keepdims=True)
        return (bound_T * w).sum(axis=1)
    raise ValueError(f"unknown temp_dist '{temp_dist}'")


def init_state(
    mat: Material,
    domain: Domain,
    geo: DeviceGeometry,
    params: SimParams,
    n_p: int,
    temp_dist: str = "cold",
    part_dist: str = "random_subvol",
    subvol_temp=(),
    seed: int = 0,
    positions: np.ndarray | None = None,
    modes: np.ndarray | None = None,
    occupation: np.ndarray | None = None,
    empty_subvols=(),
) -> SimState:
    rng = np.random.default_rng(seed)
    n_cap = params.n_cap
    R = geo.n_reservoirs
    M = mat.n_modes
    SV = domain.n_of_subvols

    if positions is None:
        if part_dist in ("random_domain", "random_subvol"):
            positions = domain.mesh.sample_volume(n_p, rng)
            if len(empty_subvols):
                # resample until no particle starts in an excluded subvolume
                # (reference --empty_subvols, classes/Population.py:209-246)
                empty = np.asarray(list(empty_subvols), dtype=int)
                for _ in range(100):
                    d = np.linalg.norm(
                        positions[:, None, :] - domain.subvol_center[None], axis=-1
                    )
                    bad = np.isin(np.argmin(d, axis=1), empty)
                    if not bad.any():
                        break
                    positions[bad] = domain.mesh.sample_volume(int(bad.sum()), rng)
        elif part_dist == "center_domain":
            positions = np.tile(domain.mesh.center_mass, (n_p, 1))
        elif part_dist == "center_subvol":
            # particles at each subvolume centre, proportional to its volume
            # (reference classes/Population.py:248-268)
            keep = np.ones(domain.n_of_subvols, dtype=bool)
            keep[list(empty_subvols)] = False
            vols = np.where(keep, domain.subvol_volume, 0.0)
            counts = np.ceil(n_p * vols / vols.sum()).astype(int)
            positions = np.repeat(domain.subvol_center, counts, axis=0)[:n_p]
        else:
            raise ValueError(f"unknown part_dist '{part_dist}'")
    if modes is None:
        modes = initial_modes(n_p, mat)

    T_sv = initial_subvol_temperatures(temp_dist, domain, subvol_temp)

    # particle temperatures = their subvolume's (nearest interp at init)
    d = np.linalg.norm(positions[:, None, :] - domain.subvol_center[None], axis=-1)
    sv = np.argmin(d, axis=1)
    T_p = T_sv[sv]

    omega_p = mat.omega.reshape(-1)[modes]
    if occupation is None:
        dev = bose_einstein(T_p, omega_p) - bose_einstein(params.t_reference, omega_p)
    else:
        dev = occupation - bose_einstein(params.t_reference, omega_p)

    # spread live particles evenly over the pool so every particle shard gets
    # an equal share of population AND of dead-slot headroom
    slots = (np.arange(n_p, dtype=np.int64) * n_cap) // n_p

    def full(x, fill):
        out = np.full((n_cap,) + x.shape[1:], fill, dtype=x.dtype)
        out[slots] = x
        return out

    alive = np.zeros(n_cap, dtype=bool)
    alive[slots] = True

    # per-shard free lists of LOCAL slot indices (each shard allocates only
    # within its own segment of the pool)
    S = params.n_shards
    n_local = n_cap // S
    assert n_cap % S == 0, "pool capacity must divide evenly across shards"
    free_list = np.zeros(n_cap, dtype=np.int32)
    free_count = np.zeros(S, dtype=np.int32)
    for s in range(S):
        seg = ~alive[s * n_local : (s + 1) * n_local]
        loc = np.nonzero(seg)[0].astype(np.int32)
        free_count[s] = len(loc)
        free_list[s * n_local : s * n_local + len(loc)] = loc

    vel_p = mat.group_vel.reshape(-1, 3)[modes]
    ti = np.clip(np.searchsorted(mat.tau_T, T_p) - 1, 0, len(mat.tau_T) - 2)
    wt = np.clip(
        (T_p - mat.tau_T[ti]) / (mat.tau_T[ti + 1] - mat.tau_T[ti]), 0.0, 1.0
    )
    tau_flat = mat.tau.reshape(len(mat.tau_T), -1)
    tau_p = (1 - wt) * tau_flat[ti, modes] + wt * tau_flat[ti + 1, modes]
    state = SimState(
        pos=jnp.asarray(full(positions.astype(np.float32), 0.0)),
        mode=jnp.asarray(full(modes.astype(np.int32), 0)),
        vel=jnp.asarray(full(vel_p.astype(np.float32), 0.0)),
        omega=jnp.asarray(full(omega_p.astype(np.float32), 0.0)),
        tau=jnp.asarray(full(tau_p.astype(np.float32), 0.0)),
        dev=jnp.asarray(full(dev.astype(np.float32), 0.0)),
        alive=jnp.asarray(alive),
        t_coll=jnp.full(n_cap, np.inf, dtype=jnp.float32),
        coll_facet=jnp.full(n_cap, STALE, dtype=jnp.int32),
        sv_id=jnp.asarray(full(sv.astype(np.int32), 0)),
        T_sv=jnp.asarray(T_sv, dtype=jnp.float32),
        Np_sv=jnp.asarray(np.bincount(sv, minlength=SV).astype(np.int32)),
        free_list=jnp.asarray(free_list),
        free_count=jnp.asarray(free_count),
        res_counter=jnp.asarray(
            rng.random((params.n_shards, R, M)).astype(np.float32)
        ),  # random phase, like reference classes/Population.py:343
        n_leaving=jnp.zeros(R, dtype=jnp.int32),
        res_energy_balance=jnp.zeros(R, dtype=jnp.float32),
        res_heat_flux=jnp.zeros((R, 3), dtype=jnp.float32),
        lost=jnp.zeros((), dtype=jnp.int32),
        frozen=jnp.zeros((), dtype=jnp.int32),
        key=jax.random.PRNGKey(seed),
        step=jnp.zeros((), dtype=jnp.int32),
    )
    return prime_collision_cache(state, geo, params.dt)


def prime_collision_cache(state: SimState, geo: DeviceGeometry, dt: float) -> SimState:
    """Full-width initial ray cast ('Getting first boundary collisions...',
    reference classes/Population.py:308-316). The per-step cascade only
    re-casts a bounded buffer of stale entries, so the initial population must
    arrive with a valid collision cache."""
    import dataclasses

    from nanokappa_tpu.ops.raycast import raycast

    t, f = raycast(
        geo, state.pos, state.vel, jnp.full(state.pos.shape[0], -1, jnp.int32)
    )
    return dataclasses.replace(
        state,
        t_coll=(t / dt).astype(jnp.float32),
        coll_facet=jnp.where(state.alive, f, STALE),
    )
