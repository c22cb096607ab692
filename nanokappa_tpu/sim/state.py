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
    tau_dT: float = field(metadata=dict(static=True), default=0.25)  # K of
    #   subvolume-temperature drift that triggers a cached-lifetime refresh.
    #   Must sit ABOVE per-block Monte Carlo noise (sigma_T ~ 0.1 K at 1e5
    #   particles/subvolume — a 0.05 K threshold refreshed every block) yet
    #   give only ~0.1% lifetime error, far below MC noise on kappa
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
    step_impl: str = field(metadata=dict(static=True), default="auto")
    #   "auto" picks the fused Pallas step (v2) when the config is eligible
    #   (box or <=128-triangle mesh, slice/grid/voronoi subvolumes,
    #   nearest/linear interp — sim/fused.py v2_eligible) and a TPU backend
    #   is present; "v1"/"v2" force an implementation ("v2" on CPU runs the
    #   kernels in interpret mode — tests only)


# columns of the packed per-particle state matrix. Keeping every per-particle
# field in ONE (N, 16) f32 row (ints bitcast) makes the event-buffer traffic
# row-shaped: the cascade's buffer fill is one row gather and the merge-back
# one row scatter, and injection writes one row per new particle — TPU row
# gathers/scatters amortise ~20x over per-field scalar ones (measured).
# 16 columns = the exact (16, lanes) sublane tile of the Pallas kernels, so
# the transposed (C, N) view needs no padding.
C_POS = slice(0, 3)  # position, angstrom
C_VEL = slice(3, 6)  # cached group velocity of `mode`, A/ps
C_OMEGA = 6  # cached angular frequency, rad THz
C_TAU = 7  # cached lifetime tau(T_local, mode), ps
C_DEV = 8  # occupation deviation n - n0(T_ref)
C_MODE = 9  # flattened mode index (i32 bitcast)
C_CF = 10  # next-hit facet / STALE / NOHIT (i32 bitcast)
C_TCOLL = 11  # time to next boundary hit, in dt units
C_ONF = 12  # facet the particle sits on, excluded from its next ray cast
#   (i32 bitcast; -1 = none). Set by injection / reflection / periodic.
C_REM = 13  # remaining fraction of the current dt (injection writes the
#   partial dt_in/dt; the cascade derives everyone else's from `alive`,
#   keyed on C_CF == STALE)
C_ALIVE = 14  # 1.0 = alive, 0.0 = dead slot (bool as f32 so the liveness
#   update rides the same row scatters as everything else)
C_SV = 15  # subvolume id (i32 bitcast), refreshed by the binning pass each
#   step; the fused-kernel step reads it for the deferred RTA temperature
N_COLS = 16

# columns of the MIRROR side pool (SimState.mirror, (N, M_COLS)): the cached
# specular-correspondence partner of each particle's mode for the single
# rough-wall normal family. When the fast path is eligible
# (sim/fused.py mirror_eligible), a specular reflection inside the drift
# kernel is a pure register swap of (mode, omega, vel, tau) with this set
# (mirror-of-mirror = the original mode) plus the occupation re-reference —
# no mode-table gather, no event export.
X_MODE = 0  # correspondence mode (i32 bitcast); -1 = none -> export
X_OMEGA = 1
X_VEL = slice(2, 5)
X_TAU = 5  # mirror-mode lifetime. SLOPE-FORM when the v2 mirror fast path
#   is active (sim/fused.py slope_tau_active): the mirror mode's intercept
#   a_m of tau(T) = a + b*T on the current T-grid bin (C_TAU then holds the
#   MAIN mode's intercept a); plain tau(T_local, mirror mode) otherwise
X_TAUB = 6  # main mode's slope b (slope form only; 0 otherwise)
X_MTAUB = 7  # mirror mode's slope b_m (slope form only; 0 otherwise)
M_COLS = 8  # the f32 sublane tile


def _bc_f32(a: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(a, jnp.float32)


def _bc_i32(a: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(a, jnp.int32)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SimState:
    # particle pool (N = capacity): one packed row per particle; see the
    # C_* column map above. Per-mode properties (vel/omega/tau) are cached
    # per particle and refreshed only when the mode changes
    # (reflection / injection) — random-index gathers from the (M,) tables
    # are the most expensive primitive on TPU.
    packed: jax.Array  # (N, N_COLS) f32

    # specular-correspondence cache (see the X_* column map): one row per
    # pool lane, kept aligned with `packed` by the v2 step's appends and
    # compaction whenever the in-kernel specular fast path is active
    # (sim/fused.py mirror_eligible); carried untouched otherwise. An
    # UNFILLED cache (X_MODE = -1 everywhere) is always safe — reflections
    # fall back to the narrow event machinery.
    mirror: jax.Array  # (N, M_COLS) f32

    # fields refreshed every step
    sv_id: jax.Array  # (N,) i32
    T_sv: jax.Array  # (SV,) f32 subvolume temperatures
    Np_sv: jax.Array  # (SV,) i32
    T_tau: jax.Array  # (SV,) f32 subvolume temperatures at the LAST cached-
    #   lifetime refresh: the full-pool tau re-gather (the single most
    #   expensive XLA op per outer block, ~9 ms at N=1.25e6) runs only when
    #   some |T_sv - T_tau| exceeds params.tau_dT, so the converged plateau
    #   pays nothing while staleness stays explicitly bounded

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
    lost: jax.Array  # (3,) i32 particles LOST from the population, split by
    #   mechanism so the driver can name the culprit when any grows:
    #   [0] capacity drops (clipped injections + append-window tail drops),
    #   [1] k_max-stuck lanes quarantined after the cascade round budget,
    #   [2] defective lanes (ray cast found no boundary)
    frozen: jax.Array  # () i32 frozen-but-alive telemetry: event-buffer
    #   overflow lanes and stale-raycast lanes whose event was postponed one
    #   step (the population is intact; a storm here means evt_cap too small)

    key: jax.Array  # PRNG key
    step: jax.Array  # () i32

    # ---- column views (read-only; update via with_cols) ---------------------
    @property
    def pos(self) -> jax.Array:
        return self.packed[:, C_POS]

    @property
    def vel(self) -> jax.Array:
        return self.packed[:, C_VEL]

    @property
    def omega(self) -> jax.Array:
        return self.packed[:, C_OMEGA]

    @property
    def tau(self) -> jax.Array:
        return self.packed[:, C_TAU]

    @property
    def dev(self) -> jax.Array:
        return self.packed[:, C_DEV]

    @property
    def mode(self) -> jax.Array:
        return _bc_i32(self.packed[:, C_MODE])

    @property
    def coll_facet(self) -> jax.Array:
        return _bc_i32(self.packed[:, C_CF])

    @property
    def t_coll(self) -> jax.Array:
        return self.packed[:, C_TCOLL]

    @property
    def on_facet(self) -> jax.Array:
        return _bc_i32(self.packed[:, C_ONF])

    @property
    def alive(self) -> jax.Array:
        return self.packed[:, C_ALIVE] > 0.5

    @property
    def sv_col(self) -> jax.Array:
        return _bc_i32(self.packed[:, C_SV])


def with_cols(state: SimState, **updates) -> SimState:
    """Functional column update: with_cols(state, dev=..., pos=..., step=...).

    Column names go into the packed matrix; any other SimState field name is
    passed through to dataclasses.replace."""
    import dataclasses

    cols = {
        "pos": C_POS, "vel": C_VEL, "omega": C_OMEGA, "tau": C_TAU,
        "dev": C_DEV, "mode": C_MODE, "coll_facet": C_CF, "t_coll": C_TCOLL,
        "on_facet": C_ONF, "remaining": C_REM, "alive": C_ALIVE, "sv": C_SV,
    }
    ints = {"mode", "coll_facet", "on_facet", "sv"}
    p = state.packed
    other = {}
    for k, v in updates.items():
        if k in cols:
            v = jnp.asarray(v)
            if k in ints:
                v = _bc_f32(v.astype(jnp.int32))
            v = v.astype(p.dtype) if v.dtype != p.dtype else v
            p = p.at[:, cols[k]].set(v)
        else:
            other[k] = v
    if p is not state.packed:
        other["packed"] = p
    return dataclasses.replace(state, **other)


def round_pool_cap(n_cap: int, n_shards: int = 1) -> int:
    """Round a requested pool capacity UP to a v2-kernel-compatible width:
    the per-shard pool must be a power of two in [1024, BN) or a multiple of
    BN = 16384 (ops/megastep.py tile_width). Extra slots start dead and only
    cost memory; the v1 path accepts any width, so rounding unconditionally
    is harmless."""
    from nanokappa_tpu.ops.megastep import BN

    w = -(-n_cap // n_shards)
    if w >= BN:
        w = -(-w // BN) * BN
    else:
        w = max(1024, 1 << (w - 1).bit_length())
    return w * n_shards


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


def nearest_center_ids(positions: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """Nearest-subvolume-centre ids, chunked: the broadcast (N, SV, 3)
    difference tensor at 1e7 particles is gigabytes and dominated init_state's
    host time; squared distances over 1M-row chunks give the identical argmin
    in a few hundred MB of working set."""
    n = positions.shape[0]
    out = np.empty(n, dtype=np.int64)
    for s in range(0, n, 1 << 20):
        blk = positions[s : s + (1 << 20)]
        d2 = ((blk[:, None, :] - centers[None]) ** 2).sum(axis=-1)
        out[s : s + (1 << 20)] = np.argmin(d2, axis=1)
    return out


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
    btab=None,  # BoundaryTables; enables the specular-mirror cache fill
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
                    ids = nearest_center_ids(positions, domain.subvol_center)
                    bad = np.isin(ids, empty)
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
    sv = nearest_center_ids(positions, domain.subvol_center)
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

    # specular-mirror cache (see X_* columns): correspondence partner of each
    # particle's mode for the rough-wall normal family, with its cached
    # omega/velocity/lifetime; unfilled (-1) when no boundary tables given
    mirror = np.zeros((n_cap, M_COLS), dtype=np.float32)
    mirror[:, X_MODE] = np.full(n_cap, -1, np.int32).view(np.float32)
    use_slope = False
    if btab is not None and int(btab.n_rough) > 0:
        from nanokappa_tpu.sim.boundary_tables import combined_mirror_rows
        from nanokappa_tpu.sim.fused import slope_tau_active

        use_slope = slope_tau_active(geo, btab, params, mat)
        sc = combined_mirror_rows(btab, mat)  # (M,8) [p,corr,omega,v,..]
        if sc is None:
            sc = np.zeros((M, 8), np.float32)
            sc[:, 1] = np.full(M, -1, np.int32).view(np.float32)
        cm = sc[:, 1].view(np.int32)[modes]
        if params.scat_model in ("k", "wavevector", "wave_vector"):
            # k-model degenerate-branch split, pre-drawn at cache fill
            # (sim/fused.py kmodel_degen_split; reference
            # classes/Population.py:1017-1040)
            dp = np.asarray(btab.degen_partner)
            part = dp[np.clip(cm, 0, M - 1)]
            u_sp = rng.random(cm.shape[0])
            cm = np.where((cm >= 0) & (part >= 0) & (u_sp >= 0.5), part, cm)
        has = cm >= 0
        cmc = np.clip(cm, 0, M - 1)
        m_omega_c = mat.omega.reshape(-1)[cmc].astype(np.float32)
        m_vel_c = mat.group_vel.reshape(-1, 3)[cmc].astype(np.float32)
        tau_m = (1 - wt) * tau_flat[ti, cmc] + wt * tau_flat[ti + 1, cmc]
        mm = np.zeros((n_p, M_COLS), dtype=np.float32)
        mm[:, X_MODE] = cm.astype(np.int32).view(np.float32)
        mm[:, X_OMEGA] = np.where(has, m_omega_c, 0.0)
        mm[:, X_VEL] = np.where(has[:, None], m_vel_c, 0.0)
        if use_slope:
            # slope-form lifetimes (see X_TAU/X_TAUB docs + fused.py):
            # tau(T) = a + b*T, exactly the table lerp on the particle's
            # current T-grid bin
            dTb = np.maximum(mat.tau_T[ti + 1] - mat.tau_T[ti], 1e-30)
            ok = mat.tau_T[ti + 1] > mat.tau_T[ti]
            b_main = np.where(
                ok, (tau_flat[ti + 1, modes] - tau_flat[ti, modes]) / dTb, 0.0
            )
            a_main = tau_flat[ti, modes] - b_main * mat.tau_T[ti]
            b_mir = np.where(
                ok, (tau_flat[ti + 1, cmc] - tau_flat[ti, cmc]) / dTb, 0.0
            )
            a_mir = tau_flat[ti, cmc] - b_mir * mat.tau_T[ti]
            tau_p = a_main  # C_TAU holds the intercept in slope form
            mm[:, X_TAU] = np.where(has, a_mir, 0.0).astype(np.float32)
            mm[:, X_TAUB] = b_main.astype(np.float32)
            mm[:, X_MTAUB] = np.where(has, b_mir, 0.0).astype(np.float32)
        else:
            mm[:, X_TAU] = np.where(has, tau_m, 0.0)
        mirror[slots] = mm

    packed = np.zeros((n_cap, N_COLS), dtype=np.float32)
    packed[:, C_POS] = full(positions.astype(np.float32), 0.0)
    packed[:, C_VEL] = full(vel_p.astype(np.float32), 0.0)
    packed[:, C_OMEGA] = full(omega_p.astype(np.float32), 0.0)
    packed[:, C_TAU] = full(tau_p.astype(np.float32), 0.0)
    packed[:, C_DEV] = full(dev.astype(np.float32), 0.0)
    packed[:, C_MODE] = full(modes.astype(np.int32), 0).view(np.float32)
    packed[:, C_CF] = np.full(n_cap, STALE, np.int32).view(np.float32)
    packed[:, C_TCOLL] = np.inf
    packed[:, C_ONF] = np.full(n_cap, -1, np.int32).view(np.float32)
    packed[:, C_REM] = 0.0
    packed[:, C_ALIVE] = alive.astype(np.float32)
    packed[:, C_SV] = full(sv.astype(np.int32), 0).view(np.float32)
    state = SimState(
        packed=jnp.asarray(packed),
        mirror=jnp.asarray(mirror),
        sv_id=jnp.asarray(full(sv.astype(np.int32), 0)),
        T_sv=jnp.asarray(T_sv, dtype=jnp.float32),
        Np_sv=jnp.asarray(np.bincount(sv, minlength=SV).astype(np.int32)),
        T_tau=jnp.asarray(T_sv, dtype=jnp.float32),
        free_list=jnp.asarray(free_list),
        free_count=jnp.asarray(free_count),
        res_counter=jnp.asarray(
            rng.random((params.n_shards, R, M)).astype(np.float32)
        ),  # random phase, like reference classes/Population.py:343
        n_leaving=jnp.zeros(R, dtype=jnp.int32),
        res_energy_balance=jnp.zeros(R, dtype=jnp.float32),
        res_heat_flux=jnp.zeros((R, 3), dtype=jnp.float32),
        lost=jnp.zeros((3,), dtype=jnp.int32),
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
    from nanokappa_tpu.ops.raycast import raycast

    t, f = raycast(
        geo, state.pos, state.vel, jnp.full(state.packed.shape[0], -1, jnp.int32)
    )
    return with_cols(
        state,
        t_coll=(t / dt).astype(jnp.float32),
        coll_facet=jnp.where(state.alive, f, STALE),
    )
