"""Isothermal reservoir subsystem: entry probabilities and device injection.

Host side precomputes per-(reservoir, mode) entry probabilities
(reference `enter_probability`, classes/Population.py:146-161):

    enter_prob[r, m] = max(v_m . (-n_r), 0) * dt / bound_thickness_r,
    bound_thickness_r = N_active_modes / (particle_density * A_r).

Device side implements the three generation schemes of the reference
(classes/Population.py:356-523) with fixed-shape buffers:
  * 'constant'   — deterministic floor + per-mode fractional accumulator,
  * 'fixed_rate' — Bernoulli dice against the fractional part,
  * 'one_to_one' — regenerate exactly N_leaving by roulette over enter_prob.
Each injected particle receives a partial time-of-flight dt_in inside the
domain, a position sampled uniformly on the reservoir facet, and the
Bose-Einstein occupation at the reservoir temperature. Injected particles are
written into dead pool slots (cumsum rank matching); overflow is counted.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from nanokappa_tpu.geometry.device import DeviceGeometry
from nanokappa_tpu.geometry.domain import Domain
from nanokappa_tpu.material.tables import Material, MaterialTables
from nanokappa_tpu.sim.bose import occupation_delta_T
from nanokappa_tpu.sim.state import SimParams, SimState, STALE


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ReservoirTables:
    enter_prob: jax.Array  # (R,M) f32
    enter_cdf: jax.Array  # (R,M) f32 normalised cumulative enter_prob
    enter_alias: jax.Array  # (R,M,2) f32 Walker alias [accept p, bitcast
    #   partner id] — ONE row gather per draw instead of two scalar gathers
    enter_lambda: jax.Array  # (R,) f32 total entry rate per reservoir
    inj_props: jax.Array  # (R,M,5) f32 per-(reservoir, mode) injection
    #   properties [omega, vx, vy, vz, tau(T_res)]: collapses the separate
    #   omega_vel (M,4) and tau_pair (nT,M,2) gathers of the injection
    #   sampler into one contiguous row gather from a small table — at a
    #   31^3 mode table the tau_pair gather alone touched 71 MB
    n_reservoirs: int = field(metadata=dict(static=True))


def build_reservoir_tables(
    mat: Material,
    domain: Domain,
    dt: float,
    particle_density: float,
    dtype=jnp.float32,
) -> ReservoirTables:
    res = domain.res_facets
    R = len(res)
    M = mat.n_modes
    if R == 0:
        return ReservoirTables(
            enter_prob=jnp.zeros((0, M), dtype=dtype),
            enter_cdf=jnp.ones((0, M), dtype=dtype),
            enter_alias=jnp.zeros((0, M, 2), dtype=dtype),
            enter_lambda=jnp.zeros(0, dtype=dtype),
            inj_props=jnp.zeros((0, M, 5), dtype=dtype),
            n_reservoirs=0,
        )
    v = mat.group_vel.reshape(M, 3)
    normals = domain.mesh.facet_normals[res]  # outward
    areas = domain.mesh.facet_areas[res]
    bound_thickness = mat.n_active_modes / (particle_density * areas)  # (R,)
    proj = v @ (-normals.T)  # (M,R) projection on inward normals
    ep = np.maximum(proj.T * dt / bound_thickness[:, None], 0.0)  # (R,M)
    cdf = np.cumsum(ep, axis=1)
    cdf = cdf / cdf[:, -1:]
    from nanokappa_tpu.sim.boundary_tables import build_alias

    ap = np.ones((R, M))
    ai = np.zeros((R, M), dtype=np.int64)
    for r in range(R):
        ap[r], ai[r] = build_alias(ep[r])
    alias = np.stack(
        [ap.astype(np.float32), ai.astype(np.int32).view(np.float32)],
        axis=-1,
    )

    # per-(reservoir, mode) injection properties at the reservoir
    # temperature (flux facets read 0 K after nan_to_num, clamping the
    # lifetime lerp at the table edge — same as geometry/device.py:142)
    T_res = np.nan_to_num(np.asarray(domain.res_values, dtype=np.float64))
    tau_T = np.asarray(mat.tau_T, dtype=np.float64)
    tau2d = np.asarray(mat.tau, dtype=np.float64).reshape(len(tau_T), M)
    nT = len(tau_T)
    ti = np.clip(np.searchsorted(tau_T, T_res) - 1, 0, max(nT - 2, 0))
    hi = np.minimum(ti + 1, nT - 1)
    w = np.clip(
        (T_res - tau_T[ti]) / np.maximum(tau_T[hi] - tau_T[ti], 1e-30),
        0.0, 1.0,
    )
    tau_res = tau2d[ti] * (1.0 - w)[:, None] + tau2d[hi] * w[:, None]
    om = np.asarray(mat.omega).reshape(1, M).repeat(R, axis=0)
    props = np.concatenate(
        [om[:, :, None], v.reshape(1, M, 3).repeat(R, axis=0),
         tau_res[:, :, None]], axis=-1
    )
    return ReservoirTables(
        enter_prob=jnp.asarray(ep, dtype=dtype),
        enter_cdf=jnp.asarray(cdf, dtype=dtype),
        enter_alias=jnp.asarray(alias, dtype=dtype),
        enter_lambda=jnp.asarray(ep.sum(axis=1), dtype=dtype),
        inj_props=jnp.asarray(props, dtype=dtype),
        n_reservoirs=R,
    )


def autosize_inj_cap(rtab: ReservoirTables, n_shards: int = 1) -> int:
    """Injection-buffer width from the expected entry rate: every stage of
    the sampling pipeline (mode-table gathers, facet-surface placement,
    tail-append window) runs at this STATIC width, so an oversized buffer is
    a per-step tax whether or not lanes are used (~0.2 ms/step at the round-3
    default 8192 vs the film config's 2.4k actual). sum(enter_prob) IS the
    expected count (deterministic floor + Bernoulli fractional per (r, m),
    reference classes/Population.py:1217-1248); 1.3x + 128 covers the
    fractional-draw noise (Poisson-like sd = sqrt(frac sum) << margin)."""
    if rtab.n_reservoirs == 0:
        return 128
    exp = float(np.sum(np.asarray(rtab.enter_prob))) / max(n_shards, 1)
    return max(512, -(-int(1.3 * exp + 128) // 128) * 128)


def autosize_c_max(rtab: ReservoirTables, n_shards: int = 1) -> int:
    """Copies per (reservoir, mode) per step the deterministic generation
    lattice must materialise: floor(max enter rate) + 1 fractional. With a
    smaller c_max the generator CLIPS injections (counted into `lost`) —
    ~2%/step on the 1e6-particle film config, where thin bound layers push
    fast modes above 3 entries/step."""
    if rtab.n_reservoirs == 0:
        return 3
    max_ep = float(np.max(np.asarray(rtab.enter_prob))) / max(n_shards, 1)
    return max(3, int(max_ep) + 1)


def _select_rows(table: jax.Array, idx: jax.Array, R: int) -> jax.Array:
    """table[idx] for a TINY (R, K) f32 table via unrolled selects: XLA
    lowers even a 2-row gather at 31k lanes to ~0.34 ms of scalar loads,
    while R broadcast-selects are pure vector ops."""
    out = jnp.broadcast_to(table[0][None, :], (idx.shape[0], table.shape[1]))
    for r in range(1, R):
        out = jnp.where((idx == r)[:, None], table[r][None, :], out)
    return out


def sample_injections(
    state: SimState,
    geo: DeviceGeometry,
    mat: MaterialTables,
    rtab: ReservoirTables,
    params: SimParams,
    key: jax.Array,
    shard_idx: jax.Array | int = 0,
):
    """Generate this step's reservoir particles WITHOUT placing them.

    Returns (inj_rows (cap, 16) f32 packed rows — valid lanes first —
    n_valid, new_res_counter, dropped, props (cap, K) — the gathered
    per-(reservoir, mode) injection-table rows, so the caller can reuse
    trailing correspondence columns of an extended table without a second
    gather): the sampling half of `inject`,
    shared by the v1 step (which scatters rows into free-list slots) and
    the v2 step (which appends them contiguously at the pool tail).
    Under particle-axis sharding each shard runs the process at
    enter_prob/n_shards with its own accumulator (state.res_counter[0]).
    """
    from nanokappa_tpu.sim.state import N_COLS

    R, M = rtab.enter_prob.shape
    cap = params.inj_cap
    if R == 0:
        return (
            jnp.zeros((cap, N_COLS), jnp.float32),
            jnp.zeros((), jnp.int32),
            state.res_counter,
            jnp.zeros((), jnp.int32),
            jnp.zeros((cap, 5), jnp.float32),
        )
    dt = params.dt
    k_counts, k_dtin, k_pos1, k_pos2, k_tri, k_oto = jax.random.split(key, 6)

    ep = rtab.enter_prob / params.n_shards
    inj_mode = jnp.zeros(cap, dtype=jnp.int32)
    inj_res = jnp.zeros(cap, dtype=jnp.int32)
    inj_dtin = jnp.zeros(cap, dtype=jnp.float32)
    inj_valid = jnp.zeros(cap, dtype=bool)

    flat_r = (jnp.arange(R * M, dtype=jnp.int32) // M)
    flat_m = (jnp.arange(R * M, dtype=jnp.int32) % M)

    new_counter = state.res_counter

    if params.res_gen in ("constant", "fixed_rate"):
        fixed = jnp.floor(ep)
        if params.res_gen == "constant":
            # per-mode fractional accumulator (classes/Population.py:358-367)
            counter = state.res_counter[0] + (ep - fixed)
            extra = (counter >= 1.0).astype(ep.dtype)
            new_counter = (counter - extra)[None]
            frac1 = jnp.where(ep > 0, new_counter[0] / ep, 0.0)
        else:
            dice = jax.random.uniform(k_counts, (R, M))
            extra = (dice <= (ep - fixed)).astype(ep.dtype)
            frac1 = jnp.where(ep > 0, dice / ep, 0.0)
        counts = (fixed + extra).astype(jnp.int32).reshape(-1)  # (R*M,)

        # per-(r,m) counts above c_max cannot be materialised by the bounded
        # (c_max, R*M) lattice — count them into the loss telemetry instead
        # of silently under-injecting (a coarse mode table at high density
        # can push enter_prob above c_max)
        clipped = jnp.maximum(counts - params.c_max, 0).sum()

        # one stream compaction over the (c_max, R*M) copy lattice replaces
        # the round-2 implementation's 4 x c_max buffer scatters (~0.4 ms at
        # 8K width, XLA serialises scatters): lattice lane l = c*RM + rm is
        # occupied when counts[rm] > c; the fractional arrival-time table is
        # gathered with the SAME compacted order
        from nanokappa_tpu.sim.cascade import _compact

        RM = R * M
        u = jax.random.uniform(k_dtin, (params.c_max, RM))
        ep_flat = ep.reshape(-1)
        c_lat = jnp.arange(params.c_max, dtype=jnp.float32)[:, None]
        frac_lat = jnp.where(
            ep_flat[None, :] > 0, (c_lat + u) / ep_flat[None, :], 0.0
        )
        frac_lat = frac_lat.at[0].set(frac1.reshape(-1))
        lat_valid = counts[None, :] > jnp.arange(params.c_max)[:, None]
        order, n_valid = _compact(lat_valid.reshape(-1), cap)
        rm = jnp.minimum(order % RM, RM - 1)
        inj_mode = (rm % M).astype(jnp.int32)
        inj_res = (rm // M).astype(jnp.int32)
        frac = jnp.take(frac_lat.reshape(-1), order, mode="clip")
        inj_dtin = jnp.clip(dt * (1.0 - frac), 0.0, dt).astype(jnp.float32)
        total = counts.sum() - clipped
        inj_valid = jnp.arange(cap) < n_valid
        dropped_inj = jnp.maximum(total - n_valid, 0) + clipped

    elif params.res_gen == "pooled":
        # O(buffer)-cost generation for production-size mode tables: a SCALAR
        # fractional accumulator per reservoir fixes the total count
        # (deterministic like 'constant'); modes are drawn from the Walker
        # alias table of enter_prob (identical marginal distribution, pooled
        # rather than per-mode count variance); arrival times uniform in dt.
        lam = rtab.enter_lambda / params.n_shards  # (R,)
        acc = state.res_counter[0, :, 0] + lam
        n_r = jnp.floor(acc).astype(jnp.int32)  # (R,)
        new_counter = (
            state.res_counter.at[0, :, 0].set(acc - n_r.astype(acc.dtype))
        )
        boundaries = jnp.cumsum(n_r)
        lane = jnp.arange(cap, dtype=jnp.int32)
        inj_res = jnp.searchsorted(boundaries, lane, side="right").astype(
            jnp.int32
        )
        inj_res = jnp.minimum(inj_res, R - 1)
        inj_valid = lane < jnp.minimum(boundaries[-1], cap)
        M_tab = rtab.enter_alias.shape[1]
        # ONE uniform tensor serves every stochastic choice of this path
        # (alias slot, alias accept, arrival time, and the two facet-surface
        # coordinates): each jax.random call is its own ~15 us threefry op
        # plus an op-launch gap, and the step is op-count bound. The alias
        # slot uses floor(u * M) instead of randint's modulo-free bits —
        # the 2^-24 modulo bias is orders below Monte Carlo noise.
        u5 = jax.random.uniform(k_counts, (cap, 5))
        jdraw = jnp.minimum(
            (u5[:, 0] * M_tab).astype(jnp.int32), M_tab - 1
        )
        pa = rtab.enter_alias[inj_res, jdraw]  # (cap,2): one row gather
        accept = u5[:, 1] < pa[:, 0]
        inj_mode = jnp.where(
            accept, jdraw,
            jax.lax.bitcast_convert_type(pa[:, 1], jnp.int32),
        ).astype(jnp.int32)
        inj_dtin = (params.dt * u5[:, 2]).astype(jnp.float32)
        inj_upos = u5[:, 3:5]  # consumed by the box rectangle sampler below
        n_valid = inj_valid.sum(dtype=jnp.int32)
        dropped_inj = jnp.maximum(boundaries[-1] - n_valid, 0)

    elif params.res_gen == "one_to_one":
        # regenerate exactly n_leaving[r] particles per reservoir by roulette
        # (classes/Population.py:457-489); under sharding the global count is
        # split across shards (remainder to the low shards)
        per = cap // R
        n_shards = params.n_shards
        share = state.n_leaving // n_shards + (
            jnp.asarray(shard_idx, jnp.int32) < state.n_leaving % n_shards
        ).astype(jnp.int32)
        # Walker alias draw over enter_prob — distribution-identical to the
        # reference's cumsum roulette (classes/Population.py:457-489), and
        # O(1)/draw where a vmapped searchsorted over an M-wide CDF lowers
        # to a scalar binary-search while loop on TPU (measured 1 ms/step
        # for the analogous buffer-validity search at 19.5k lanes)
        M_tab = rtab.enter_alias.shape[1]
        jdraw = jax.random.randint(k_counts, (R, per), 0, M_tab)
        u = jax.random.uniform(k_oto, (R, per))
        pa = rtab.enter_alias[jnp.arange(R, dtype=jnp.int32)[:, None], jdraw]
        modes = jnp.where(
            u < pa[..., 0], jdraw,
            jax.lax.bitcast_convert_type(pa[..., 1], jnp.int32),
        ).astype(jnp.int32)  # (R,per)
        j = jnp.arange(per, dtype=jnp.int32)
        valid = j[None, :] < share[:, None]
        inj_mode = modes.reshape(-1)[:cap]
        inj_res = jnp.repeat(jnp.arange(R, dtype=jnp.int32), per)[:cap]
        inj_dtin = (dt * jax.random.uniform(k_dtin, (R, per))).reshape(-1)[:cap]
        inj_valid = valid.reshape(-1)[:cap]
        n_valid = inj_valid.sum(dtype=jnp.int32)
        dropped_inj = jnp.maximum(share.sum() - n_valid, 0)
    else:
        raise ValueError(f"unknown reservoir_gen '{params.res_gen}'")

    # compact valid entries to the front (cumsum-rank packing; cheaper than a
    # full argsort on TPU). The 'pooled' generator's validity mask is ALREADY
    # a prefix (lane < boundaries[-1]) with reservoir-sorted lanes, so its
    # compaction + three reorder gathers are identity ops — skipped (~0.1
    # ms/step at inj_cap=2.4k in the round-3 trace).
    if params.res_gen != "pooled":
        from nanokappa_tpu.sim.cascade import _compact

        order, _ = _compact(inj_valid, cap)
        order = jnp.minimum(order, cap - 1)  # sentinel lanes past n_valid
        inj_mode = inj_mode[order]
        inj_res = inj_res[order]
        inj_dtin = inj_dtin[order]

    # positions on the reservoir facet
    if geo.is_box and geo.res_rect.shape[0] == R:
        # box fast path: walls are rectangles — origin + u1*s1 + u2*s2 from
        # one (R,9) tiny-table row gather (same uniform-on-facet law as the
        # triangle-CDF sampler below)
        if params.res_gen == "pooled":
            u2 = inj_upos  # from the pooled path's single uniform tensor
        else:
            u2 = jax.random.uniform(k_pos1, (cap, 2))
        # R is tiny: unrolled selects beat an XLA gather (0.34 ms at 31k
        # lanes for a 2-row table) — same for every per-reservoir scalar
        rect = _select_rows(geo.res_rect, inj_res, R)  # (cap,9)
        inj_pos = (
            rect[:, 0:3]
            + u2[:, :1] * rect[:, 3:6]
            + u2[:, 1:2] * rect[:, 6:9]
        )
    else:
        # pick triangle by area CDF + barycentric (general facets)
        ut = jax.random.uniform(k_tri, (cap,))
        rows = geo.res_tri_cdf[inj_res]  # (cap,K); K small (tris/facet)
        # CDF inversion by counting (vmapped searchsorted lowers to a scalar
        # loop on TPU): index = #(cdf entries < u)
        t_in_row = (rows < ut[:, None]).sum(axis=1).astype(jnp.int32)
        t_in_row = jnp.minimum(t_in_row, geo.res_tri_cdf.shape[1] - 1)
        tri = geo.res_tri_idx[inj_res, t_in_row]  # (cap,)
        b = jax.random.uniform(k_pos1, (cap, 2))
        flip = b.sum(axis=1) > 1.0
        b = jnp.where(flip[:, None], 1.0 - b, b)
        inj_pos = (
            geo.tri_origin[tri]
            + b[:, :1] * geo.tri_e1[tri]
            + b[:, 1:] * geo.tri_e2[tri]
        )

    # occupation at reservoir temperature (classes/Population.py:505-506);
    # omega/velocity/tau(T_res) come from ONE row gather over the combined
    # (R,M,5) injection table (rtab.inj_props)
    T_res = _select_rows(geo.res_temperature[:, None], inj_res, R)[:, 0]
    props = rtab.inj_props[inj_res, inj_mode]  # (cap,5)
    inj_omega = props[:, 0]
    inj_vel = props[:, 1:4]
    inj_tau = props[:, 4]
    inj_dev = occupation_delta_T(T_res, params.t_reference, inj_omega)
    # facet ids are small ints — exact in f32, so select in float and cast
    # back (no bitcast denormal hazard)
    inj_facet = _select_rows(
        geo.res_facet.astype(jnp.float32)[:, None], inj_res, R
    )[:, 0].astype(jnp.int32)

    from nanokappa_tpu.sim.state import _bc_f32

    inj_rows = jnp.concatenate(
        [
            inj_pos,  # C_POS
            inj_vel,  # C_VEL
            inj_omega[:, None],
            inj_tau[:, None],
            inj_dev[:, None],
            _bc_f32(inj_mode)[:, None],
            _bc_f32(jnp.full(cap, STALE, jnp.int32))[:, None],  # C_CF
            jnp.full((cap, 1), jnp.inf, jnp.float32),  # C_TCOLL
            _bc_f32(inj_facet)[:, None],  # C_ONF
            (inj_dtin / dt).astype(jnp.float32)[:, None],  # C_REM
            jnp.ones((cap, 1), jnp.float32),  # C_ALIVE
            jnp.zeros((cap, 1), jnp.float32),  # C_SV (refreshed at binning)
        ],
        axis=1,
    )
    return inj_rows, n_valid, new_counter, dropped_inj, props


def inject(
    state: SimState,
    geo: DeviceGeometry,
    mat: MaterialTables,
    rtab: ReservoirTables,
    params: SimParams,
    key: jax.Array,
    shard_idx: jax.Array | int = 0,
    psum=lambda x: x,
):
    """Generate reservoir particles and write them into dead pool slots.

    Returns (new_state, stale_idx): injected slots are marked STALE (C_CF)
    with their partial time fraction dt_in/dt in C_REM; stale_idx lists the
    written slots (sentinel N on unused lanes) for the cascade's ray cast.
    """
    if rtab.n_reservoirs == 0:
        return (
            state,
            jnp.full(params.inj_cap, state.alive.shape[0], dtype=jnp.int32),
        )
    inj_rows, n_valid, new_counter, dropped_inj, _ = sample_injections(
        state, geo, mat, rtab, params, key, shard_idx
    )
    cap = params.inj_cap

    # --- write into dead slots ---------------------------------------------
    # pop slots from the persistent free list: everything at buffer width.
    # The whole injected particle is ONE packed row, so the write is a single
    # row scatter (didx_w slots are distinct; sentinel N lanes drop).
    N = state.alive.shape[0]
    n_free = state.free_count[0]
    n_used = jnp.minimum(n_valid, n_free)
    lane = jnp.arange(cap, dtype=jnp.int32)
    write = lane < n_used  # buffer lanes that hold a real particle
    didx = state.free_list[jnp.maximum(n_free - 1 - lane, 0)]
    didx_w = jnp.where(write, didx, N)  # sentinel -> dropped on scatter
    free_count = state.free_count.at[0].add(-n_used)

    packed = state.packed.at[didx_w].set(
        inj_rows, mode="drop", unique_indices=True
    )

    # capacity drops land in lost[0] (generator clip + free-list exhaustion)
    lost = state.lost.at[0].add(
        psum(dropped_inj + jnp.maximum(n_valid - n_used, 0))
    )

    new_state = SimState(
        packed=packed,
        mirror=state.mirror,
        sv_id=state.sv_id,
        T_sv=state.T_sv,
        Np_sv=state.Np_sv,
        T_tau=state.T_tau,
        free_list=state.free_list,
        free_count=free_count,
        res_counter=new_counter,
        n_leaving=state.n_leaving,
        res_energy_balance=state.res_energy_balance,
        res_heat_flux=state.res_heat_flux,
        lost=lost,
        frozen=state.frozen,
        key=state.key,
        step=state.step,
    )
    return new_state, didx_w
