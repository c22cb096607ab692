"""The fused (v2) timestep: ONE dense Pallas HBM pass + a narrow event stage.

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

Inside the inner scan the pool rides in the KERNEL-NATIVE 3-D layout:
state.packed is (16, NR, L) with lane p of attribute c at [c, p // L, p % L]
(L = ops.megastep.tile_width(N) // 8), which both Pallas kernels consume
directly — sim/step.py's build_step converts at the run() boundary only, so
no layout-conversion copy of the pool exists in the per-step path (the
(16, N) <-> blocked retile pair cost 0.24 ms/step at N=1.25e6 in the
round-3 trace; the earlier per-step transposes 0.5 ms).

Pipeline per step:
  1. reservoir injection rows (sim/reservoir.py sample_injections) APPEND at
     the pool tail — one contiguous dynamic-update-slice, replacing the
     round-3 XLA row scatter into free-list slots (0.78 ms/step: XLA
     serialises scattered row writes). Deaths leave holes; the pool is
     re-compacted once per outer block (ops/compact_pool.py), so the tail
     advances ~inj_cap per step between compactions. The tail pointer lives
     in state.free_count[0] (the free-list itself is idle in v2).
  2. ops/megastep.py drift kernel: deferred RTA + stale ray cast + drift +
     in-kernel periodic/absorb + event-index compaction + subvolume binning
     of every lane that stays, all on dense (8, BN8) registers (ONE HBM
     pass). Exported lanes are marked dead — they leave the pool,
  3. the narrow event machinery (sim/cascade.py run_event_buffer) handles
     reflections and deep chains on the gathered event rows,
  4. the finished event rows are binned at buffer width and APPENDED at the
     pool tail (the particle bag is unordered — no scatter-back, no merge
     pass; the round-3 merge+bin pass cost 0.98 ms/step at N=1.25e6),
  5. an O(SV) postlude inverts T(E) and assembles StepOutputs.

Tail-room invariant: appends advance the tail by up to EVT_CAP + inj_cap
per step and the pool defragments once per compaction interval
(sim/step.py build_step sizes the interval so the tail cannot reach
capacity between compactions).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from nanokappa_tpu.constants import EVPSA2_IN_WM2
from nanokappa_tpu.geometry.device import DeviceGeometry
from nanokappa_tpu.material.tables import MaterialTables
from nanokappa_tpu.sim.binning import (
    lookup_E_of_T, lookup_T_of_E, particle_energies, segment_matmul,
    subvol_id,
)
from nanokappa_tpu.sim.boundary_tables import BoundaryTables
from nanokappa_tpu.sim.cascade import _pad8, run_event_buffer
from nanokappa_tpu.sim.reservoir import ReservoirTables, sample_injections
from nanokappa_tpu.sim.state import (
    C_ALIVE, C_DEV, C_OMEGA, C_POS, C_SV, C_TAU, C_VEL, SimParams, SimState,
    _bc_f32,
)


FORCE_INTERPRET = False  # debug knob: run the Pallas kernels in interpret
#   mode even on TPU (scripts/; Mosaic-vs-interpret A/B isolation)


TRI_KERNEL_MAX = 128  # static-unroll budget of the in-kernel triangle cast
LARGE_TRI_MAX = 65536  # fused-step mesh bound BEYOND the in-kernel budget:
#   such configs run the fused kernel with kernel_cast=False — injections
#   pre-cast at buffer width and every boundary event exported to the
#   narrow machinery, whose ray cast is the Pallas bbox-prefiltered
#   large-mesh kernel (ops/raycast_pallas.py, 64k-triangle chunk cap)


def kernel_cast_ok(geo) -> bool:
    """Can the drift mega-kernel cast rays itself? Box slab math or a mesh
    within the static-unroll budget. Beyond it the fused step still runs,
    with kernel_cast=False (events export; Pallas large-mesh cast)."""
    return geo.is_box or int(geo.tri_origin.shape[0]) <= TRI_KERNEL_MAX


def dkern_active(geo, btab, params, mat, N_shard: int):
    """The in-kernel diffuse-reflection gate: returns the (cached)
    DiffusePool when the drift mega-kernel resolves rough-wall DIFFUSE
    reflections in-register (sim/diffuse_pool.py), else None.

    Active when the fused step casts in-kernel, the mirror fast path is NOT
    (eta > 0 walls — mutually exclusive by construction: mirror_eligible
    requires eta = 0 everywhere), there are rough walls with at most 8
    unique table rows, and the static temperature envelope spans <= 2
    lifetime-grid bins (build_diffuse_pool returns None otherwise).
    NANOKAPPA_NO_DKERN=1 disables the path (exact fallback: every rough hit
    exports to the narrow machinery, the round-4 behaviour)."""
    import os

    if os.environ.get("NANOKAPPA_NO_DKERN"):
        return None
    if btab is None or mat is None or int(btab.n_rough) == 0:
        return None
    if not kernel_cast_ok(geo):
        return None
    if mirror_eligible(geo, btab, params, mat):
        return None
    from nanokappa_tpu.ops.megastep import tile_width
    from nanokappa_tpu.sim.diffuse_pool import build_diffuse_pool

    bn = tile_width(N_shard)
    if bn is None:
        return None
    L = bn // 8
    n_tiles = N_shard // bn
    key = f"_dpool_{L}_{n_tiles}_{params.t_reference}"
    _MISSING = object()
    cached = getattr(btab, key, _MISSING)
    if cached is not _MISSING:
        return cached
    pool = build_diffuse_pool(geo, btab, mat, params, L, n_tiles)
    object.__setattr__(btab, key, pool)
    return pool


def dkern_mode_rows(btab, mat) -> jax.Array:
    """(M, 2) device table of the dkern pool's mode-derived rows:
    [|k|^2 (Ziman specularity), corr-existence bitmask over the NU table
    rows (float value < 256)]. Gathered per mode wherever a lane's mode is
    (re)set outside the kernel."""
    import numpy as np

    corr_h = btab._host["corr"]  # (NU, M)
    cm = np.zeros(corr_h.shape[1], np.float32)
    for f in range(corr_h.shape[0]):
        cm += (corr_h[f] >= 0).astype(np.float32) * float(1 << f)
    return jnp.stack(
        [
            jnp.sum(mat.wavevector * mat.wavevector, axis=1),
            jnp.asarray(cm),
        ],
        axis=1,
    )


def _dkern_facet_tables(geo, btab):
    """Per-FACET static tables for the kernel's rough-wall branch:
    (eta, front row, back row, two_sided) — facet-indexed so the kernel's
    static facet unroll can bake them as immediates."""
    import numpy as np

    from nanokappa_tpu.geometry.domain import BC

    bc = np.asarray(geo.facet_bc)
    F = len(bc)
    eta = np.nan_to_num(np.asarray(geo.facet_value)).astype(np.float64)
    row_f = np.zeros(F, np.int64)
    row_b = np.zeros(F, np.int64)
    fr = np.asarray(geo.facet_rough)
    row_of = np.asarray(btab.row_of_rough)
    row_back = np.asarray(btab.row_back)
    for f in np.nonzero(bc == int(BC.ROUGH))[0]:
        row_f[f] = row_of[fr[f]]
        row_b[f] = row_back[fr[f]]
    return dict(
        facet_eta=eta,
        facet_row=row_f,
        facet_row_back=row_b,
        two_sided=bool(np.any(row_f != row_b)),
    )


def autosize_evt_cap(
    geo, mat, params, use_mirror: bool, N_shard: int, btab=None
) -> int:
    """Default event-buffer width for the fused step.

    Mirror path: exports are 3+-bounce chains and no-correspondence lanes
    only (measured ~0.013% of N on the film config) — N/2048 with a floor.

    Non-mirror path: every ROUGH-wall hit exports to the narrow machinery,
    so the width must track the kinetic wall-collision rate
    rate = A_rough * vbar * dt / (4 V) (collisions per particle per step —
    kinetic theory; thin nanowires reach ~5%/step where the round-3 N/64
    default silently froze an ever-growing backlog). The kinetic estimate
    itself IS the margin: it consistently measures ~1.27x above the
    realised steady rate (round 4: 26.5k realised vs 33.7k estimated on
    the 8^3-table wire; round 5: ~32k realised vs 40.7k estimated on the
    31^3 wire — safe at 0.91x estimate with zero frozen lanes, catastrophic
    backlog at 0.74x), so the cap is 1.0x the estimate, clamped to
    [old N/64 floor, N/8]. The old 1.5x margin on top cost ~1.6 ms/step of
    width-scaled narrow-stage work on the 1e6 wire (6.8 -> 5.1 ms/step
    measured at 1.0x). Occasional overflow only freezes lanes for one
    step, and the driver's storm adaptation grows the cap on sustained
    overflow.

    kernel_cast-off path (large meshes): EVERY boundary hit exports —
    periodic and absorbing included — so the kinetic rate uses the TOTAL
    boundary area, not just the rough walls."""
    import numpy as np

    if use_mirror:
        return max(2048, N_shard // 2048)
    floor = max(params.inj_cap, N_shard // 64)
    if geo.n_facets == 0 or float(geo.volume) <= 0:
        return floor
    from nanokappa_tpu.geometry.domain import BC

    tri_f = np.asarray(geo.tri_facet)
    bc = np.asarray(geo.facet_bc)
    e1 = np.asarray(geo.tri_e1)
    e2 = np.asarray(geo.tri_e2)
    areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    if kernel_cast_ok(geo):
        evt_area = float(areas[bc[tri_f] == int(BC.ROUGH)].sum())
    else:
        evt_area = float(areas.sum())
    if evt_area == 0.0:
        return floor
    ov = np.asarray(mat.omega_vel)
    act = np.asarray(mat.active).astype(bool)
    v = np.linalg.norm(ov[:, 1:4], axis=1)
    vbar = float(v[act].mean()) if act.any() else float(v.mean())
    rate = evt_area * vbar * float(params.dt) / (4.0 * float(geo.volume))
    if (
        kernel_cast_ok(geo)
        and btab is not None
        and dkern_active(geo, btab, params, mat, N_shard) is not None
    ):
        # in-kernel diffuse path: only the Bernoulli's SPECULAR winners
        # (plus 3+-bounce chains and out-of-range lanes) export. The
        # kernel's effective specularity is ZERO where a mode has no
        # correspondence partner (the corr bitmask row), exactly the
        # corr-zeroed table the host stash holds — flux-weight it over
        # each row's incident distribution. +0.15 covers deep chains and
        # estimate noise; the driver's storm adaptation remains the
        # safety net.
        host = btab._host
        spec = host["specularity"]  # (NU, M), zeroed where corr < 0
        normals = host["u_normals"]  # (NU, 3)
        v3 = np.asarray(mat.omega_vel)[:, 1:4].astype(np.float64)
        p_max = 0.0
        for r in range(normals.shape[0]):
            dest = np.maximum(v3 @ normals[r], 0.0)
            tot = dest.sum()
            if tot > 0:
                p_max = max(p_max, float((dest * spec[r]).sum() / tot))
        frac = min(1.0, p_max + 0.15)
        floor = max(params.inj_cap, N_shard // 128)
        est = int(rate * N_shard * frac)
        return int(np.clip(est, floor, max(floor, N_shard // 8)))
    est = int(rate * N_shard)
    return int(np.clip(est, floor, max(floor, N_shard // 8)))


def v2_eligible(geo: DeviceGeometry, params: SimParams) -> bool:
    """The fused step covers the production envelope: axis-aligned box
    geometry (in-register slab ray cast) or any triangle mesh up to
    TRI_KERNEL_MAX triangles — every built-in primitive (cylinder, zigzag,
    corrugated, castle, star, freewire at default tessellation) and small
    imported STLs — via a statically-unrolled in-kernel Möller–Trumbore
    cast, or ANY mesh up to LARGE_TRI_MAX with kernel_cast off (injections
    pre-cast, events exported, Pallas large-mesh ray cast); slice
    subvolumes (nearest/linear interpolation, <= 512) or grid/voronoi
    subvolumes (nearest interpolation, <= 256 centres — the kernel's
    argmin unrolls up to 32 centres and walks the SMEM centre table in a
    fori_loop beyond), and a pool capacity aligned to the kernel tile (the
    driver and bench round n_cap up). Everything else (>64k-triangle STL,
    radial RBF interpolation, debug ablations) runs the v1 step."""
    from nanokappa_tpu.ops.megastep import tile_width

    if params.step_impl == "v1" or params.debug_skip:
        return False
    if not geo.is_box and geo.tri_origin.shape[0] > LARGE_TRI_MAX:
        return False
    if geo.subvol_type == "slice":
        if params.temp_interp not in ("nearest", "linear"):
            return False
        if geo.n_subvols > 512:
            return False
    elif geo.subvol_type in ("grid", "voronoi"):
        # beyond the 32-centre unroll budget the kernel argmin walks the
        # SMEM centre table in a fori_loop (ops/megastep.py _sv_of); the
        # remaining cap bounds the O(SV) per-lane loop cost
        if params.temp_interp != "nearest" or geo.n_subvols > 256:
            return False
    else:
        return False
    if geo.n_reservoirs > 7:
        return False
    if (
        params.n_cap % params.n_shards != 0
        or tile_width(params.n_cap // params.n_shards) is None
    ):
        return False
    if params.step_impl == "v2":
        return True
    return jax.default_backend() != "cpu"


def v2_fallback_reason(geo: DeviceGeometry, params: SimParams) -> str | None:
    """Why this configuration runs the v1 XLA step, or None when the fused
    v2 step is active. The driver logs the reason at startup — a silent ~10x
    performance cliff was round-3 weak point 6."""
    from nanokappa_tpu.ops.megastep import tile_width

    if v2_eligible(geo, params):
        return None
    if params.step_impl == "v1":
        return "step_impl='v1' was requested"
    if params.debug_skip:
        return f"debug_skip={params.debug_skip!r} ablation is active"
    F = int(geo.tri_origin.shape[0])
    if not geo.is_box and F > LARGE_TRI_MAX:
        return (
            f"mesh has {F} triangles > the large-mesh fused-step bound "
            f"LARGE_TRI_MAX={LARGE_TRI_MAX}"
        )
    if geo.subvol_type == "slice":
        if params.temp_interp not in ("nearest", "linear"):
            return f"temp_interp={params.temp_interp!r} needs the XLA path"
        if geo.n_subvols > 512:
            return f"{geo.n_subvols} slice subvolumes > the kernel cap 512"
    elif geo.subvol_type in ("grid", "voronoi"):
        if params.temp_interp != "nearest":
            return (
                f"temp_interp={params.temp_interp!r} on "
                f"{geo.subvol_type} subvolumes needs the XLA path"
            )
        if geo.n_subvols > 256:
            return (
                f"{geo.n_subvols} {geo.subvol_type} centres > the kernel "
                f"cap 256"
            )
    else:
        return f"subvolume type {geo.subvol_type!r} needs the XLA path"
    if geo.n_reservoirs > 7:
        return f"{geo.n_reservoirs} reservoirs > the kernel cap 7"
    if params.n_cap % params.n_shards != 0 or tile_width(
        params.n_cap // params.n_shards
    ) is None:
        return (
            f"pool capacity {params.n_cap}/{params.n_shards} shards does "
            f"not align to a kernel tile (ops/megastep.py tile_width)"
        )
    return "no TPU backend attached (v1 XLA runs on CPU)"


def _is_kmodel(params) -> bool:
    return params.scat_model in ("k", "wavevector", "wave_vector")


def kmodel_degen_split(btab, corr: jax.Array, key: jax.Array) -> jax.Array:
    """The reference's degenerate-branch energy split for k-model SPECULAR
    reflections (classes/Population.py:1017-1040, select_reflected_modes
    :941-988): with probability 1/2 the outgoing mode swaps to its
    equal-frequency partner branch. The in-kernel mirror cache PRE-DRAWS
    this at cache-FILL time (injection / event re-entry / init): the next
    reflection's marginal is exactly 50/50 and successive reflections
    alternate through the cached pair (mode <-> partner), which the
    energy-degenerate observables cannot distinguish from per-event
    redraws (equal omega; only the branch velocity differs, re-randomised
    at every RE-fill). Lanes whose events still ride the narrow machinery
    get the ordinary per-event draw there (sim/cascade.py)."""
    partner = btab.degen_partner[jnp.clip(corr, 0, btab.degen_partner.shape[0] - 1)]
    u = jax.random.uniform(key, corr.shape)
    return jnp.where((corr >= 0) & (partner >= 0) & (u >= 0.5), partner, corr)


def mirror_eligible(geo: DeviceGeometry, btab, params: SimParams, mat=None) -> bool:
    """In-kernel specular fast path: at least one rough facet, every rough
    row sharing ONE correspondence table (opposite-normal walls of the same
    plane family mirror identically), and specularity exactly 1 wherever a
    correspondence exists (eta = 0, Ziman p = 1 — the reference treats such
    walls as fully specular, classes/Population.py:941-971). Reflections
    then resolve inside the drift kernel as a cached-mirror register swap;
    only multi-bounce chains and no-correspondence lanes reach the narrow
    event machinery, so the event buffer shrinks ~25x (sim/fused.py EVT_CAP
    default). Holds for BOTH scattering models: the k (wavevector) model's
    correspondence table (classes/Population.py:1058-1239) is just as
    static, and its degenerate-branch split is pre-drawn at cache-fill time
    (kmodel_degen_split)."""
    import numpy as np

    from nanokappa_tpu.sim.boundary_tables import combined_mirror_rows

    if btab is None or mat is None or int(btab.n_rough) == 0:
        return False
    if not kernel_cast_ok(geo):
        # the register-swap reflection needs the in-kernel re-cast, which
        # large meshes do not have (kernel_cast=False)
        return False
    from nanokappa_tpu.sim.boundary_tables import _host_table

    spec = _host_table(btab, "specularity")
    corr = _host_table(btab, "corr")
    if not np.all((spec == 1.0) | (corr < 0)):  # eta = 0 everywhere
        return False
    rows = combined_mirror_rows(btab, mat)
    if rows is None:
        return False
    # coverage gate: the mirror path's event-buffer sizing (EVT_CAP ~
    # N/2048) assumes nearly every reflection resolves in-register. A
    # sparse map (e.g. a k-grid that does not mirror onto a wall family —
    # the velocity model can still fail on curved/odd-angle walls) would
    # export most reflections through the w_exp-bounded scalar extraction
    # and freeze the overflow every step. Require >= 95% of the modes that
    # can actually hit a rough wall (v . n_wall > 0) to carry a partner.
    from nanokappa_tpu.geometry.domain import BC

    cur = np.asarray(rows)[:, 1].view(np.int32)
    v = np.asarray(mat.omega_vel)[:, 1:4] if hasattr(
        mat, "omega_vel") else None
    if v is None:
        from nanokappa_tpu.sim.boundary_tables import _mode_tables

        v, _, _ = _mode_tables(mat)
    bc = np.asarray(geo.facet_bc)
    normals = np.asarray(geo.facet_normal)[bc == int(BC.ROUGH)]
    need = np.zeros(cur.shape[0], bool)
    for n in normals:
        need |= (v @ n) > 1e-12
    if not need.any() or (cur[need] >= 0).mean() < 0.95:
        return False
    return True


def _append_window(
    pool3: jax.Array,  # (16, NR, L) kernel-native pool layout
    rows_T: jax.Array,  # (16, cap) rows to append
    valid: jax.Array,  # (cap,) bool — which lanes actually land
    tail: jax.Array,  # () i32 flattened-lane append position
):
    """Append `rows_T` at flattened lanes [tail, tail + cap) of the 3-D pool
    with ONE rectangular dynamic-update-slice over whole L-lane rows.

    The window spans the rows covering the range; the rows are PLACED at the
    in-row offset with a dynamic-update-slice into a zero staging buffer (a
    SMALL (16, ~cap) op — never the pool). NOT jnp.roll: a dynamic-shift
    roll on TPU lowers through an arithmetic path that canonicalises NaNs
    and flushes denormals, which corrupts the bitcast integer columns of the
    packed rows (C_CF = STALE(-2) is a NaN payload; small mode/facet ids are
    denormals) — dynamic_update_slice is pure data movement and
    bit-preserving. Lanes outside [tail, tail + cap) or with valid=False
    keep the window's existing content. Returns (pool3', ok); ok=False means
    the pool had no tail room and NOTHING was written (callers count the
    drop)."""
    C, NR, L = pool3.shape
    cap = rows_T.shape[1]
    N = NR * L
    capk = cap // L + 2  # rows covering off + cap for any in-row offset
    row_t = jnp.minimum(tail // L, NR - capk)
    ok = tail + cap <= N
    # row_t clamping keeps the slice in bounds; given ok, the in-window
    # offset always satisfies off + cap <= capk * L (at the clamp,
    # off <= N - cap - (NR - capk) * L = capk * L - cap), so the placed
    # rows never clip
    off = jnp.maximum(tail - row_t * L, 0)
    window = jax.lax.dynamic_slice(pool3, (0, row_t, 0), (C, capk, L))
    flat = window.reshape(C, capk * L)
    src = jax.lax.dynamic_update_slice(
        jnp.zeros((C, capk * L), rows_T.dtype), rows_T, (0, off)
    )
    vmask = jax.lax.dynamic_update_slice(
        jnp.zeros(capk * L, bool), valid, (off,)
    )
    keep = ok & vmask
    new_flat = jnp.where(keep[None, :], src, flat)
    return (
        jax.lax.dynamic_update_slice(
            pool3, new_flat.reshape(C, capk, L), (0, row_t, 0)
        ),
        ok,
    )


def slope_tau_active(geo, btab, params, mat) -> bool:
    """SLOPE-FORM lifetimes are active exactly when the v2 mirror fast path
    runs: C_TAU/X_TAU hold the intercepts and X_TAUB/X_MTAUB the slopes of
    tau(T) = a + b*T on each particle's current T-grid bin (exactly the
    lifetime table's lerp within the bin, sim/scatter.py slope_pair). The
    kernel then evaluates tau continuously from the subvolume temperature,
    and the full-pool tau refresh (two ~10 ms N-wide gathers at 31^3) runs
    only when a subvolume temperature CROSSES a grid-bin boundary —
    effectively never on a converging film — instead of every 0.05 K of
    drift."""
    return v2_eligible(geo, params) and mirror_eligible(
        geo, btab, params, mat
    )


def _mirror_assemble(mat, mode, corr, m_omega, m_vel, sv, T_sv):
    """(mrows (E, M_COLS), tau_a) from already-gathered correspondence
    columns: the SLOPE-FORM lifetime pairs of the main and mirror modes
    share one set of per-lane bin metadata (sim/scatter.py slope_pair
    semantics, inlined — this stage is op-launch bound)."""
    M = mat.tau.shape[1]
    has = corr >= 0
    corr_c = jnp.clip(corr, 0, M - 1)
    nT = mat.tau_T.shape[0]
    i_sv = jnp.clip(
        jnp.searchsorted(mat.tau_T, T_sv) - 1, 0, max(nT - 2, 0)
    )
    i = i_sv[jnp.clip(sv, 0, T_sv.shape[0] - 1)]
    T_lo = mat.tau_T[i]
    dT = mat.tau_T[jnp.minimum(i + 1, nT - 1)] - T_lo
    # division form, NOT multiply-by-reciprocal: must match scatter.py
    # slope_pair bit-for-bit so slim- and full-path caches agree exactly
    dTc = jnp.maximum(dT, 1e-30)
    ok_dT = dT > 0
    tp2 = mat.tau_pair.reshape(-1, 2)
    pair = tp2[i * M + jnp.clip(mode, 0, M - 1)]
    pair_m = tp2[i * M + corr_c]
    tau_b = jnp.where(ok_dT, (pair[:, 1] - pair[:, 0]) / dTc, 0.0)
    tau_a = pair[:, 0] - tau_b * T_lo
    m_b = jnp.where(ok_dT, (pair_m[:, 1] - pair_m[:, 0]) / dTc, 0.0)
    m_a = pair_m[:, 0] - m_b * T_lo
    mrows = jnp.concatenate(
        [
            _bc_f32(corr)[:, None],
            jnp.where(has, m_omega, 0.0)[:, None],
            jnp.where(has[:, None], m_vel, 0.0),
            jnp.where(has, m_a, 0.0)[:, None],  # X_TAU = a_mirror
            tau_b[:, None],  # X_TAUB = b_main
            jnp.where(has, m_b, 0.0)[:, None],  # X_MTAUB = b_mirror
        ],
        axis=1,
    )
    return mrows, tau_a


def _mirror_rows(btab, mat, rows, T_sv, geo, params, sv=None, split_key=None):
    """Specular-mirror cache rows for mode-changed particle rows
    (narrow-machinery outputs): one row gather from the combined wall table
    ([p, corr, omega[corr], v[corr]]) + _mirror_assemble. Injections skip
    this gather — their combined per-reservoir table already carries the
    correspondence columns (make_step_v2 inj_ext).

    Returns (mrows (E, M_COLS), tau_a (E,)): the mirror rows and the main
    mode's intercept, which the caller writes into the rows' C_TAU column
    (slope form holds whenever the mirror cache is active)."""
    from nanokappa_tpu.sim.state import C_MODE, _bc_i32

    from nanokappa_tpu.sim.boundary_tables import combined_mirror_rows

    mode = _bc_i32(rows[:, C_MODE])
    M = btab.spec2.shape[1]
    mtab = jnp.asarray(combined_mirror_rows(btab, mat))
    sc = mtab[jnp.clip(mode, 0, M - 1)]  # (E, 8)
    corr = jax.lax.bitcast_convert_type(sc[:, 1], jnp.int32)
    if sv is None:
        sv = subvol_id(geo, rows[:, C_POS])
    if split_key is not None:
        # k-model degenerate-branch split, pre-drawn at cache fill
        # (kmodel_degen_split docstring)
        corr = kmodel_degen_split(btab, corr, split_key)
        ov_e = mat.omega_vel[jnp.clip(corr, 0, M - 1)]
        m_om, m_v = ov_e[:, 0], ov_e[:, 1:4]
    else:
        m_om, m_v = sc[:, 2], sc[:, 3:6]
    return _mirror_assemble(
        mat, jnp.clip(mode, 0, M - 1), corr, m_om, m_v, sv, T_sv
    )


def make_step_v2(
    geo: DeviceGeometry,
    mat: MaterialTables,
    btab: BoundaryTables,
    rtab: ReservoirTables,
    params: SimParams,
    axis_name: str | None = None,
    vary_axes: tuple | None = None,
):
    from nanokappa_tpu.ops.megastep import drift_megastep, tile_width
    from nanokappa_tpu.sim.step import StepOutputs

    interpret = jax.default_backend() == "cpu" or FORCE_INTERPRET
    kernel_cast = kernel_cast_ok(geo)
    use_mirror = mirror_eligible(geo, btab, params, mat)
    N_shard_b = params.n_cap // max(1, params.n_shards)
    dpool = dkern_active(geo, btab, params, mat, N_shard_b)
    use_dkern = dpool is not None
    if use_dkern:
        dk_facets = _dkern_facet_tables(geo, btab)
        # per-mode derived rows 16/17 of the dkern pool: [|k|^2,
        # corr-existence bitmask] — refilled wherever the narrow machinery
        # changes a lane's mode (ONE (E, 2) row gather)
        dk2tab = dkern_mode_rows(btab, mat)
    # SLIM mirror cache (18-row combined pool): partner mode id + main tau
    # slope only — exact when the correspondence is the crystal-symmetry
    # mirror on one axis-aligned wall family (boundary_tables.slim_mirror_axis)
    from nanokappa_tpu.sim.boundary_tables import slim_mirror_axis

    import numpy as _np

    # k-model WITH degenerate branches: the cache-fill pre-draws the 50/50
    # partner split (kmodel_degen_split) — the partner is then not always
    # the exact crystal mirror, so the SLIM cache's bitwise-equality gate
    # does not apply
    kdegen = (
        use_mirror
        and _is_kmodel(params)
        and bool(int(_np.max(_np.asarray(btab.degen_partner))) >= 0)
    )
    slim_axis = (
        slim_mirror_axis(geo, btab, mat)
        if (use_mirror and not kdegen) else None
    )
    slim = slim_axis is not None
    # slope-form lifetime clamp range (one host sync at build time)
    import numpy as _np

    tau_bounds = (
        (float(_np.asarray(mat.tau_T[0])), float(_np.asarray(mat.tau_T[-1])))
        if use_mirror
        else None
    )
    if use_mirror and rtab.n_reservoirs > 0:
        # extend the per-(reservoir, mode) injection table with the
        # specular-correspondence columns [corr_bits, omega[corr], v[corr]]
        # so injections build their mirror-cache rows from the SAME row
        # gather (the separate (M, 8) wall-table gather cost 0.4 ms/step at
        # inj_cap ~ 24k, 1e7 particles)
        from nanokappa_tpu.sim.boundary_tables import combined_mirror_rows

        _sc = _np.asarray(combined_mirror_rows(btab, mat))  # (M, 8)
        _ip = _np.asarray(rtab.inj_props)  # (R, M, 5)
        # slim cache: only the corr column is needed (the partner's
        # omega/vel/tau are bitwise redundant under the slim gate)
        _w = 2 if slim else 6
        _ext = _np.concatenate(
            [
                _ip,
                _np.broadcast_to(
                    _sc[None, :, 1:_w],
                    (_ip.shape[0], _sc.shape[0], _w - 1),
                ),
            ],
            axis=-1,
        )  # (R, M, 10) full / (R, M, 6) slim
        rtab = dataclasses.replace(rtab, inj_props=jnp.asarray(_ext))
    if use_dkern and rtab.n_reservoirs > 0:
        # injections carry their mode's [|k|^2, corr bitmask] as columns
        # 5-6 of the injection table (pool rows 16-17) — same
        # no-second-gather trick as the mirror correspondence columns above
        _d2 = _np.asarray(dk2tab)  # (M, 2)
        _ip = _np.asarray(rtab.inj_props)  # (R, M, 5)
        _ext = _np.concatenate(
            [
                _ip,
                _np.broadcast_to(
                    _d2[None], (_ip.shape[0],) + _d2.shape
                ),
            ],
            axis=-1,
        )  # (R, M, 7)
        rtab = dataclasses.replace(rtab, inj_props=jnp.asarray(_ext))

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
    evt_default_build = autosize_evt_cap(
        geo, mat, params, use_mirror,
        params.n_cap // max(1, params.n_shards), btab=btab,
    )

    def step(state: SimState, _=None):
        # inside build_step's scan the pool rides in the kernel-native 3-D
        # layout (16, NR, L) (see ops/megastep.py drift_megastep); direct
        # make_step callers pass the plain (N, 16) layout — honour both (the
        # orientation is static at trace time)
        # On the mirror fast path the pool rides COMBINED: (24, NR, L)
        # with the specular-mirror cache as rows 16..23 — one block spec,
        # one append window, one compaction stream for both halves.
        CW = 18 if (slim or use_dkern) else (24 if use_mirror else 16)
        plain_layout = state.packed.ndim == 2
        if plain_layout:
            N = state.packed.shape[0]
            L = tile_width(N) // 8
            pool3 = state.packed.T.reshape(16, N // L, L)
            if use_mirror:
                from nanokappa_tpu.sim.state import X_MODE, X_TAUB

                mside = (
                    state.mirror[:, (X_MODE, X_TAUB)]
                    if slim
                    else state.mirror
                )
                pool3 = jnp.concatenate(
                    [pool3, mside.T.reshape(CW - 16, N // L, L)], axis=0
                )
                mirror3 = None
            elif use_dkern:
                # rows 16-17 = [|k|^2, corr bitmask] of each lane's mode,
                # derived fresh (one N-wide small-table gather per
                # make_step call — the scan harness does this once per
                # run() boundary instead)
                dcols = dk2tab[
                    jnp.clip(state.mode, 0, dk2tab.shape[0] - 1)
                ]
                pool3 = jnp.concatenate(
                    [pool3, dcols.T.reshape(2, N // L, L)], axis=0
                )
                mirror3 = state.mirror
            else:
                mirror3 = state.mirror
        else:
            pool3 = state.packed
            mirror3 = None if use_mirror else state.mirror
        C, NR, L = pool3.shape
        N = NR * L
        BN = tile_width(N)
        assert C == CW and BN is not None and BN // 8 == L, (C, NR, L)
        if plain_layout:
            # direct make_step callers never see build_step's per-block
            # defragmentation, and init_state spreads particles across the
            # pool (shard balance) — the tail-append injection below needs a
            # dense alive prefix, so compact every step on this compat path
            from nanokappa_tpu.ops.compact_pool import compact_pool

            pool3, _, tail0 = compact_pool(
                pool3, None, interpret=interpret, vma=vary,
            )
            state = dataclasses.replace(
                state, free_count=state.free_count.at[0].set(tail0)
            )
        # the v2 buffer only holds REFLECTIONS and deep chains (periodic and
        # absorbing events resolve inside the drift kernel)
        # default sized from the measured steady-state event rate of the film
        # config (12k pending/step at N=1.25e6 = N/105, scripts/count_events:
        # reflections only; periodic+absorb resolve in-kernel) with a 1.6x
        # burst margin; overflow freezes lanes for one step (counted, and the
        # driver warns on sustained storms)
        # with the in-kernel specular path, the buffer only carries
        # 3+-bounce chains and no-correspondence diffuse lanes (measured
        # ~0.013% of N on the film config vs 1.2% of reflections), and rows
        # pack TIGHTLY (no per-block alignment waste), so N/2048 still
        # leaves ~4x steady-state margin — every narrow-stage op runs at
        # this width, 0.9 ms/step of gathers at the old N/512 and 1e7.
        # Without the mirror the width tracks the kinetic rough-wall
        # collision rate (autosize_evt_cap — thin nanowires reach ~5%/step
        # where a flat N/64 silently froze an ever-growing backlog).
        # Computed at BUILD time (host reads of mat are forbidden in the
        # traced body when sim/step.py parameterizes the tables).
        EVT_CAP = -(-(params.evt_cap or evt_default_build) // 128) * 128
        key = jax.random.fold_in(state.key, state.step)
        key = jax.random.fold_in(key, shard_idx())
        k_inj, k_casc = jax.random.split(key)

        # 1. injection rows appended at the pool tail (no scatter). When the
        # tail has no room for the full window the whole batch is dropped and
        # counted (compaction restores headroom every outer block; sustained
        # drops mean the pool is undersized for the injection rate).
        cap = params.inj_cap
        if R > 0:
            (inj_rows, n_valid, new_counter, dropped,
             inj_props) = sample_injections(
                state, geo, mat, rtab, params, k_inj, shard_idx()
            )
            tail = state.free_count[0]
            valid_inj = jnp.arange(cap, dtype=jnp.int32) < n_valid
            if use_mirror:
                # correspondence columns ride the injection-table row
                # already gathered by sample_injections (no extra gather)
                from nanokappa_tpu.sim.state import C_MODE, _bc_i32

                mode_inj = jnp.clip(
                    _bc_i32(inj_rows[:, C_MODE]), 0, mat.tau.shape[1] - 1
                )
                sv_inj = subvol_id(geo, inj_rows[:, C_POS])
                if slim:
                    from nanokappa_tpu.sim.scatter import slope_pair

                    a_inj, b_inj = slope_pair(
                        mat, state.T_sv, sv_inj, mode_inj
                    )
                    inj_rows = inj_rows.at[:, C_TAU].set(a_inj)
                    mrows_inj = jnp.stack(
                        [inj_props[:, 5], b_inj], axis=1
                    )  # [corr bits, shared slope b]
                else:
                    corr_inj = _bc_i32(inj_props[:, 5])
                    if kdegen:
                        # k-model: pre-draw the degenerate-branch split and
                        # regather the EFFECTIVE partner's properties
                        corr_inj = kmodel_degen_split(
                            btab, corr_inj,
                            jax.random.fold_in(k_inj, 0x5EED),
                        )
                        ov_i = mat.omega_vel[
                            jnp.clip(corr_inj, 0, mat.tau.shape[1] - 1)
                        ]
                        m_om_i, m_v_i = ov_i[:, 0], ov_i[:, 1:4]
                    else:
                        m_om_i, m_v_i = inj_props[:, 6], inj_props[:, 7:10]
                    mrows_inj, tau_a_inj = _mirror_assemble(
                        mat, mode_inj, corr_inj, m_om_i, m_v_i,
                        sv_inj, state.T_sv,
                    )
                    # slope form: C_TAU carries the intercept (X_TAUB the
                    # slope)
                    inj_rows = inj_rows.at[:, C_TAU].set(tau_a_inj)
                # combined pool: ONE window appends particle + mirror rows
                inj_rows = jnp.concatenate([inj_rows, mrows_inj], axis=1)
            if use_dkern:
                # [|k|^2, corr bitmask] columns ride the already-gathered
                # injection-table row (pool rows 16-17)
                inj_rows = jnp.concatenate(
                    [inj_rows, inj_props[:, 5:7]], axis=1
                )
            if not kernel_cast:
                # pre-cast at buffer width (the kernel cannot): the Pallas
                # large-mesh kernel / XLA scan via the raycast dispatch.
                # Freshness rides the SIGN of C_TCOLL (t_enc = -t/dt - 1 <
                # 0) with the REAL facet in C_CF — decoded by this step's
                # kernel (ops/megastep.py step 2), so the lane still skips
                # the deferred RTA it predates
                from nanokappa_tpu.ops.raycast import raycast
                from nanokappa_tpu.sim.state import (
                    C_CF, C_ONF, C_TCOLL, _bc_i32,
                )

                t_b, f_b = raycast(
                    geo, inj_rows[:, C_POS], inj_rows[:, C_VEL],
                    _bc_i32(inj_rows[:, C_ONF]),
                )
                inj_rows = inj_rows.at[:, C_TCOLL].set(
                    -(t_b / params.dt) - 1.0
                ).at[:, C_CF].set(_bc_f32(f_b))
            pool3, ok = _append_window(pool3, inj_rows.T, valid_inj, tail)
            tail = tail + jnp.where(ok, n_valid, 0)
            lost_inj = dropped + jnp.where(ok, 0, n_valid)
        else:
            new_counter = state.res_counter
            tail = state.free_count[0]
            lost_inj = jnp.zeros((), jnp.int32)

        # 2. drift mega-kernel (one dense HBM pass): drift + in-kernel
        # periodic/absorb + event-index export into 128-aligned segments of
        # ONE global buffer + subvolume binning of every lane that stays.
        # Exported lanes leave the pool (marked dead) — their results
        # re-enter by appending at the tail below, so NO merge pass exists.
        if use_dkern:
            # per-step presample-block offset and PRNG seed: mixed with the
            # shard index and the run key so shards and independent runs
            # consume decorrelated presample streams (sim/diffuse_pool.py
            # 'Statistics')
            kraw = state.key
            if kraw.dtype != jnp.uint32:
                kraw = jax.random.key_data(kraw)
            kd0 = jax.lax.bitcast_convert_type(
                kraw.reshape(-1)[-1], jnp.int32
            )
            dk_off = (
                state.step * dpool.stride
                + jnp.asarray(shard_idx(), jnp.int32) * 17
                + (kd0 & 0x7FFF)
            ) % dpool.nb
            dk_seed = (
                state.step * jnp.int32(1000003)
                + jnp.asarray(shard_idx(), jnp.int32) * jnp.int32(7919)
                + kd0
            )
            dk = dict(
                pool=dpool, window=dpool.window, off=dk_off, seed=dk_seed,
                **dk_facets,
            )
        else:
            dk = None
        (pool3_d, evt_buf, ecnt, _acnt, starts_c, ecnt_c, kledger,
         kbins) = drift_megastep(
            pool3, state.T_sv, state.step > 0, geo, params,
            ecap=EVT_CAP, interpret=interpret, vma=vary,
            export_rows=use_mirror,
            dk=dk,
            # per-tile export window: 256 covers the measured tail-tile
            # clustering (event survivors re-enter at the pool tail; max
            # per-tile pend observed ~23 at 1e7) — widening to 1024 changed
            # nothing in frozen counts but cost the kernel ~0.5 ms/step at
            # 1e7 in wider RMW windows
            w_exp=min(256, EVT_CAP),
            tau_bounds=tau_bounds if use_mirror else None,
            kernel_cast=kernel_cast,
        )
        frozen_k = jnp.sum(ecnt - ecnt_c)

        # 3. event machinery on the exported/gathered rows (reflections,
        # deep chains). On the mirror path the kernel exports the ROWS
        # themselves, TIGHTLY packed (ops/megastep.py step 5.9) — no
        # full-pool layout-conversion copy, no row gather (0.25 + 0.15
        # ms/step at N=1.25e6 in the round-3 trace), and validity is one
        # prefix extent. The index path remains for mirror-off configs,
        # whose event rate makes in-kernel scalar extraction slower than
        # the XLA gather.
        if use_mirror:
            vbuf = jnp.arange(EVT_CAP, dtype=jnp.int32) < jnp.sum(ecnt_c)
            rows = evt_buf[:16, :EVT_CAP].T  # (EVT_CAP, 16); the exported
            #   mirror rows 16..23 are superseded by the rebuild below
            #   (event lanes usually change mode in the machinery)
        else:
            # Buffer-lane validity from the per-block segment extents: lanes
            # beyond the LAST block's DMA window are UNINITIALISED device
            # memory (each block sentinel-fills only its own window; when
            # few events occur, coverage [0, starts[-1] + BN) can stop short
            # of EVT_CAP and the tail garbage can alias real pool indices —
            # duplicating alive rows through the append path). The per-block
            # valid intervals [start, start + kept) are disjoint and never
            # overwritten (the next start is 128-aligned past the previous
            # interval), so validity is membership in ANY interval — one
            # (EVT_CAP, nb) compare matrix, no gathers (jnp.searchsorted
            # here lowered to a scalar binary-search while loop: 1.0 ms/step
            # at EVT_CAP=19.5k).
            lane_b = jnp.arange(EVT_CAP, dtype=jnp.int32)[:, None]
            seg_valid = jnp.any(
                (lane_b >= starts_c[None, :])
                & (lane_b < (starts_c + ecnt_c)[None, :]),
                axis=1,
            )
            evt_idx = evt_buf[:EVT_CAP]
            vbuf = (evt_idx < N) & seg_valid
            idx_c = jnp.minimum(evt_idx, N - 1)
            # gather only the 16 base rows the machinery consumes: the
            # tile-aligned (16, N) view keeps the column gather on its fast
            # path (a 17/18-tall gather measured 4x slower — ragged
            # sublane tiles), and the dkern derived rows are rebuilt from
            # the mode table at append time anyway
            rows = jnp.take(
                pool3_d.reshape(C, N)[:16], idx_c, axis=1, mode="clip"
            ).T
        rows_out, mledger, lost_stuck, lost_def, frozen2 = run_event_buffer(
            rows, vbuf, geo, mat, btab, params, k_casc, state.T_sv, R8,
            pvary,
            # mirror path: the buffer is ALREADY the deep-chain tail — keep
            # the E//4 default. Kinetic path: first-bounce events dominate
            # (0 survivors in 16x26.5k wire trials), so rounds 2+ run at
            # E//16 width; overflow freezes one step and the driver's storm
            # adaptation grows evt_cap (and this width with it).
            # On the in-kernel-diffuse path the buffer is mostly specular
            # lanes whose reflection can chain — rounds 2+ get a wider E/8.
            evt2_cap=None if use_mirror else (
                EVT_CAP // 8 if use_dkern else EVT_CAP // 16
            ),
        )

        # 4. narrow-stage binning of the event rows (their end-of-step
        # state); together with the kernel's in-pool sums this partitions
        # the population exactly (sim/binning.py:124-167 semantics)
        alive_e = (rows_out[:, C_ALIVE] > 0.5) & vbuf
        sv_e = subvol_id(geo, rows_out[:, C_POS])
        e_e = particle_energies(
            rows_out[:, C_OMEGA], rows_out[:, C_DEV], alive_e,
            state.T_sv[sv_e], params.t_reference,
        )
        vel_e = jnp.where(alive_e[:, None], rows_out[:, C_VEL], 0.0)
        vals_e = jnp.concatenate(
            [e_e[:, None], e_e[:, None] * vel_e,
             alive_e.astype(jnp.float32)[:, None]],
            axis=1,
        )  # (E, 5)
        SV8 = kbins.shape[0]
        ebins = segment_matmul(
            vals_e, jnp.where(alive_e, sv_e, SV8), SV8
        )

        # 5. surviving event rows APPEND at the pool tail (unordered bag —
        # same contiguous dynamic-update-slice as injections; replaces the
        # round-3 merge+bin expand-network pass, 0.98 ms/step at N=1.25e6).
        # The window appends UNCOMPACTED — dead/invalid lanes keep the
        # window's existing (dead) rows and the tail advances by the full
        # EVT_CAP, trading ~35% extra tail growth (reclaimed at the next
        # compaction; build_step's cadence bound already assumes EVT_CAP)
        # for skipping an EVT_CAP-wide compaction + 16-row gather
        # (~0.17 ms/step at N=1.25e6)
        rows_out = rows_out.at[:, C_SV].set(_bc_f32(sv_e))
        if use_dkern:
            # refresh the [|k|^2, corr bitmask] rows for the (possibly
            # mode-changed) event survivors — one small 2-col row gather
            from nanokappa_tpu.sim.state import C_MODE as _CM, _bc_i32

            mode_e = jnp.clip(
                _bc_i32(rows_out[:, _CM]), 0, dk2tab.shape[0] - 1
            )
            rows_out = jnp.concatenate(
                [rows_out, dk2tab[mode_e]], axis=1
            )
        if use_mirror:
            if slim:
                from nanokappa_tpu.sim.boundary_tables import (
                    combined_mirror_rows as _cmr,
                )
                from nanokappa_tpu.sim.scatter import slope_pair
                from nanokappa_tpu.sim.state import C_MODE, _bc_i32

                import numpy as _np2

                mtab1 = jnp.asarray(_np2.asarray(_cmr(btab, mat))[:, 1])
                M = mat.tau.shape[1]
                mode_e = jnp.clip(
                    _bc_i32(rows_out[:, C_MODE]), 0, M - 1
                )
                a_e, b_e = slope_pair(mat, state.T_sv, sv_e, mode_e)
                rows_out = rows_out.at[:, C_TAU].set(
                    jnp.where(alive_e, a_e, rows_out[:, C_TAU])
                )
                mrows_out = jnp.stack([mtab1[mode_e], b_e], axis=1)
            else:
                mrows_out, tau_a_e = _mirror_rows(
                    btab, mat, rows_out, state.T_sv, geo, params, sv=sv_e,
                    split_key=(
                        jax.random.fold_in(k_casc, 0x5EED)
                        if kdegen else None
                    ),
                )
                # slope form: replace the narrow machinery's full-tau
                # values with the intercepts of the lanes' (possibly new)
                # modes
                rows_out = rows_out.at[:, C_TAU].set(
                    jnp.where(alive_e, tau_a_e, rows_out[:, C_TAU])
                )
            # combined pool: ONE window appends particle + mirror rows
            rows_out = jnp.concatenate([rows_out, mrows_out], axis=1)
        pool3_m, ok_app = _append_window(
            pool3_d, rows_out.T, alive_e, tail
        )
        tail = tail + jnp.where(ok_app, EVT_CAP, 0)
        # dropped LIVE rows: only possible when the pool has no tail room —
        # sized out by build_step's compaction cadence; counted loudly
        lost3 = jnp.where(ok_app, 0, jnp.sum(alive_e, dtype=jnp.int32))

        # 6. postlude: normalisation + T inversion (sim/binning.py:124-167)
        sums = psum(kbins + ebins)[:SV]
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
        if plain_layout:
            flat = pool3_m.reshape(C, N)
            packed_out = flat[:16].T
            if slim:
                mirror_out = _expand_slim_mirror(flat, slim_axis)
            elif use_mirror:
                mirror_out = flat[16:24].T
            else:
                mirror_out = state.mirror
        else:
            packed_out = pool3_m
            # combined layout: the mirror cache lives inside packed; the
            # mirror leaf carries a zero-size placeholder through the scan
            mirror_out = state.mirror
        new_state = SimState(
            packed=packed_out,
            mirror=mirror_out,
            sv_id=state.sv_id,
            T_sv=T_sv_new,
            Np_sv=np_sv,
            T_tau=state.T_tau,
            free_list=state.free_list,
            free_count=state.free_count.at[0].set(tail),
            res_counter=new_counter,
            n_leaving=ledger[:R, 4].astype(jnp.int32),
            res_energy_balance=state.res_energy_balance - ledger[:R, 0],
            res_heat_flux=state.res_heat_flux + ledger[:R, 1:4],
            lost=state.lost + psum(jnp.stack(
                [lost_inj + lost3, lost_stuck, lost_def]
            )),
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
            lost=new_state.lost.sum(),
            lost_split=new_state.lost,
            frozen=new_state.frozen,
        )
        return new_state, outputs

    return step


def _expand_slim_mirror(flat: jax.Array, flip_axis: int) -> jax.Array:
    """(18, N) combined-SLIM flat pool -> the full (N, 8) mirror cache.

    Exact under the slim gate (boundary_tables.slim_mirror_axis): the
    partner's omega/tau-intercept bits EQUAL the main mode's, its velocity
    is the main velocity with the wall-axis component sign-flipped, and its
    slope b_m equals b. Zero-filled where no correspondence, matching
    _mirror_assemble's conventions (X_TAUB = b unconditionally)."""
    from nanokappa_tpu.sim.state import C_OMEGA, C_TAU, _bc_i32

    m_mode_b = flat[16]
    tau_b = flat[17]
    has = _bc_i32(m_mode_b) >= 0
    cols = [
        m_mode_b,  # X_MODE
        jnp.where(has, flat[C_OMEGA], 0.0),  # X_OMEGA
        jnp.where(has, jnp.where(flip_axis == 0, -flat[3], flat[3]), 0.0),
        jnp.where(has, jnp.where(flip_axis == 1, -flat[4], flat[4]), 0.0),
        jnp.where(has, jnp.where(flip_axis == 2, -flat[5], flat[5]), 0.0),
        jnp.where(has, flat[C_TAU], 0.0),  # X_TAU: a_m == a bitwise
        tau_b,  # X_TAUB
        jnp.where(has, tau_b, 0.0),  # X_MTAUB: b_m == b bitwise
    ]
    return jnp.stack(cols, axis=1)


def to_transposed(
    state: SimState, combined: bool = False, slim: bool = False,
    extra: jax.Array | None = None,
) -> SimState:
    """Enter the v2 scan convention: state.packed (and the mirror cache) ->
    the kernel-native 3-D layout (lane p of attribute c at
    [c, p // L, p % L]). One layout-conversion copy per run() boundary
    instead of two per step.

    With `combined` (the mirror fast path) the mirror cache concatenates
    into the SAME (24, NR, L) array as rows 16..23 — one block spec, one
    append window, one compaction stream per step — and the mirror leaf
    carries a zero-size placeholder through the scan. With `slim`
    (boundary_tables.slim_mirror_axis) only the partner mode id and the
    main tau slope ride along as rows 16..17 of an (18, NR, L) pool; the
    full cache is reconstructed exactly on exit (from_transposed)."""
    from nanokappa_tpu.ops.megastep import tile_width
    from nanokappa_tpu.sim.state import X_MODE, X_TAUB

    N = state.packed.shape[0]
    L = tile_width(N) // 8
    packed = state.packed.T.reshape(16, N // L, L)
    if extra is not None:
        # in-kernel-diffuse combined layout (C = 18): rows 16-17 carry the
        # mode-derived [|k|^2, corr bitmask]; the mirror leaf rides through
        # the scan untouched (it is meaningless on this path)
        assert not combined and not slim
        K = extra.shape[1]
        return dataclasses.replace(
            state,
            packed=jnp.concatenate(
                [packed, extra.T.reshape(K, N // L, L)], axis=0
            ),
        )
    if slim:
        return dataclasses.replace(
            state,
            packed=jnp.concatenate(
                [
                    packed,
                    state.mirror[:, (X_MODE, X_TAUB)].T.reshape(
                        2, N // L, L
                    ),
                ],
                axis=0,
            ),
            mirror=jnp.zeros((0,), jnp.float32),
        )
    if combined:
        return dataclasses.replace(
            state,
            packed=jnp.concatenate(
                [packed, state.mirror.T.reshape(8, N // L, L)], axis=0
            ),
            mirror=jnp.zeros((0,), jnp.float32),
        )
    return dataclasses.replace(
        state,
        packed=packed,
        mirror=state.mirror.T.reshape(8, N // L, L),
    )


def from_transposed(state: SimState, flip_axis: int | None = None) -> SimState:
    """Leave the v2 scan convention: state.packed -> (N, 16) (+ (N, 8)
    mirror, split back out of the combined layout when present; the SLIM
    combined layout (C = 18) reconstructs the full cache exactly via
    _expand_slim_mirror — pass the slim gate's `flip_axis`)."""
    C, NR, L = state.packed.shape
    flat = state.packed.reshape(C, NR * L)
    if C == 18 and flip_axis is None:
        # in-kernel-diffuse layout: drop the derived [|k|^2, corr bitmask]
        # rows; the mirror leaf was carried untouched
        return dataclasses.replace(state, packed=flat[:16].T)
    if C == 18:
        return dataclasses.replace(
            state,
            packed=flat[:16].T,
            mirror=_expand_slim_mirror(flat, flip_axis),
        )
    if C == 24:
        return dataclasses.replace(
            state, packed=flat[:16].T, mirror=flat[16:24].T
        )
    return dataclasses.replace(
        state,
        packed=flat.T,
        mirror=state.mirror.reshape(8, NR * L).T,
    )


def refresh_tau_T(
    stateT: SimState, geo, mat, params, use_mirror: bool = False
) -> SimState:
    """3-D-pool variant of sim/step.py refresh_tau (drift-gated lifetime
    refresh). Runs inside maybe_refresh_tau's cond branch, so the flat-view
    layout conversions here cost nothing on the converged plateau. With
    `use_mirror` the refresh rebuilds the SLOPE-FORM pairs (a, b) of both
    the main and mirror modes for the subvolumes' CURRENT T-grid bins
    (slope_tau_active semantics — the trigger is a bin crossing)."""
    from nanokappa_tpu.sim.binning import interp_T_particles, subvol_id
    from nanokappa_tpu.sim.scatter import (
        lifetime_by_sv, lifetime_lookup, slope_pair,
    )
    from nanokappa_tpu.sim.state import (
        C_ALIVE, C_MODE, C_TAU, X_MODE, X_MTAUB, X_TAU, X_TAUB, _bc_i32,
    )

    C, NR, L = stateT.packed.shape
    pT = stateT.packed.reshape(C, NR * L)
    pos = pT[0:3].T
    mode = _bc_i32(pT[C_MODE])
    alive = pT[C_ALIVE] > 0.5
    sv = subvol_id(geo, pos)
    if use_mirror and C == 18:
        # SLIM combined pool: the partner's pair bits equal the main
        # mode's (slim_mirror_axis gate), so one slope_pair refresh of the
        # main mode serves both; row 17 is the shared slope b
        a, b = slope_pair(
            mat, stateT.T_sv, sv, jnp.clip(mode, 0, mat.tau.shape[1] - 1)
        )
        pT = pT.at[C_TAU].set(jnp.where(alive, a, pT[C_TAU]))
        pT = pT.at[17].set(jnp.where(alive, b, pT[17]))
        return dataclasses.replace(stateT, packed=pT.reshape(C, NR, L))
    if use_mirror:
        # slope form: refresh (a, b) of main + mirror modes. The mirror
        # cache rides as rows 16..23 of the combined pool.
        assert C == 24, C
        M = mat.tau.shape[1]
        m_mode = _bc_i32(pT[16 + X_MODE])
        has = alive & (m_mode >= 0)
        m_c = jnp.clip(m_mode, 0, M - 1)
        a, b = slope_pair(mat, stateT.T_sv, sv, jnp.clip(mode, 0, M - 1))
        a_m, b_m = slope_pair(mat, stateT.T_sv, sv, m_c)
        pT = pT.at[C_TAU].set(jnp.where(alive, a, pT[C_TAU]))
        pT = pT.at[16 + X_TAU].set(jnp.where(has, a_m, pT[16 + X_TAU]))
        pT = pT.at[16 + X_TAUB].set(jnp.where(alive, b, pT[16 + X_TAUB]))
        pT = pT.at[16 + X_MTAUB].set(
            jnp.where(has, b_m, pT[16 + X_MTAUB])
        )
        return dataclasses.replace(
            stateT, packed=pT.reshape(C, NR, L)
        )
    if params.temp_interp == "nearest":
        tau = lifetime_by_sv(mat, stateT.T_sv, sv, mode)
    else:
        T_p = interp_T_particles(
            geo, stateT.T_sv, pos, sv, params.temp_interp
        )
        tau = lifetime_lookup(mat, T_p, mode)
    packed = pT.at[C_TAU].set(jnp.where(alive, tau, pT[C_TAU]))
    return dataclasses.replace(
        stateT, packed=packed.reshape(C, NR, L)
    )


def make_finalize(geo, mat, params, btab=None):
    """Apply the PENDING deferred RTA so written particle data matches the
    reference's end-of-step state exactly (the running state itself must stay
    un-finalised — the next drift kernel applies it there). Pass `btab` so
    the slope-form lifetime representation (slope_tau_active) is evaluated
    correctly; without it C_TAU is assumed to hold plain lifetimes."""
    from nanokappa_tpu.sim.binning import interp_T_particles
    from nanokappa_tpu.sim.scatter import rta_scatter
    from nanokappa_tpu.sim.state import STALE, X_TAUB, with_cols

    slope = btab is not None and slope_tau_active(geo, btab, params, mat)
    if slope:
        t_lo = float(mat.tau_T[0])
        t_hi = float(mat.tau_T[-1])

    @jax.jit
    def finalize(state: SimState) -> SimState:
        sv = state.sv_col
        T_p = interp_T_particles(
            geo, state.T_sv, state.pos, sv, params.temp_interp
        )
        ok = state.alive & (state.coll_facet != STALE) & (state.step > 0)
        tau = state.tau
        if slope:
            tau = tau + state.mirror[:, X_TAUB] * jnp.clip(T_p, t_lo, t_hi)
        dev = rta_scatter(
            mat, state.dev, state.mode, state.omega, T_p, ok,
            params.dt, params.t_reference, tau=tau,
        )
        return with_cols(state, dev=dev)

    return finalize
