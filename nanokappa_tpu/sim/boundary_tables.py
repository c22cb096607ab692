"""Host precompute of rough-wall boundary interaction tables.

The reference builds, per rough facet and mode (classes/Population.py:852-1461):
  * Ziman specularity p = exp(-(2 eta cos(theta))^2 k^2),
  * a specular correspondence map (incoming mode -> outgoing mode) under
    mirror reflection, with either the 'velocity' (default) or 'k' model,
  * the diffuse re-emission roulette: creation rate = max(v.n_in, 0) minus the
    specular outflow, as a cumulative distribution.

It wraps the correspondences in a NearestNDInterpolator and redoes roulettes
per event; here everything becomes dense integer/float tables gathered on
device. The correspondence search itself uses a KD-tree instead of the
reference's sorted-vx sweep (classes/Population.py:1241-1454) — same
acceptance criteria (per-component velocity tolerance, omega overlap window,
reflected-direction angle), picking the best (min |d_omega|) candidate.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from scipy.spatial import cKDTree

import jax
import jax.numpy as jnp

from nanokappa_tpu.geometry.domain import Domain
from nanokappa_tpu.material.tables import Material, fold_to_fbz

_CRIT = 1e-3  # relative velocity tolerance (classes/Population.py:1271)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BoundaryTables:
    """Tables are stored per *unique* (normal, roughness) pair — many rough
    facets share them — and `row_of_rough` maps rough-facet index -> row.
    The cascade's diffuse roulette loops over the (few) unique rows instead of
    gathering (N_particles, M) CDF rows."""

    specularity: jax.Array  # (NU, M) f32, zeroed where no correspondence
    corr: jax.Array  # (NU, M) i32 outgoing mode, -1 where none
    diffuse_cdf: jax.Array  # (NU, M) f32 normalised cumulative creation rate
    diffuse_prob: jax.Array  # (NU, M) f32 Walker alias acceptance probability
    diffuse_alias: jax.Array  # (NU, M) i32 Walker alias partner mode
    # combined DECISION rows for the event cascade: one narrow row gather
    # yields the branch decision; the chosen mode's properties then come
    # from ONE shared (M, 4) omega_vel gather (normal-independent). The
    # earlier 8/10-column bundles that also carried the outgoing mode's
    # omega/velocity per (normal, mode) cost 1.6 ms/step of gather traffic
    # on the 31^3 nanowire (4-5x the data per event) and 18x NU*M*4 bytes
    # of memory (1.2 GB of a 96-normal cylinder's tables).
    spec2: jax.Array  # (NU, M, 2) f32 [specularity, bitcast(corr)]
    diff2: jax.Array  # (NU, M, 2) f32 [alias prob, bitcast(alias idx)] —
    #   the uniform draw j indexes this table directly
    row_of_rough: jax.Array  # (NR,) i32 rough facet -> table row
    # internal membranes are hit from BOTH sides; back-side hits (v.n < 0
    # at the stored facet normal) use the row built for the flipped normal.
    # For boundary facets row_back == row_of_rough (never hit from behind).
    row_back: jax.Array  # (NR,) i32 rough facet -> back-side table row
    degen_partner: jax.Array  # (M,) i32 partner branch mode or -1 ('k' model)
    n_rough: int = field(metadata=dict(static=True))
    n_rows: int = field(metadata=dict(static=True))


def _host_table(btab, name: str) -> np.ndarray:
    """Host copy of a BoundaryTables field. build_boundary_tables stashes the
    NumPy originals on the instance (`_host`) so host-side consumers
    (mirror_eligible, combined_mirror_rows — both run during init) do not
    re-pull multi-MB tables from the device (several MB per pull through
    the remote-device tunnel at a 31^3 production table). Falls back to a
    device pull for instances that crossed a pytree boundary (flatten drops
    non-field attributes)."""
    h = getattr(btab, "_host", None)
    if h is not None and name in h:
        return h[name]
    return np.asarray(getattr(btab, name))


def _combine_f32_i32(f: np.ndarray, i: np.ndarray) -> np.ndarray:
    """Stack a float and an int table into (..., 2) f32 rows, the int column
    bitcast so one row gather serves both lookups."""
    return np.stack(
        [f.astype(np.float32), i.astype(np.int32).view(np.float32)], axis=-1
    )




def _mode_tables(mat: Material):
    M = mat.n_modes
    v = mat.group_vel.reshape(M, 3)
    omega = mat.omega.reshape(M)
    k = np.repeat(mat.wavevectors, mat.n_branches, axis=0)
    return v, omega, k


def _grid_k(mat: Material) -> np.ndarray:
    """Reciprocal grid half-spacing in cartesian coords
    (reference tol, classes/Population.py:1059, 1243)."""
    return np.abs((1.0 / (2.0 * mat.data_mesh)) @ mat.reciprocal_lattice.T)


def _specularity(mat: Material, normals: np.ndarray, eta: np.ndarray) -> np.ndarray:
    """(NR, M) Ziman specularity (classes/Population.py:852-877)."""
    v, _, k = _mode_tables(mat)
    vnorm = np.linalg.norm(v, axis=1)
    knorm = np.linalg.norm(k, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        # cos of incidence angle: v projected on inward normal
        cos = (v @ (-normals.T)).T / vnorm[None, :]  # (NR, M)
    p = np.exp(-((2.0 * eta[:, None] * cos) ** 2) * knorm[None, :] ** 2)
    p[~np.isfinite(p)] = 0.0
    return p


def _correspondence_velocity(mat: Material, n: np.ndarray) -> np.ndarray:
    """(M,) outgoing mode for each incoming mode under velocity mirror, -1 none."""
    v, omega, _ = _mode_tables(mat)
    M = v.shape[0]
    corr = np.full(M, -1, dtype=np.int64)

    vdn = v @ n  # v . outward normal
    inc = np.nonzero(vdn > 0)[0]  # incoming: moving toward the wall
    out = np.nonzero(vdn < 0)[0]  # candidate outgoing modes
    if len(inc) == 0 or len(out) == 0:
        return corr

    k_grid = _grid_k(mat)
    delta_omega = np.sqrt(((v * k_grid) ** 2).sum(axis=1))  # per-mode omega window

    v_mirror = v[inc] - 2.0 * np.outer(vdn[inc], n)
    tree = cKDTree(v[out])
    kq = min(8, len(out))
    dist, idx = tree.query(v_mirror, k=kq)
    if kq == 1:
        dist, idx = dist[:, None], idx[:, None]

    cand = out[idx]  # (Ni, kq) global mode ids
    vn_in = np.linalg.norm(v[inc], axis=1)
    vn_cand = np.linalg.norm(v[cand.reshape(-1)], axis=1).reshape(cand.shape)
    ref_norm = np.maximum(vn_in[:, None], vn_cand)
    comp_diff = np.abs(v[cand.reshape(-1)].reshape(*cand.shape, 3) - v_mirror[:, None, :])
    ok = np.all(comp_diff / np.maximum(ref_norm, 1e-300)[..., None] < _CRIT, axis=-1)

    dw = np.abs(omega[cand] - omega[inc][:, None])
    window = delta_omega[cand] + delta_omega[inc][:, None]
    ok &= dw < window

    dw = np.where(ok, dw, np.inf)
    best = np.argmin(dw, axis=1)
    has = np.isfinite(dw[np.arange(len(inc)), best])
    corr[inc[has]] = cand[np.arange(len(inc)), best][has]
    return corr


def _correspondence_k(mat: Material, n: np.ndarray) -> np.ndarray:
    """(M,) wavevector-mirror correspondence (classes/Population.py:1058-1165):
    mirror k, keep only normal processes (mirror stays in the FBZ), snap to
    the nearest grid q within tolerance, pick the branch with minimum relative
    omega difference among modes with outgoing velocity and omega overlap."""
    v, omega, kvec = _mode_tables(mat)
    J = mat.n_branches
    Q = mat.n_qpoints
    corr = np.full(Q * J, -1, dtype=np.int64)

    tol = _grid_k(mat)
    k_q = mat.wavevectors  # (Q,3)
    vdn = v.reshape(Q, J, 3) @ n  # (Q,J)
    s_in = vdn > 0
    s_out = vdn < 0

    active_q = np.nonzero(s_in.any(axis=1))[0]
    if len(active_q) == 0:
        return corr
    k_try = k_q[active_q] - 2.0 * np.outer(k_q[active_q] @ n, n)
    k_fold = fold_to_fbz(k_try, mat.reciprocal_lattice)
    normal_proc = np.all(np.abs(k_fold - k_try) < 1e-9, axis=1)
    active_q = active_q[normal_proc]
    k_try = k_try[normal_proc]

    tree = cKDTree(k_q)
    _, q_near = tree.query(k_try)
    k_near = k_q[q_near]
    in_tol = np.all(np.abs(k_try - k_near) < tol, axis=1) & s_out[q_near].any(axis=1)
    active_q, q_near = active_q[in_tol], q_near[in_tol]

    delta = np.sqrt(((v.reshape(Q, J, 3) * tol) ** 2).sum(axis=2))  # (Q,J)
    # branch-pair overlap test broadcast over all snapped q-pairs at once
    # ((P, J, J) arrays, ~10 MB at a 31^3 mesh — the round-2 double Python
    # loop took minutes there); semantics identical to the scalar loop:
    # omega windows must overlap, outgoing velocity required, best = minimum
    # relative |d_omega| with ties to the lowest branch index
    w2 = omega.reshape(Q, J)
    wi = w2[active_q][:, :, None]  # (P, J, 1) incoming
    wo = w2[q_near][:, None, :]  # (P, 1, J) outgoing
    di = delta[active_q][:, :, None]
    do = delta[q_near][:, None, :]
    overlap = (
        np.minimum(wi + di, wo + do) - np.maximum(wi - di, wo - do) > 0
    )
    valid = overlap & s_in[active_q][:, :, None] & s_out[q_near][:, None, :]
    rel = np.abs(wi - wo) / np.maximum(wi, 1e-300)
    rel = np.where(valid, rel, np.inf)
    best_j = np.argmin(rel, axis=2)  # (P, J)
    has = np.isfinite(np.take_along_axis(rel, best_j[:, :, None], 2)[:, :, 0])
    qi_g, j_in_g = np.nonzero(has)
    corr[active_q[qi_g] * J + j_in_g] = q_near[qi_g] * J + best_j[has]
    return corr


_CMR_MISSING = object()


def combined_mirror_rows(btab, mat) -> np.ndarray | None:
    """(M, 8) COMBINED specular rows for the in-kernel mirror cache
    (sim/fused.py mirror_eligible): a wall pair with opposite normals
    splits one physical mirror map into complementary per-row domains
    (each row's correspondence covers only the modes heading INTO that
    wall), so the union over rows is the total map. Returns None when the
    rows CONFLICT on an overlap (rough walls of different plane families —
    the fast path is ineligible). Modes whose map is not an involution
    (mirror(mirror(m)) != m, which the cache swap relies on) fall back to
    corr = -1 (narrow-machinery export).

    The result caches on the btab instance: the first call always happens
    at step-BUILD time with concrete tables (mirror_eligible), so later
    calls from inside jit tracing — where sim/step.py may have swapped the
    device fields for tracers (_parameterize_tables) — never touch
    mat/btab arrays."""
    cached = getattr(btab, "_cmr_rows", _CMR_MISSING)
    if cached is not _CMR_MISSING:
        return cached
    spec = _host_table(btab, "specularity")  # (NU, M)
    corr = _host_table(btab, "corr")  # (NU, M)
    NU, M = corr.shape
    cur = corr[0].astype(np.int64).copy()
    pcur = spec[0].astype(np.float32).copy()
    for r in range(1, NU):
        conflict = (cur >= 0) & (corr[r] >= 0) & (cur != corr[r])
        if conflict.any():
            object.__setattr__(btab, "_cmr_rows", None)
            return None
        pick = (cur < 0) & (corr[r] >= 0)
        cur[pick] = corr[r][pick]
        pcur[pick] = spec[r][pick]
    # involution gate: the register swap assumes mirror(mirror(m)) ~ m
    if hasattr(mat, "omega_vel"):  # device MaterialTables
        ov = np.asarray(mat.omega_vel)
        omega, v = ov[:, 0], ov[:, 1:4]
    else:  # host Material
        v, omega, _ = _mode_tables(mat)
    has = cur >= 0
    back = np.where(has, cur[np.clip(cur, 0, M - 1)], -1)
    back_ok = has & (back >= 0)
    bi = np.clip(back, 0, M - 1)
    prop_ok = back_ok & np.isclose(omega[bi], omega, rtol=1e-6) & np.all(
        np.isclose(v[bi], v, rtol=1e-6, atol=1e-9), axis=1
    )
    good = has & prop_ok
    cur = np.where(good, cur, -1)
    cc = np.clip(cur, 0, M - 1)
    out = np.zeros((M, 8), np.float32)
    out[:, 0] = np.where(good, pcur, 0.0)
    out[:, 1] = cur.astype(np.int32).view(np.float32)
    out[:, 2] = np.where(good, omega[cc], 0.0)
    out[:, 3:6] = np.where(good[:, None], v[cc], 0.0)
    object.__setattr__(btab, "_cmr_rows", out)
    return out


def slim_mirror_axis(geo, btab, mat) -> int | None:
    """Flip axis for the SLIM mirror cache, or None if ineligible.

    The full in-kernel mirror cache stores the correspondence partner's
    (mode, omega, vel, tau-slope) per lane — 8 pool rows. For
    symmetry-expanded dispersions on axis-aligned walls, the velocity-model
    correspondence (classes/Population.py:1241-1454) lands on the exact
    crystal-symmetry mirror mode, whose DEVICE-table properties are
    bitwise redundant: omega' == omega, tau'(T) == tau(T), v' == v with the
    wall-axis component sign-flipped. The slim cache then carries only the
    partner mode id (+ the main tau slope), shrinking the pool to 18 rows —
    25% less mega-kernel HBM traffic — with bit-identical step semantics.

    Eligibility (checked on the f32 tables the kernel actually consumes):
      * every rough facet normal is +-e_a for ONE shared axis a (the
        in-register reflection v[a] = -v[a] is then exact in f32),
      * a combined correspondence map exists (one plane family, involution),
      * for every mapped mode: omega bitwise equal, velocity bitwise equal
        to the a-flip, and the full tau_pair table bitwise equal."""
    from nanokappa_tpu.geometry.domain import BC

    bc = np.asarray(geo.facet_bc)
    normals = np.asarray(geo.facet_normal)[bc == int(BC.ROUGH)]
    if len(normals) == 0:
        return None
    nz = np.abs(normals) > 1e-12
    if not (nz.sum(axis=1) == 1).all():
        return None
    axes = np.argmax(nz, axis=1)
    if not (axes == axes[0]).all():
        return None
    a = int(axes[0])
    if not np.all(np.abs(normals[np.arange(len(normals)), axes]) == 1.0):
        return None

    # eligibility is cached ON the btab instance (like the `_host` stash):
    # a btab is built for exactly one material (build_boundary_tables(mat,
    # dom)), so keying by flip axis alone is sound, and an instance stash —
    # unlike a module dict keyed on id() — can never alias a different
    # table set after garbage collection, nor grow unboundedly
    cache = getattr(btab, "_slim_axis", None)
    if cache is None:
        cache = {}
        object.__setattr__(btab, "_slim_axis", cache)
    if a in cache:
        return cache[a]
    rows = combined_mirror_rows(btab, mat)
    ok: int | None = None
    if rows is not None:
        dev = mat if hasattr(mat, "omega_vel") else mat.device_tables()
        ov = np.asarray(dev.omega_vel)  # (M, 4) f32
        tp = np.asarray(dev.tau_pair)  # (nTP, M, 2) f32
        corr = rows[:, 1].view(np.int32)
        m = np.nonzero(corr >= 0)[0]
        c = corr[m]
        vf = ov[m, 1:4].copy()
        vf[:, a] = -vf[:, a]
        if (
            np.array_equal(ov[c, 0], ov[m, 0])
            and np.array_equal(ov[c, 1:4], vf)
            and np.array_equal(tp[:, c], tp[:, m])
        ):
            ok = a
    cache[a] = ok
    return ok


def build_alias(weights: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Walker alias tables for O(1) categorical sampling on device: draw
    j ~ Uniform(M), u ~ U(0,1); sample = j if u < prob[j] else alias[j].
    Replaces the reference's cumulative-sum roulette + searchsorted
    (classes/Population.py:938-939, 990-1015) which costs a log(M)-deep
    gather chain per event on TPU."""
    from nanokappa_tpu import native

    out = native.build_alias(np.asarray(weights, dtype=float))
    if out is not None:
        return out

    M = len(weights)
    w = np.asarray(weights, dtype=float)
    total = w.sum()
    if total <= 0:
        return np.ones(M), np.arange(M, dtype=np.int64)
    scaled = w * M / total
    prob = np.ones(M)
    alias = np.arange(M, dtype=np.int64)
    small = [i for i in range(M) if scaled[i] < 1.0]
    large = [i for i in range(M) if scaled[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = scaled[l] - (1.0 - scaled[s])
        (small if scaled[l] < 1.0 else large).append(l)
    for i in small + large:
        prob[i] = 1.0
    return prob, alias


def _degen_partner(mat: Material) -> np.ndarray:
    """(M,) mode id of an equal-frequency partner branch, -1 if none."""
    out = np.full(mat.n_modes, -1, dtype=np.int64)
    for q, j1, j2 in mat.degeneracies:
        out[q * mat.n_branches + j1] = q * mat.n_branches + j2
        out[q * mat.n_branches + j2] = q * mat.n_branches + j1
    return out


def write_specular_correspondences(
    btab: BoundaryTables, mat: Material, domain: Domain, folder: str
):
    """Dump the correspondence table in the reference's text format
    (classes/Population.py:1461): rows of
    'nx ny nz q_in j_in q_out j_out' per specularly-reflectable mode."""
    import os

    rough = domain.rough_facets
    if len(rough) == 0:
        return
    normals = domain.mesh.facet_normals[rough]
    rows_of = np.asarray(btab.row_of_rough)
    corr = np.asarray(btab.corr)
    J = mat.n_branches
    seen = set()
    lines = []
    for i, f in enumerate(rough):
        r = int(rows_of[i])
        if r in seen:
            continue
        seen.add(r)
        n = -normals[i]  # reference stores the inward normal
        m_in = np.nonzero(corr[r] >= 0)[0]
        m_out = corr[r][m_in]
        for a, b in zip(m_in, m_out):
            lines.append(
                f"{n[0]:.3f} {n[1]:.3f} {n[2]:.3f} "
                f"{a // J:d} {a % J:d} {b // J:d} {b % J:d}"
            )
    with open(os.path.join(folder, "specular_correspondences.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")


def build_boundary_tables(
    mat: Material,
    domain: Domain,
    scat_model: str = "velocity",
    dtype=jnp.float32,
) -> BoundaryTables:
    rough = domain.rough_facets
    NR = len(rough)
    M = mat.n_modes
    v, omega, _ = _mode_tables(mat)

    if NR == 0:
        spec0 = np.zeros((1, M))
        corr0 = np.full((1, M), -1, np.int64)
        bt = BoundaryTables(
            specularity=jnp.zeros((1, M), dtype=dtype),
            corr=jnp.full((1, M), -1, dtype=jnp.int32),
            diffuse_cdf=jnp.ones((1, M), dtype=dtype),
            diffuse_prob=jnp.ones((1, M), dtype=dtype),
            diffuse_alias=jnp.zeros((1, M), dtype=jnp.int32),
            spec2=jnp.asarray(_combine_f32_i32(spec0, corr0)),
            diff2=jnp.asarray(
                _combine_f32_i32(np.ones((1, M)), np.zeros((1, M), np.int64))
            ),
            row_of_rough=jnp.zeros(0, dtype=jnp.int32),
            row_back=jnp.zeros(0, dtype=jnp.int32),
            degen_partner=jnp.asarray(_degen_partner(mat), dtype=jnp.int32),
            n_rough=0,
            n_rows=1,
        )
        object.__setattr__(bt, "_host", {
            "specularity": spec0.astype(np.float32),
            "corr": corr0.astype(np.int32),
        })
        return bt

    normals = domain.mesh.facet_normals[rough]  # outward
    eta = np.nan_to_num(domain.rough_values)

    # unique (normal, eta) rows. Internal membranes (facet_is_interface) are
    # collision targets from BOTH sides; their back side needs tables built
    # for the flipped normal (specularity is sign-invariant, but the
    # correspondence's incoming-mode domain and the diffuse creation rates
    # are not). Boundary facets are only ever hit from the front.
    internal = np.asarray(domain.mesh.facet_is_interface)[rough]
    keys = np.round(np.concatenate([normals, eta[:, None]], axis=1), 10)
    keys_back = np.round(
        np.concatenate([-normals[internal], eta[internal][:, None]], axis=1), 10
    )
    uniq, inv = np.unique(
        np.concatenate([keys, keys_back], axis=0), axis=0, return_inverse=True
    )
    row_of_rough = inv[:NR]
    row_back = row_of_rough.copy()
    row_back[internal] = inv[NR:]
    NU = uniq.shape[0]
    u_normals = uniq[:, :3]
    u_eta = uniq[:, 3]

    spec = _specularity(mat, u_normals, u_eta)  # (NU, M)
    corr = np.stack(
        [
            _correspondence_k(mat, un)
            if scat_model in ("k", "wavevector", "wave_vector")
            else _correspondence_velocity(mat, un)
            for un in u_normals
        ],
        axis=0,
    )  # (NU, M)

    # true specularity: only modes with a correspondence can reflect specularly
    spec = np.where(corr >= 0, spec, 0.0)

    # diffuse creation rate (classes/Population.py:879-939)
    cdf = np.zeros((NU, M))
    aprob = np.zeros((NU, M))
    aidx = np.zeros((NU, M), dtype=np.int64)
    creations = []
    for f in range(NU):
        vdn = v @ u_normals[f]  # outward
        creation = np.maximum(-vdn, 0.0)  # modes leaving the wall into the domain
        destruction = np.maximum(vdn, 0.0)  # modes arriving at the wall
        spec_out = destruction * spec[f]
        valid = corr[f] >= 0
        np.add.at(creation, corr[f][valid], -spec_out[valid])
        if scat_model in ("k", "wavevector", "wave_vector"):
            dp = _degen_partner(mat)
            has = dp >= 0
            avg = 0.5 * (creation + creation[np.where(has, dp, 0)])
            creation = np.where(has, avg, creation)
        creation = np.maximum(np.round(creation, 10), 0.0)
        creations.append(creation)
        c = np.cumsum(creation)
        cdf[f] = c / c[-1]
        aprob[f], aidx[f] = build_alias(creation)

    bt = BoundaryTables(
        specularity=jnp.asarray(spec, dtype=dtype),
        corr=jnp.asarray(corr, dtype=jnp.int32),
        diffuse_cdf=jnp.asarray(cdf, dtype=dtype),
        diffuse_prob=jnp.asarray(aprob, dtype=dtype),
        diffuse_alias=jnp.asarray(aidx, dtype=jnp.int32),
        spec2=jnp.asarray(_combine_f32_i32(spec, corr)),
        diff2=jnp.asarray(_combine_f32_i32(aprob, aidx)),
        row_of_rough=jnp.asarray(row_of_rough, dtype=jnp.int32),
        row_back=jnp.asarray(row_back, dtype=jnp.int32),
        degen_partner=jnp.asarray(_degen_partner(mat), dtype=jnp.int32),
        n_rough=NR,
        n_rows=NU,
    )
    object.__setattr__(bt, "_host", {
        "specularity": spec.astype(np.float32),
        "corr": corr.astype(np.int32),
        # host copies for the in-kernel diffuse presample builder
        # (sim/diffuse_pool.py): the per-row creation-rate weights and their
        # Walker alias tables, and the per-row unique normals (the kernel's
        # v.n incidence math needs them per rough facet)
        "creation": np.stack(creations, axis=0).astype(np.float64),
        "aprob": aprob.astype(np.float64),
        "aidx": aidx.astype(np.int64),
        "u_normals": u_normals.astype(np.float64),
        "u_eta": u_eta.astype(np.float64),
    })
    return bt
