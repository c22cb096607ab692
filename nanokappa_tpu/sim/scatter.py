"""Relaxation-time (RTA) scattering toward the local Bose-Einstein occupation.

n <- n0(T) + (n - n0(T)) * exp(-dt / tau(T, m))   (classes/Population.py:1701-1710)

In deviation form (dev = n - n0(T_ref)):
g = n0(T) - n0(T_ref);  dev <- g + (dev - g) * exp(-dt/tau).
tau is gathered from the (nT, M) lifetime table with linear interpolation in T
(the reference uses a scipy RegularGridInterpolator over (T, q, j),
classes/Phonon.py:326-336; here exact gather in m, lerp in T, clamped at the
table edges)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nanokappa_tpu.material.tables import MaterialTables
from nanokappa_tpu.sim.bose import occupation_delta_T


def lifetime_lookup(mat: MaterialTables, T: jax.Array, mode: jax.Array) -> jax.Array:
    nT = mat.tau_T.shape[0]
    i = jnp.clip(jnp.searchsorted(mat.tau_T, T) - 1, 0, max(nT - 2, 0))
    w = (T - mat.tau_T[i]) / jnp.maximum(
        mat.tau_T[jnp.minimum(i + 1, nT - 1)] - mat.tau_T[i], 1e-30
    )
    w = jnp.clip(w, 0.0, 1.0)
    # (tau[i,m], tau[i+1,m]) as one 2-wide row gather from the paired table
    # (two scalar gathers cost ~2x0.47 ms at 64K width on TPU)
    M = mat.tau.shape[1]
    pair = mat.tau_pair.reshape(-1, 2)[i * M + mode]
    return pair[:, 0] * (1 - w) + pair[:, 1] * w


def blend_tau_sv(mat: MaterialTables, T_sv: jax.Array) -> jax.Array:
    """(SV, M) per-subvolume lifetime table: the T-lerp of the (nT, M)
    table at each subvolume temperature. Loop-invariant within a step —
    callers that evaluate lifetimes inside event-round loops hoist this
    (the blend materialises SV*M floats; recomputing it per cascade round
    cost ~0.9 ms/step on the 31^3 nanowire trace)."""
    nT = mat.tau_T.shape[0]
    i = jnp.clip(jnp.searchsorted(mat.tau_T, T_sv) - 1, 0, max(nT - 2, 0))
    hi = jnp.minimum(i + 1, nT - 1)
    w = (T_sv - mat.tau_T[i]) / jnp.maximum(mat.tau_T[hi] - mat.tau_T[i], 1e-30)
    w = jnp.clip(w, 0.0, 1.0)
    return mat.tau[i] * (1.0 - w)[:, None] + mat.tau[hi] * w[:, None]


def lifetime_by_sv(
    mat: MaterialTables, T_sv: jax.Array, sv: jax.Array, mode: jax.Array,
    tau_sv: jax.Array | None = None,
) -> jax.Array:
    """tau(T_sv[sv], mode) via a per-subvolume lerped table: with 'nearest'
    temperature interpolation every particle's T is one of the SV subvolume
    values, so the T-lerp collapses to SV contiguous-row blends of the
    (nT, M) table and ONE gather over a (SV*M,) array — at a 31^3 mode table
    the random per-particle gather then touches 7 MB instead of the 71 MB
    tau_pair (measured 2x on-chip). Bitwise-identical to
    lifetime_lookup(T_sv[sv], mode): same index/weight arithmetic evaluated
    per subvolume instead of per particle. Pass a precomputed
    `tau_sv` (blend_tau_sv) when calling from inside a loop."""
    if tau_sv is None:
        tau_sv = blend_tau_sv(mat, T_sv)
    M = mat.tau.shape[1]
    sv_c = jnp.clip(sv, 0, T_sv.shape[0] - 1)
    return tau_sv.reshape(-1)[sv_c * M + mode]


def slope_pair(
    mat: MaterialTables, T_sv: jax.Array, sv: jax.Array, mode: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """(a, b) of the piecewise-linear lifetime tau(T) = a + b*T on the
    T-grid bin containing each particle's SUBVOLUME temperature.

    Within that bin, a + b*T is EXACTLY lifetime_lookup's lerp (the same
    tau_pair row, rearranged to intercept/slope), so a per-particle cached
    (a, b) keeps tau continuously exact as T_sv drifts — the full-pool tau
    refresh then only needs to run when a subvolume temperature crosses a
    grid-bin boundary (e.g. every 10 K for phono3py-style tables) instead
    of every 0.05 K of drift. Evaluation clamps T to the table range, which
    reproduces lifetime_lookup's w-clip at both table edges."""
    nT = mat.tau_T.shape[0]
    i_sv = jnp.clip(
        jnp.searchsorted(mat.tau_T, T_sv) - 1, 0, max(nT - 2, 0)
    )  # (SV,)
    sv_c = jnp.clip(sv, 0, T_sv.shape[0] - 1)
    i = i_sv[sv_c]  # per lane (tiny-table gather)
    T_lo = mat.tau_T[i]
    T_hi = mat.tau_T[jnp.minimum(i + 1, nT - 1)]
    M = mat.tau.shape[1]
    pair = mat.tau_pair.reshape(-1, 2)[i * M + mode]  # (E,2) row gather
    dT = T_hi - T_lo
    b = jnp.where(dT > 0, (pair[:, 1] - pair[:, 0]) / jnp.maximum(dT, 1e-30), 0.0)
    a = pair[:, 0] - b * T_lo
    return a, b


def rta_scatter(
    mat: MaterialTables,
    dev: jax.Array,
    mode: jax.Array,
    omega: jax.Array,  # cached per-particle omega (state.omega)
    T_local: jax.Array,
    alive: jax.Array,
    dt: float,
    t_reference: float,
    tau: jax.Array | None = None,  # cached per-particle tau (state.tau);
    #   falls back to a fresh table lookup when None
) -> jax.Array:
    g = occupation_delta_T(T_local, t_reference, omega)
    if tau is None:
        tau = lifetime_lookup(mat, T_local, mode)
    decay = jnp.where(tau > 0, jnp.exp(-dt / jnp.maximum(tau, 1e-12)), 0.0)
    new_dev = g + (dev - g) * decay
    return jnp.where(alive, new_dev, dev)
