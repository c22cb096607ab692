"""Presampled diffuse-reemission pools for the IN-KERNEL rough-wall path.

The reference redraws a mode from the per-wall creation-rate roulette at every
diffuse reflection (classes/Population.py:879-939, 990-1015). The narrow XLA
machinery replicates that with Walker-alias gathers per event — correct, but
at production mode tables (31^3 = 178,746 modes) the decision gathers from the
multi-MB (NU, M, 2) tables dominate the event-bound configs (round-4 wire
trace: spec2 + diff2 + lifetime gathers ~ 1.9 of 6.0 ms/step at 1e6).

This module moves the DRAW itself off the per-event path: modes are presampled
on the host (vectorised alias draws from the SAME creation-rate weights the
event machinery uses), bundled with every per-mode property a diffused lane
needs (omega, velocity, |k|^2 for the Ziman specularity of its NEXT wall hit,
and the slope-form lifetime pair(s)), and laid out in the drift mega-kernel's
native (channels, NB, L) block layout. Each kernel tile then streams ONE
dense presample block per step (a ~1 MB DMA — no random gather anywhere) and
resolves diffuse reflections entirely in-register (ops/megastep.py, the
cfg["dkern"] branch).

Statistics
----------
*Marginal exactness.* Pool entries are iid draws from the exact per-wall-row
creation distribution. A lane consumes the entry at its own (block, lane)
position; which lanes diffuse at a given step is independent of the entry
VALUES there, so every consumed draw is marginally distributed exactly like
the reference's roulette.
*Sharing.* One entry column is shared by the 8 sublane particles of a lane
column (G = 8): two particles in the same column diffusing at walls of the
same normal family in the same step draw the same mode — at the measured
~3% per-tile event rates that is ~3% of groups, a weak within-step
correlation with zero bias.
*Reuse.* The pool holds NB blocks and a step's tile b reads block
(off + b) mod NB with off advancing by a stride each step (mixed with the
shard index and the run key so shards/runs decorrelate), so an entry is
reused after ~NB/n_tiles steps — by a DIFFERENT tile, after the pool has
been defragmented (lane order reshuffles every compaction interval). Reuse
correlates Monte Carlo noise across widely-separated steps without biasing
any marginal; kappa estimates average over thousands of steps. Ensemble
replicas built from one step function share the pool (a fixed quasi-random
resource, like a shared Sobol table); replica error bars can be very mildly
optimistic — acceptable for the driver's replica-mean observables.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DiffusePool:
    """Presample windows + the static metadata the kernel branch needs."""

    window: jax.Array  # (NB, CHF, 8, L) f32: channel ch of family f at
    #   [block, ch, f, lane] (family axis zero-padded to 8 sublanes). Block
    #   (1, CHF, 8, L) per kernel tile; the kernel resolves the per-lane
    #   family with ONE sublane dynamic_gather per channel (tpu.dynamic_-
    #   gather dims=[0] — legal because the 8-family axis is exactly one
    #   vreg of sublanes) instead of an NU-way select chain.
    nu: int = field(metadata=dict(static=True))  # rough-table rows
    chf: int = field(metadata=dict(static=True))  # channels per family
    n_bins: int = field(metadata=dict(static=True))  # lifetime T bins (1|2)
    nb: int = field(metadata=dict(static=True))  # presample blocks
    stride: int = field(metadata=dict(static=True))  # per-step block advance
    t_split: float = field(metadata=dict(static=True))  # bin boundary (2-bin)
    t_lo: float = field(metadata=dict(static=True))  # in-kernel T range:
    t_hi: float = field(metadata=dict(static=True))  # outside -> lane exports
    t_clamp_lo: float = field(metadata=dict(static=True))  # lifetime-table
    t_clamp_hi: float = field(metadata=dict(static=True))  # edge saturation


# per-family channel indices (rows f * CHF + _CH_*)
CH_MODE = 0  # mode id as a FLOAT VALUE (exact below 2^24) — float math in
#   any staging path cannot corrupt it, unlike a bitcast int payload
CH_OMEGA = 1
CH_VX, CH_VY, CH_VZ = 2, 3, 4
CH_K2 = 5  # |k|^2 of the drawn mode (Ziman specularity at its NEXT wall hit)
CH_CMASK = 6  # correspondence-existence bitmask over table rows (float)
CH_A0, CH_B0 = 7, 8  # lifetime slope pair tau(T) = a + b*T, T-grid bin 0
CH_A1, CH_B1 = 9, 10  # bin 1 (only when n_bins == 2)


def static_temp_range(geo, params) -> tuple[float, float]:
    """The temperature envelope the simulation can statically promise: the
    reservoir temperatures plus the reference temperature. Subvolume
    temperatures relax between the reservoirs (plus initialisation
    transients); lanes whose wall temperature leaves this range fall back to
    the exact narrow-machinery path, so the range only gates efficiency."""
    from nanokappa_tpu.geometry.domain import BC

    bc = np.asarray(geo.facet_bc)
    vals = np.asarray(geo.facet_value)[bc == int(BC.TEMPERATURE)]
    vals = vals[np.isfinite(vals)]
    ts = [float(params.t_reference)] + [float(v) for v in vals]
    return min(ts), max(ts)


def spanned_bins(tau_T: np.ndarray, t_lo: float, t_hi: float):
    """(first_bin, n_bins) of the lifetime T grid covering [t_lo, t_hi]
    (bins clamp at the table edges, matching lifetime_lookup's w-clip)."""
    nT = len(tau_T)
    if nT <= 1:
        return 0, 1
    b_lo = int(np.clip(np.searchsorted(tau_T, t_lo) - 1, 0, nT - 2))
    b_hi = int(np.clip(np.searchsorted(tau_T, t_hi) - 1, 0, nT - 2))
    return b_lo, b_hi - b_lo + 1


def build_diffuse_pool(
    geo,
    btab,
    mat,  # device MaterialTables (host pulls are small per-bin rows)
    params,
    L: int,  # kernel tile lane-columns (tile_width // 8)
    n_tiles: int,
    budget_bytes: int = 512 * 1024 * 1024,
    seed: int = 0x0D1FF,
) -> DiffusePool | None:
    """Build the presample pool, or None when the configuration is outside
    the in-kernel gate (caller treats None as 'use the narrow machinery')."""
    host = getattr(btab, "_host", None)
    if host is None or "creation" not in host:
        return None
    creation = host["creation"]  # (NU, M) f64
    NU, M = creation.shape
    if NU > 8 or int(btab.n_rough) == 0:
        return None

    tau_T = np.asarray(mat.tau_T, dtype=np.float64)
    t_lo, t_hi = static_temp_range(geo, params)
    b0, n_bins = spanned_bins(tau_T, t_lo, t_hi)
    if n_bins > 2:
        return None
    nT = len(tau_T)

    # in-kernel acceptance range = the covered bins' span, extended to the
    # saturation region past clamped table edges (lifetime_lookup clips the
    # lerp weight at both ends, which a + b * clip(T) reproduces exactly)
    if nT <= 1:
        rng_lo, rng_hi = -np.inf, np.inf
    else:
        rng_lo = -np.inf if b0 == 0 else float(tau_T[b0])
        last = b0 + n_bins - 1
        rng_hi = np.inf if last == nT - 2 else float(tau_T[last + 1])
    t_split = float(tau_T[b0 + 1]) if (n_bins == 2) else 0.0

    def slope(bin_idx):
        if nT <= 1:
            a = np.asarray(mat.tau, dtype=np.float64).reshape(-1)[:M]
            return a, np.zeros(M)
        pair = np.asarray(mat.tau_pair[bin_idx], dtype=np.float64)  # (M,2)
        dT = tau_T[bin_idx + 1] - tau_T[bin_idx]
        b = (pair[:, 1] - pair[:, 0]) / dT if dT > 0 else np.zeros(M)
        a = pair[:, 0] - b * tau_T[bin_idx]
        return a, b

    ab = [slope(b0)]
    if n_bins == 2:
        ab.append(slope(b0 + 1))
    CHF = 9 + 2 * (n_bins - 1)

    # correspondence-existence bitmask per mode: bit f set iff table row f
    # maps the mode to a specular partner (kernel zeroes the Ziman p where
    # unset — 'true specularity', boundary_tables.build_boundary_tables)
    corr_h = host["corr"]  # (NU, M) i32
    cmask = np.zeros(M, np.float32)
    for f in range(NU):
        cmask += (corr_h[f] >= 0).astype(np.float32) * float(1 << f)

    block_bytes = CHF * 8 * L * 4  # family axis padded to 8 sublanes
    NB = max(2 * n_tiles, min(8 * n_tiles, budget_bytes // block_bytes))

    # the pool is drawn and assembled ON DEVICE: the ~hundreds-of-MB window
    # never crosses the host link (a host-built pool took minutes to upload
    # through the remote-device tunnel), and the alias draw reuses the
    # device-resident btab.diff2 decision table — the build is one jitted
    # program of (NU * NB * L)-wide gathers, run once
    ab_dev = jnp.asarray(
        np.stack([np.stack(p, axis=0) for p in ab], axis=0),
        dtype=jnp.float32,
    )  # (n_bins, 2, M)
    ov_dev = mat.omega_vel
    k2_dev = jnp.sum(mat.wavevector * mat.wavevector, axis=1)
    cm_dev = jnp.asarray(cmask)
    diff2 = btab.diff2  # (NU, M, 2) [alias prob, bitcast(alias idx)]

    @jax.jit
    def _draw(key):
        # drawn directly in the kernel's (NB, CHF, 8, L) index order so
        # the final reshape is layout-free (a post-hoc transpose of the
        # ~400 MB pool dominated this program's compile time)
        kj, ku = jax.random.split(key)
        j = jax.random.randint(kj, (NB, 8, L), 0, M)
        u = jax.random.uniform(ku, (NB, 8, L))
        fam = jnp.minimum(
            jnp.arange(8, dtype=jnp.int32), NU - 1
        )[None, :, None]
        pa = diff2[fam, j]  # (NB, 8, L, 2) (pad families mirror row NU-1)
        m = jnp.where(
            u < pa[..., 0], j,
            jax.lax.bitcast_convert_type(pa[..., 1], jnp.int32),
        )
        cols = [
            m.astype(jnp.float32),  # CH_MODE: id as a float value
            ov_dev[m, 0], ov_dev[m, 1], ov_dev[m, 2], ov_dev[m, 3],
            k2_dev[m],
            cm_dev[m],
            ab_dev[0, 0][m], ab_dev[0, 1][m],
        ]
        if n_bins == 2:
            cols += [ab_dev[1, 0][m], ab_dev[1, 1][m]]
        return jnp.stack(cols, axis=1)  # (NB, CHF, 8, L)

    window = jax.block_until_ready(_draw(jax.random.PRNGKey(seed)))
    return DiffusePool(
        window=window,
        nu=NU,
        chf=CHF,
        n_bins=n_bins,
        nb=NB,
        stride=n_tiles + 1,
        t_split=t_split,
        t_lo=float(rng_lo),
        t_hi=float(rng_hi),
        t_clamp_lo=float(tau_T[0]) if nT else 0.0,
        t_clamp_hi=float(tau_T[-1]) if nT else 0.0,
    )
