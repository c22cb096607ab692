"""Merge-and-bin kernel: scatter event results back + subvolume binning in
ONE pass over the packed (16, N) pool.

The event buffer's updates arrive in per-block ALIGNED segments (drift
kernel's compaction): block b's updates sit at [starts[b], starts[b]+counts[b])
with starts[b] a multiple of 128, so the update DMA needs no searchsorted and
no alignment offset. Rows expand from slice order to their target lanes with
the MSB-first log-shift network of ops/scatter_rows.py (delta = target - slice
position is non-decreasing, so intermediate positions stay distinct).

After the merge, the SAME tile pass computes the subvolume binning that
round 2 ran as a separate full-width XLA stage (sim/binning.py:124-167):
slice subvolume ids from position arithmetic, particle deviation energies via
the f32-stable expm1 algebra, and one MXU one-hot matmul per tile at
Precision.HIGHEST accumulating [e, e*v, alive] per subvolume. The final
merged tile also gets its C_SV column refreshed — the drift kernel's deferred
RTA reads it next step.

Update rows carry the TARGET INDEX in row 15 (C_SV's slot — unused in
transit, rewritten here).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanokappa_tpu.ops.kmath import occupation_delta_T_k
from nanokappa_tpu.sim.state import C_ALIVE, C_DEV, C_OMEGA, C_SV

BN = 16384
_BIG = 1 << 29


def _kernel(
    starts_ref,  # scalar prefetch: (nb+1,) aligned segment starts
    counts_ref,  # scalar prefetch: (nb,) exact segment counts
    tsv_ref,  # (1, SVP) f32 SMEM subvolume temperatures
    base_ref,  # (16, BN) drifted packed tile
    rows_hbm,  # (16, EVT_CAP + BN) update rows (ANY, manual DMA)
    out_ref,  # (16, BN) merged tile
    bins_ref,  # (SV8, 128) f32 binning sums [e, e*vx, e*vy, e*vz, alive]
    upd_s,  # (16, BN) VMEM scratch
    acc_ref,  # (SV8, 128) f32 VMEM accumulator
    sem,
    *,
    cfg: dict,
):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    SV8 = cfg["sv8"]
    N = cfg["n_cap"]
    f32 = jnp.float32
    i32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731
    bc32 = lambda a: jax.lax.bitcast_convert_type(a, f32)  # noqa: E731

    @pl.when(b == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros((SV8, 128), f32)

    lo = starts_ref[b]
    cnt = counts_ref[b]

    cp = pltpu.make_async_copy(
        rows_hbm.at[:, pl.ds(pl.multiple_of(lo, 128), BN)], upd_s, sem
    )
    cp.start()

    base = base_ref[:, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, BN), 1)
    gidx = b * BN + lane

    cp.wait()
    vals = upd_s[:, :]
    tgt = i32(vals[15:16, :])  # target pool index rides row 15
    t_in = lane  # position within this block's update slice
    delta = jnp.where(
        (t_in < cnt) & (tgt < N), tgt - b * BN - t_in, _BIG
    )

    # MSB-first expand network (ops/scatter_rows.py:41-78); delta in [0, BN)
    s = BN // 2
    while s >= 1:
        mv_v = pltpu.roll(vals, s, axis=1)
        mv_d = pltpu.roll(delta, s, axis=1)
        take = (mv_d & s) != 0
        stay = (delta & s) == 0
        vals = jnp.where(jnp.broadcast_to(take, vals.shape), mv_v, vals)
        delta = jnp.where(take, mv_d - s, jnp.where(stay, delta, _BIG))
        s //= 2
    upd_valid = delta == 0  # (1, BN)
    merged = jnp.where(jnp.broadcast_to(upd_valid, (16, BN)), vals, base)

    # ---- subvolume binning on the FINAL state ------------------------------
    px = merged[0:1, :]
    py = merged[1:2, :]
    pz = merged[2:3, :]
    alive = (merged[C_ALIVE:C_ALIVE + 1, :] > 0.5) & (gidx < N)
    omega = merged[C_OMEGA:C_OMEGA + 1, :]
    dev = merged[C_DEV:C_DEV + 1, :]

    pa = (px, py, pz)[cfg["slice_axis"]]
    sv = jnp.clip(
        ((pa - cfg["lo"]) * cfg["inv_len"]).astype(jnp.int32),
        0,
        cfg["n_subvols"] - 1,
    )

    oh = (
        sv == jax.lax.broadcasted_iota(jnp.int32, (SV8, BN), 0)
    ).astype(f32)
    T_p = jnp.zeros((1, BN), f32)
    for svi in range(cfg["n_subvols"]):
        T_p = jnp.where(sv == svi, tsv_ref[0, svi], T_p)
    dn = dev - occupation_delta_T_k(T_p, cfg["t_reference"], omega)
    e = jnp.where(alive, cfg["hbar"] * omega * dn, 0.0)
    alv = jnp.where(alive, 1.0, 0.0)
    # velocities masked BEFORE the product: dead / out-of-pool lanes can
    # carry non-finite garbage and 0 * inf = NaN would poison the dot
    mvx = jnp.where(alive, merged[3:4, :], 0.0)
    mvy = jnp.where(alive, merged[4:5, :], 0.0)
    mvz = jnp.where(alive, merged[5:6, :], 0.0)
    vals5 = jnp.concatenate(
        [e, e * mvx, e * mvy, e * mvz, alv], axis=0
    )  # (5, BN)
    oh_m = jnp.where(jnp.broadcast_to(alive, (SV8, BN)), oh, 0.0)
    sums = jax.lax.dot_general(
        oh_m, vals5, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (SV8, 5)
    acc_ref[:, :] = acc_ref[:, :] + jnp.concatenate(
        [sums, jnp.zeros((SV8, 128 - 5), jnp.float32)], axis=1
    )

    # refresh C_SV and write out (value-level slicing only: ref sublane
    # slices must be 8-aligned on TPU)
    out_ref[:, :] = jnp.concatenate([merged[0:15, :], bc32(sv)], axis=0)

    @pl.when(b == nb - 1)
    def _fin():
        bins_ref[:, :] = acc_ref[:, :]


def merge_bin(
    baseT: jax.Array,  # (16, N) drifted packed pool
    rowsT: jax.Array,  # (16, EVT_CAP) machinery results, row 15 = target idx
    starts: jax.Array,  # (nb+1,) i32 aligned segment starts
    counts: jax.Array,  # (nb,) i32 exact counts (clamped to EVT_CAP)
    T_sv: jax.Array,  # (SV,) f32
    geo,
    params,
    interpret: bool = False,
    vma=None,
):
    """Returns (mergedT (16, N), bins (SV8, 5) raw sums [e, e*v, Np])."""
    from nanokappa_tpu.constants import HBAR

    C, N = baseT.shape
    assert C == 16
    nb = -(-N // BN)
    SV = int(geo.n_subvols)
    SV8 = max(8, -(-SV // 8) * 8)

    rows_pad = jnp.pad(rowsT, ((0, 0), (0, BN)))
    SVP = max(128, -(-SV // 128) * 128)
    tsv = jnp.zeros((1, SVP), jnp.float32).at[0, :SV].set(T_sv)

    bounds = np.asarray(geo.bounds)
    ax = int(geo.slice_axis)
    lo_b = float(bounds[0, ax])
    inv_len = float(SV / (bounds[1, ax] - bounds[0, ax]))
    cfg = dict(
        n_cap=N,
        sv8=SV8,
        n_subvols=SV,
        slice_axis=ax,
        lo=lo_b,
        inv_len=inv_len,
        t_reference=float(params.t_reference),
        hbar=HBAR,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # T_sv: scalar reads
            pl.BlockSpec((16, BN), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((16, BN), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SV8, 128), lambda b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((16, BN), jnp.float32),
            pltpu.VMEM((SV8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kw = dict(vma=frozenset(vma)) if vma else {}
    merged, bins = pl.pallas_call(
        partial(_kernel, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((16, nb * BN), jnp.float32, **kw),
            jax.ShapeDtypeStruct((SV8, 128), jnp.float32, **kw),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(starts, counts, tsv, baseT, rows_pad)
    return merged[:, :N], bins[:, :5]
