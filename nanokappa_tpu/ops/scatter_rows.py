"""Pallas sorted-unique row scatter: out = base with base[idx[e], :] <- rows[e, :].

XLA lowers a 65K-row scatter into a (N,16) matrix to a serial per-row update
(~3 ms at N=1.25e6 — the single hottest op of the simulation step). Because
the cascade's indices are ASCENDING and UNIQUE (they come from stream
compaction), the scatter partitions over contiguous output blocks: block b
owns the update slice [starts[b], starts[b+1]) with
starts = searchsorted(idx, block_edges).

Inside a block the updates are EXPANDED from their left-packed slice order to
their target lanes with a fully vectorised log-shift network (the inverse of
the compaction network in ops/compact.py): an update at slice lane l must
move right by D_l = (target_lane + 128) - l, which is NON-DECREASING along l
(targets strictly increase while slice lanes increase by 1), so processing
the shift bits MSB->LSB keeps all intermediate positions distinct — 15
rounds of (roll, select) over the whole (16, BN+128) tile, with no
per-element stores (Mosaic forbids dynamic lane indexing). The +128 target
offset absorbs the 128-alignment of the update-slice DMA. Lanes whose delta
reaches 0 carry valid updates; the final merge is one select against the
base block.

Everything runs TRANSPOSED — (C, N) with particles on the lane axis — which
matches the (N, C) array's physical XLA layout {0,1} (transpose is free) and
keeps the VMEM block at (16, BN) instead of a 14->128 lane pad.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN = 16384  # output-block width (particles); 1 MB VMEM per (16, BN) buffer
_W = BN + 128  # network width: updates land at target+128 after alignment
_BIG = 1 << 29  # invalid-lane marker: no bits below 2^15, never moves


def _kernel(starts_ref, base_ref, rows_hbm, idx_hbm, out_ref,
            vals_s, idx_s, sem_r, sem_i, *, C: int):
    b = pl.program_id(0)
    lo = starts_ref[b]
    hi = starts_ref[b + 1]
    lo_al = pl.multiple_of((lo // 128) * 128, 128)
    off0 = lo - lo_al  # in [0, 128)

    cp_r = pltpu.make_async_copy(rows_hbm.at[:, pl.ds(lo_al, _W)], vals_s, sem_r)
    cp_i = pltpu.make_async_copy(idx_hbm.at[:, pl.ds(lo_al, _W)], idx_s, sem_i)
    cp_r.start()
    cp_i.start()
    cp_i.wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _W), 1)
    count = hi - lo
    t = lane - off0  # position within this block's update slice
    tgt = idx_s[:, :] - b * BN  # target lane within the block
    delta = jnp.where((t >= 0) & (t < count), tgt + 128 - lane, _BIG)

    cp_r.wait()
    vals = vals_s[:, :]  # (C, _W)

    s = 1 << 14
    while s >= 1:
        mv_v = pltpu.roll(vals, s, axis=1)
        mv_d = pltpu.roll(delta, s, axis=1)
        take = (mv_d & s) != 0  # arriving element hops 2^s right
        stay = (delta & s) == 0
        vals = jnp.where(jnp.broadcast_to(take, vals.shape), mv_v, vals)
        delta = jnp.where(take, mv_d - s, jnp.where(stay, delta, _BIG))
        s //= 2

    valid = delta[:, 128:] == 0  # (1, BN)
    out_ref[:, :] = jnp.where(
        jnp.broadcast_to(valid, (C, BN)), vals[:, 128:], base_ref[:, :]
    )


def scatter_rows_sorted(
    base: jax.Array,  # (N, C) f32
    rows: jax.Array,  # (E, C) f32 updates
    idx: jax.Array,  # (E,) i32 ascending, unique; sentinel >= N lanes dropped
    interpret: bool = False,
) -> jax.Array:
    """Returns base with base[idx[e]] = rows[e] (sentinel lanes skipped)."""
    N, C = base.shape
    E = rows.shape[0]
    n_pad = -(-N // BN) * BN
    nb = n_pad // BN
    CP = -(-C // 8) * 8  # sublane dim must be 8-aligned for memref slicing

    baseT = base.T  # (C, N): matches the (N, C) physical layout; free
    baseT = jnp.pad(baseT, ((0, CP - C), (0, n_pad - N)))
    rowsT = jnp.pad(rows.T, ((0, CP - C), (0, _W)))  # DMA-overrun margin
    # sentinel entries (>= N) are remapped to DISTINCT values past the last
    # block edge so they stay sorted/unique and are excluded by `starts`
    lane_e = jnp.arange(E, dtype=jnp.int32)
    idx_c = jnp.where(idx >= N, n_pad + lane_e, idx)
    idx_p = jnp.pad(idx_c, (0, _W), constant_values=jnp.int32(2**30))[None, :]

    edges = jnp.arange(nb + 1, dtype=jnp.int32) * BN
    starts = jnp.searchsorted(idx_c, edges, side="left").astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((CP, BN), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # rowsT: DMA'd manually
            pl.BlockSpec(memory_space=pl.ANY),  # idx: DMA'd manually
        ],
        out_specs=pl.BlockSpec(
            (CP, BN), lambda i, s: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((CP, _W), base.dtype),
            pltpu.VMEM((1, _W), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    outT = pl.pallas_call(
        partial(_kernel, C=CP),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((CP, n_pad), base.dtype),
        interpret=interpret,
    )(starts, baseT, rowsT, idx_p)
    return outT[:C, :N].T
