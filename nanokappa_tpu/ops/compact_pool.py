"""Pool defragmentation: pack all alive lanes of the pool to an (almost)
dense prefix, once per compaction interval (sim/step.py build_step).

The v2 step appends reservoir injections AND finished event rows at the pool
TAIL (contiguous dynamic-update-slices — no scatter) while absorption kills
lanes anywhere, so the live region grows every step and accumulates holes.
This kernel restores density so the tail never reaches the pool capacity:
per input block, the alive columns are compacted in-register (the 16-row
monotone log-shift network of ops/scatter_rows.py, in the dense flattened
order of ops/megastep.py) and DMA'd to the block's global alive-prefix
offset.

Output offsets are 128-lane aligned per block (computed OUTSIDE from the
per-block alive counts), so consecutive segments leave < 128 dead filler
lanes between them — the pool stays >99% dense at production block counts.
Each block writes a full tile-wide window whose overrun garbage is
overwritten by the NEXT block's window (TPU grids run sequentially). Output
lanes past the LAST block's window are never written and carry unspecified
data; the wrapper rewrites the C_ALIVE row so every lane >= the returned
tail reads dead, which is the only property downstream kernels rely on for
unwritten lanes (all physics is alive-masked).

The wrapper takes and returns the kernel-native 3-D (16, NR, L) pool layout
of ops/megastep.py. The segment DMA needs 128-LANE aligned dynamic offsets,
which only a flat (16, N) output layout supports (a (NR, L) row offset would
have to be 8-row = whole-block aligned under sublane tiling), so the pool
converts to flat and back INSIDE this wrapper — two layout-conversion copies
per compaction interval instead of two per step.

The reference has no analogue (np.delete re-packs implicitly at every event,
classes/Population.py:832-850); this is the fixed-shape equivalent, amortised
over the compaction interval.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanokappa_tpu.ops.megastep import (
    _BIG, _cumsum_flat, _iota_flat, _shift_up, _unflat8, tile_width,
)
from nanokappa_tpu.sim.state import C_ALIVE


def _kernel(starts_ref, in_ref, *rest, cfg):
    C, Cp = cfg["C"], cfg["Cp"]
    if cfg["use_mirror"]:
        mir_ref, out_hbm, mout_hbm, scratch, mscratch, sem = rest
    else:
        mir_ref = mout_hbm = mscratch = None
        out_hbm, scratch, sem = rest
    b = pl.program_id(0)
    # per-attribute 2-D loads: indexing the leading (untiled) dim of the
    # (C, 8, L) block yields dense (8, L) values. C = 24 carries the
    # specular-mirror cache as rows 16..23 of the SAME array (combined
    # layout) — one DMA stream keeps both halves lane-aligned by
    # construction.
    vals = [in_ref[c] for c in range(C)]  # C x (8, L)
    if cfg["use_mirror"]:
        # separate-array form: the mirror side pool compacts through the
        # SAME delta network so its rows stay lane-aligned
        vals += [mir_ref[c] for c in range(8)]
    alive = vals[C_ALIVE] > 0.5

    BN = 8 * alive.shape[-1]
    p = _iota_flat(alive.shape)
    c = _cumsum_flat(alive.astype(jnp.int32))
    count = jnp.sum(alive.astype(jnp.int32))
    delta = jnp.where(alive, p - (c - 1), _BIG)

    s = 1
    while s < BN:
        sh_dlt = _shift_up(delta, s)
        take = (sh_dlt & s) != 0
        stay = (delta & s) == 0
        vals = [jnp.where(take, _shift_up(v, s), v) for v in vals]
        delta = jnp.where(take, sh_dlt - s, jnp.where(stay, delta, _BIG))
        s *= 2

    # assemble the (16, BN) flat-order scratch: filler lanes (alignment gaps
    # + overrun) become DEAD zero rows
    lane_flat = jax.lax.broadcasted_iota(jnp.int32, (1, BN), 1)
    keep = lane_flat < count
    # pad to Cp rows: the flat-output DMA below slices the FULL leading dim,
    # which Mosaic requires to be a sublane-tiling (8) multiple — 18-row slim
    # pools ship as 24-row windows with 6 zero filler rows (BENCH_r03 crash)
    rows = jnp.concatenate(
        [jnp.where(keep, _unflat8(v), 0.0) for v in vals[:C]]
        + [jnp.zeros((Cp - C, BN), jnp.float32)] * (Cp > C),
        axis=0,
    )  # (Cp, BN)
    scratch[:, :] = rows
    off = starts_ref[b]
    cp = pltpu.make_async_copy(
        scratch, out_hbm.at[:, pl.ds(pl.multiple_of(off, 128), BN)], sem
    )
    cp.start()
    cp.wait()
    if cfg["use_mirror"]:
        mrows = jnp.concatenate(
            [jnp.where(keep, _unflat8(v), 0.0) for v in vals[C:C + 8]],
            axis=0,
        )  # (8, BN)
        mscratch[:, :] = mrows
        cpm = pltpu.make_async_copy(
            mscratch, mout_hbm.at[:, pl.ds(pl.multiple_of(off, 128), BN)],
            sem,
        )
        cpm.start()
        cpm.wait()


def compact_pool(
    pool3: jax.Array,
    mirror3: jax.Array | None = None,
    interpret: bool = False,
    vma=None,
):
    """Defragment the (16, NR, L) pool (NR * L a tile_width multiple).
    Returns (pool3', mirror3', tail): all alive lanes packed
    (order-preserving) into [0, tail) of the flattened lane order, < 128
    dead filler lanes per source block; lanes >= tail carry a cleared alive
    row but otherwise stale data. The optional (8, NR, L) specular-mirror
    side pool compacts through the same permutation (mirror3' is None when
    not given)."""
    C, NR, L = pool3.shape
    N = NR * L
    bn = tile_width(N)
    assert C in (16, 18, 24) and bn is not None and bn // 8 == L, (
        C, NR, L,
    )
    Cp = ((C + 7) // 8) * 8  # sublane-aligned row count for the flat DMA
    nb = N // bn
    use_mirror = mirror3 is not None
    # an 18/24-row pool already carries its extra rows inside itself
    assert not (use_mirror and C in (18, 24))

    alive_row = pool3[C_ALIVE] > 0.5  # (NR, L)
    acnt = jnp.sum(
        alive_row.reshape(nb, bn).astype(jnp.int32), axis=1
    )  # (nb,)
    aligned = ((acnt + 127) // 128) * 128
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(aligned)]
    ).astype(jnp.int32)  # (nb+1,)
    tail = starts[nb - 1] + acnt[nb - 1]

    in_specs = [
        pl.BlockSpec(
            (C, 8, L), lambda b, *_: (0, b, 0), memory_space=pltpu.VMEM
        ),
    ]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    out_shape = [jax.ShapeDtypeStruct((Cp, N), jnp.float32)]
    scratch = [pltpu.VMEM((Cp, bn), jnp.float32)]
    operands = [starts, pool3]
    if use_mirror:
        in_specs.append(
            pl.BlockSpec(
                (8, 8, L), lambda b, *_: (0, b, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(jax.ShapeDtypeStruct((8, N), jnp.float32))
        scratch.append(pltpu.VMEM((8, bn), jnp.float32))
        operands.append(mirror3)
    scratch.append(pltpu.SemaphoreType.DMA(()))
    kw = dict(vma=frozenset(vma)) if vma else {}
    if kw:
        out_shape = [
            jax.ShapeDtypeStruct(o.shape, o.dtype, **kw) for o in out_shape
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        partial(_kernel, cfg={"use_mirror": use_mirror, "C": C, "Cp": Cp}),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    out = outs[0][:C] if Cp > C else outs[0]
    mout = outs[1] if use_mirror else None

    # stale pre-compaction data survives past the last written window; kill
    # its alive flags so those lanes are plain dead slots
    lane = jnp.arange(N, dtype=jnp.int32)
    out = out.at[C_ALIVE].set(jnp.where(lane < tail, out[C_ALIVE], 0.0))
    return (
        out.reshape(C, NR, L),
        mout.reshape(8, NR, L) if use_mirror else None,
        tail,
    )
