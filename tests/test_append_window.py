"""Unit tests for the v2 step's tail-append and event-buffer validity logic.

These lock in two on-chip lessons (round 3):
  * the packed rows carry BITCAST integer columns (STALE = -2 is a NaN
    payload; small mode/facet ids are denormals), so every data-movement op
    on them must be bit-preserving — a dynamic-shift jnp.roll on TPU
    canonicalises NaNs and flushes denormals (the zombie-particle bug).
    The tests therefore use bit-hazard values, NOT rng.normal.
  * the drift kernel's event-index buffer is only initialised inside the
    per-block DMA windows; consumer validity must come from the segment
    extents, never from sentinel values alone.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nanokappa_tpu.sim.fused import _append_window


def _hazard_rows(rng, cap):
    rows = rng.normal(size=(16, cap)).astype(np.float32)
    # C_CF = STALE(-2): NaN bit pattern when viewed as f32
    rows[10] = np.full(cap, -2, np.int32).view(np.float32)
    # small int ids: denormal bit patterns
    rows[12] = (np.arange(cap, dtype=np.int32) % 7).view(np.float32)
    rows[9] = (np.arange(cap, dtype=np.int32) % 5).view(np.float32)
    return rows


@pytest.mark.parametrize(
    "cap,tail",
    [(512, 0), (640, 4099), (2048, 14336), (2048, 14337), (512, 15871)],
)
def test_append_window_bit_exact(cap, tail):
    rng = np.random.default_rng(0)
    N, L = 16384, 2048
    pool = rng.normal(size=(16, N)).astype(np.float32)
    pool3 = jnp.asarray(pool.reshape(16, N // L, L))
    rows = _hazard_rows(rng, cap)
    valid = rng.random(cap) < 0.7
    out3, ok = jax.jit(_append_window)(
        pool3, jnp.asarray(rows), jnp.asarray(valid),
        jnp.asarray(tail, jnp.int32),
    )
    out = np.asarray(out3).reshape(16, N)
    exp = pool.copy()
    if tail + cap <= N:
        sel = np.where(valid)[0]
        exp[:, tail + sel] = rows[:, sel]
        assert bool(ok)
    else:
        assert not bool(ok)
    # BIT equality (f32 compare would treat the NaN-payload column as unequal
    # to itself and miss canonicalisation)
    np.testing.assert_array_equal(out.view(np.int32), exp.view(np.int32))


def test_append_window_no_room_drops_everything():
    rng = np.random.default_rng(1)
    N, L = 16384, 2048
    pool = rng.normal(size=(16, N)).astype(np.float32)
    pool3 = jnp.asarray(pool.reshape(16, N // L, L))
    rows = _hazard_rows(rng, 512)
    out3, ok = jax.jit(_append_window)(
        pool3, jnp.asarray(rows),
        jnp.ones(512, bool), jnp.asarray(N - 511, jnp.int32),
    )
    assert not bool(ok)
    np.testing.assert_array_equal(
        np.asarray(out3).reshape(16, N).view(np.int32),
        pool.view(np.int32),
    )


def test_segment_validity_matches_bruteforce():
    """The (EVT_CAP, nb) compare-matrix validity must equal per-block
    interval membership for arbitrary aligned segment layouts, including
    empty blocks sharing a start offset."""
    rng = np.random.default_rng(2)
    nb, EVT_CAP = 9, 2048
    kept = rng.integers(0, 300, size=nb)
    kept[2] = 0
    kept[3] = 0  # empty blocks share start with block 4
    starts = np.zeros(nb, np.int32)
    off = 0
    for b in range(nb):
        starts[b] = off
        off += (kept[b] + 127) // 128 * 128
    lane = np.arange(EVT_CAP)
    expected = np.zeros(EVT_CAP, bool)
    for b in range(nb):
        expected |= (lane >= starts[b]) & (lane < starts[b] + kept[b])
    starts_j = jnp.asarray(starts)
    kept_j = jnp.asarray(kept, jnp.int32)
    lane_b = jnp.arange(EVT_CAP, dtype=jnp.int32)[:, None]
    seg_valid = jnp.any(
        (lane_b >= starts_j[None, :])
        & (lane_b < (starts_j + kept_j)[None, :]),
        axis=1,
    )
    np.testing.assert_array_equal(np.asarray(seg_valid), expected)


def test_compact_pool_mirror_lockstep():
    """Joint pool+mirror compaction must apply the SAME permutation to both
    arrays (lane alignment is the mirror cache's core invariant)."""
    from nanokappa_tpu.ops.compact_pool import compact_pool
    from nanokappa_tpu.sim.state import C_ALIVE

    rng = np.random.default_rng(3)
    N, L = 16384, 2048
    pool = rng.normal(size=(16, N)).astype(np.float32)
    alive = rng.random(N) < 0.8
    pool[C_ALIVE] = alive.astype(np.float32)
    # mirror rows tagged with their lane id so alignment is checkable, and
    # with bit-hazard columns (denormals) so the network must bit-preserve
    mirr = np.zeros((8, N), np.float32)
    mirr[0] = np.arange(N, dtype=np.int32).view(np.float32)
    mirr[5] = (np.arange(N, dtype=np.int32) % 11).view(np.float32)
    pool[0] = np.arange(N, dtype=np.float32)  # lane id as float too
    p3 = jnp.asarray(pool.reshape(16, N // L, L))
    m3 = jnp.asarray(mirr.reshape(8, N // L, L))
    out3, mout3, tail = jax.jit(
        lambda a, b: compact_pool(a, b, interpret=True)
    )(p3, m3)
    out = np.asarray(out3).reshape(16, N)
    mout = np.asarray(mout3).reshape(8, N)
    tail = int(tail)
    oa = out[14] > 0.5
    assert oa[:].sum() == alive.sum() and not oa[tail:].any()
    live = np.where(oa)[0]
    src = out[0, live].astype(np.int64)  # original lane of each packed lane
    np.testing.assert_array_equal(np.sort(src), np.sort(np.where(alive)[0]))
    # mirror rows moved in lockstep, bit-exact
    np.testing.assert_array_equal(
        mout[0, live].view(np.int32), src.astype(np.int32)
    )
    np.testing.assert_array_equal(
        mout[5, live].view(np.int32), (src % 11).astype(np.int32)
    )
