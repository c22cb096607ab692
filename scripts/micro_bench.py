"""Microbenchmarks of the step's component primitives on the real TPU."""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    N = 1 << 20  # ~1e6
    EVT = 1 << 16
    SV = 16
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random(N) < 0.05)
    vals5 = jnp.asarray(rng.random((N, 5)), dtype=jnp.float32)
    sv = jnp.asarray(rng.integers(0, 10, N), dtype=jnp.int32)
    pos = jnp.asarray(rng.random((N, 3)), dtype=jnp.float32)
    vel = jnp.asarray(rng.random((N, 3)), dtype=jnp.float32)
    f1 = [jnp.asarray(rng.random(N), dtype=jnp.float32) for _ in range(6)]
    pidx = jnp.asarray(rng.integers(0, N, EVT), dtype=jnp.int32)
    rows = jnp.asarray(rng.random((EVT, 12)), dtype=jnp.float32)

    from nanokappa_tpu.sim import cascade as C

    # 1. compaction variants
    for impl in ["scatter", "searchsorted", "pallas"]:
        C._COMPACT_IMPL = impl
        f = jax.jit(partial(C._compact, cap=EVT))
        print(f"compact[{impl:12s}]: {timeit(f, mask):7.3f} ms")

    # 2. plain cumsum
    f = jax.jit(lambda m: jnp.cumsum(m.astype(jnp.int32)))
    print(f"cumsum(N):           {timeit(f, mask):7.3f} ms")

    # 3. pack (N,12) concatenate
    @jax.jit
    def pack(pos, vel, fs):
        return jnp.concatenate([pos, vel] + [x[:, None] for x in fs], axis=1)

    print(f"pack (N,12):         {timeit(pack, pos, vel, f1):7.3f} ms")

    packed = pack(pos, vel, f1)

    # 4. row gather + scatter at EVT width
    f = jax.jit(lambda p, i: p[i])
    print(f"gather (EVT,12):     {timeit(f, packed, pidx):7.3f} ms")
    f = jax.jit(lambda p, i, r: p.at[i].set(r, mode="drop"))
    print(f"scatter (EVT,12):    {timeit(f, packed, pidx, rows):7.3f} ms")

    # 5. unpack: slice columns back out
    @jax.jit
    def unpack(p):
        return p[:, 0:3], p[:, 3:6], p[:, 6], p[:, 7], p[:, 8]

    print(f"unpack:              {timeit(unpack, packed):7.3f} ms")

    # 6. binning: segment_sum vs one-hot matmul
    @jax.jit
    def seg(vals, sv):
        return jax.ops.segment_sum(vals, sv, num_segments=SV)

    print(f"segment_sum (N,5):   {timeit(seg, vals5, sv):7.3f} ms")

    @jax.jit
    def onehot_mm(vals, sv):
        oh = (sv[:, None] == jnp.arange(SV)[None, :]).astype(jnp.float32)
        return oh.T @ vals

    print(f"onehot matmul (N,5): {timeit(onehot_mm, vals5, sv):7.3f} ms")

    @jax.jit
    def onehot_bf16(vals, sv):
        oh = (sv[:, None] == jnp.arange(SV)[None, :]).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            oh, vals.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    print(f"onehot bf16 mm:      {timeit(onehot_bf16, vals5, sv):7.3f} ms")

    # 7. expm1 occupation over N
    @jax.jit
    def occ(w, T):
        return 1.0 / jnp.expm1(w / T) - 1.0 / jnp.expm1(w / 300.0)

    print(f"expm1 x2 (N):        {timeit(occ, f1[0] + 1.0, f1[1] + 300.0):7.3f} ms")

    # 8. full-width drift arithmetic
    @jax.jit
    def drift(pos, vel, t_coll, rem):
        sf = jnp.minimum(t_coll, rem)
        return pos + vel * sf[:, None], t_coll - sf, rem - sf

    print(f"drift arith (N):     {timeit(drift, pos, vel, f1[2], f1[3]):7.3f} ms")

    # 9. gather from (M,) table at N random ints (mode property lookup)
    M = 178_746
    tab = jnp.asarray(rng.random(M), dtype=jnp.float32)
    midx = jnp.asarray(rng.integers(0, M, N), dtype=jnp.int32)
    f = jax.jit(lambda t, i: t[i])
    print(f"table gather (N):    {timeit(f, tab, midx):7.3f} ms")


if __name__ == "__main__":
    main()
