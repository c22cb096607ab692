"""One-command TPU smoke of the production step: compile, run, time.

Usage: python scripts/smoke_v2.py [n_particles] [n_inner]
Prints compile time, N_alive / T profile / lost / frozen sanity, and
ms/step -> updates/s.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nanokappa_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np


def main():
    from scripts.profile_step import build

    n = float(sys.argv[1]) if len(sys.argv) > 1 else 1e5
    n_inner = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    print("backend:", jax.default_backend(), flush=True)
    run, state = build(n, 8, n_inner=n_inner)

    t0 = time.time()
    state, out = run(state)
    jax.block_until_ready(state.packed)
    print(f"compile+first: {time.time() - t0:.1f}s", flush=True)
    state, out = run(state)
    jax.block_until_ready(state.packed)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        state, out = run(state)
    jax.block_until_ready(state.packed)
    dt_step = (time.perf_counter() - t0) / (reps * n_inner)
    T = np.asarray(out.T_sv)
    print(f"N_alive={int(out.N_p)} T=[{T[0]:.3f} {T[1]:.3f} ... {T[-1]:.3f}]")
    print(f"lost={int(out.lost)} frozen={int(out.frozen)}")
    assert np.all(T > 290) and np.all(T < 310), "temperature sanity"
    print(
        f"{dt_step * 1e3:.3f} ms/step -> {n / dt_step:.3e} updates/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
