"""XLA cost analysis of the compiled step: what the compiler thinks it moves.

Prints bytes-accessed / flops / transcendentals for the full step program and
a few isolated sub-programs, to expose layout padding blowups (e.g. (N,3)
arrays padded 3->128 lanes) that microbenchmarks of isolated ops hide.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def report(name, compiled, n_steps=1):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    b = ca.get("bytes accessed", float("nan"))
    f = ca.get("flops", float("nan"))
    t = ca.get("transcendentals", float("nan"))
    print(f"{name:28s}: bytes={b / 1e6 / n_steps:10.1f} MB/step  "
          f"flops={f / 1e9 / n_steps:7.2f} G  transc={t / 1e6 / n_steps:7.1f} M",
          flush=True)


def main():
    from nanokappa_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from scripts.profile_step import build

    n = float(sys.argv[1]) if len(sys.argv) > 1 else 1e6
    n_inner = 20
    run, state = build(n, 8, n_inner=n_inner)
    # run is a jitted function; trace + compile
    lowered = run.lower(state)
    compiled = lowered.compile()
    report(f"full step x{n_inner} (/step)", compiled, n_steps=n_inner)

    # isolated pieces
    N = state.pos.shape[0]

    @jax.jit
    def drift(pos, vel, t_coll, rem):
        sf = jnp.minimum(t_coll, rem)
        return pos + vel * sf[:, None], t_coll - sf

    rem = jnp.ones(N)
    report(
        "drift (N,3) arrays",
        drift.lower(state.pos, state.vel, state.t_coll, rem).compile(),
    )

    @jax.jit
    def pack(state):
        bc32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
        return jnp.concatenate(
            [
                state.pos, state.vel, state.omega[:, None],
                state.tau[:, None], state.dev[:, None],
                bc32(state.mode)[:, None], bc32(state.coll_facet)[:, None],
                bc32(state.coll_facet)[:, None],
            ],
            axis=1,
        )

    report("pack (N,12)", pack.lower(state).compile())

    packed = pack(state)
    pidx = jnp.arange(1 << 16, dtype=jnp.int32)

    @jax.jit
    def gather(p, i):
        return p[i]

    report("gather (EVT,12)", gather.lower(packed, pidx).compile())


if __name__ == "__main__":
    main()
