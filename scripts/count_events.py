"""Measure steady-state event/injection counts for cap sizing.

Usage: python scripts/count_events.py [n_particles]
Runs 60 warmup steps, then reports per-step pending-event counts (drift
kernel ecnt sum), alive counts, and injection n_valid — the numbers that
size EVT_CAP and inj_cap.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nanokappa_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np


def main():
    from scripts.profile_step import build

    n = float(sys.argv[1]) if len(sys.argv) > 1 else 1e6
    run, state = build(n, 8, n_inner=20)
    for _ in range(3):  # 60 warmup steps to steady state
        state, out = run(state)
    jax.block_until_ready(state.packed)

    # one manual v2 step decomposition on the warmed state
    from nanokappa_tpu.ops.megastep import drift_megastep
    from nanokappa_tpu.ops.compact_pool import compact_pool
    from nanokappa_tpu.sim.reservoir import sample_injections
    import scripts.profile_step as ps
    from nanokappa_tpu.material import synthetic_material
    from nanokappa_tpu.geometry.domain import build_domain
    from nanokappa_tpu.geometry.device import build_device_geometry
    from nanokappa_tpu.sim.reservoir import build_reservoir_tables
    from nanokappa_tpu.sim.state import SimParams, particle_count, round_pool_cap
    from nanokappa_tpu.sim.reservoir import autosize_c_max

    mat = synthetic_material(mesh=(8, 8, 8))
    dom = build_domain(
        geometry="box",
        dimensions=(5e3, 1e3, 1e3),
        subvolumes=("slice", 10, 0),
        bound_pos=(
            "relative",
            -0.1, 0.5, 0.5, 1.1, 0.5, 0.5, 0.5, 0.5, -0.1, 0.5, 0.5, 1.1,
        ),
        bound_cond=("T", "T", "R", "R", "P"),
        bound_values=(302.0, 298.0, 0.0, 0.0),
        connect_pos=("relative", 0.5, -0.1, 0.5, 0.5, 1.1, 0.5),
    )
    n_p, rho = particle_count(("total", n), mat, dom)
    rtab = build_reservoir_tables(mat, dom, 1.0, rho)
    params = SimParams(
        dt=1.0, n_cap=round_pool_cap(int(n_p * 1.25)), inj_cap=1 << 13,
        c_max=autosize_c_max(rtab), temp_interp="nearest",
        particle_density=rho, n_active_modes=mat.n_active_modes,
        t_reference=300.0,
    )
    geo = build_device_geometry(dom)

    from nanokappa_tpu.ops.megastep import tile_width

    N = state.packed.shape[0]
    L = tile_width(N) // 8
    pool3 = state.packed.T.reshape(16, N // L, L)
    pool, _, tail = compact_pool(pool3)
    _, _, ecnt, acnt, _, _, _, _ = drift_megastep(
        pool, state.T_sv, jax.numpy.asarray(1), geo, params
    )
    key = jax.random.fold_in(state.key, state.step)
    _, n_valid, _, dropped, _ = sample_injections(
        state, geo, mat.device_tables(), rtab, params, key, 0
    )
    ecnt = np.asarray(ecnt)
    print(f"N_cap={params.n_cap}  alive={int(np.asarray(acnt).sum())}  tail={int(tail)}")
    print(
        f"events: total={ecnt.sum()}  per-block mean={ecnt.mean():.0f} "
        f"max={ecnt.max()}  (nb={len(ecnt)}; EVT_CAP now {params.n_cap // 32})"
    )
    print(f"injections: n_valid={int(n_valid)}  dropped={int(dropped)}  inj_cap={params.inj_cap}")
    exp = float(np.asarray(rtab.enter_prob).sum())
    print(f"sum(enter_prob)={exp:.0f}/step expected")


if __name__ == "__main__":
    main()
