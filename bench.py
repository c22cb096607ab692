"""Benchmark: phonon-timestep updates/sec/chip on the flagship film config.

Prints ONE JSON line per config; the LAST line is the headline the driver
records:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference (brunohs1993/Nanokappa) sustains ~1.7e5
particle-timestep updates/s single-thread (BASELINE.md: 10 timesteps of 1e5
particles per ~5.9 s on the author's machine).

Wall-clock budget: the mode-table/boundary-table/geometry build is
n_p-independent, so it is built ONCE per mesh size and shared across the
configs that use it (the 31^3 boundary tables alone cost ~1 min of host
work); the bench stays well inside a 10-minute window with a warm
compilation cache.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_UPDATES_PER_S = 1.7e5


def build_ctx(mesh_pts: int):
    """Population-independent context: material + domain + device geometry +
    boundary tables (all O(modes), none O(particles))."""
    from nanokappa_tpu.material import synthetic_material
    from nanokappa_tpu.geometry.domain import build_domain
    from nanokappa_tpu.geometry.device import build_device_geometry
    from nanokappa_tpu.sim.boundary_tables import build_boundary_tables

    mat = synthetic_material(mesh=(mesh_pts, mesh_pts, mesh_pts))
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
    geo = build_device_geometry(dom)
    btab = build_boundary_tables(mat, dom)
    return mat, dom, geo, btab


def run_config(ctx, n_particles: float, res_gen: str):
    """One benchmark run; returns (updates_per_s, n_modes)."""
    import numpy as np
    import jax

    from nanokappa_tpu.sim.state import (
        SimParams, init_state, particle_count, round_pool_cap,
    )
    from nanokappa_tpu.sim.reservoir import (
        autosize_c_max, autosize_inj_cap, build_reservoir_tables,
    )
    from nanokappa_tpu.sim.step import build_step

    mat, dom, geo, btab = ctx
    n_p, rho = particle_count(("total", n_particles), mat, dom)
    rtab = build_reservoir_tables(mat, dom, 1.0, rho)
    params = SimParams(
        dt=1.0,
        n_cap=round_pool_cap(int(n_p * 1.25)),
        inj_cap=autosize_inj_cap(rtab),
        c_max=autosize_c_max(rtab),
        temp_interp="nearest",  # the reference's default interpolation
        res_gen=res_gen,
        particle_density=rho,
        n_active_modes=mat.n_active_modes,
        t_reference=300.0,
    )
    state = init_state(
        mat, dom, geo, params, n_p, temp_dist="linear", btab=btab
    )
    # the driver's real dispatch pattern (driver.py run): one host sync per
    # 100 simulated steps (10 batched convergence datapoints of 10 steps)
    run = build_step(
        geo, mat.device_tables(), btab, rtab, params, n_inner=10, n_outer=10
    )

    # warm up: compile + reach steady boundary-event mix
    state, out = run(state)
    state, out = run(state)
    jax.block_until_ready(state.pos)

    n_runs = 3  # 300 timesteps
    t0 = time.perf_counter()
    for _ in range(n_runs):
        state, out = run(state)
    jax.block_until_ready(state.pos)
    elapsed = time.perf_counter() - t0

    n_alive = int(np.asarray(jax.tree.map(lambda x: x[-1], out).N_p))
    return n_runs * 100 * n_alive / elapsed, mat.n_modes


def main():
    from nanokappa_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    n_particles = float(sys.argv[1]) if len(sys.argv) > 1 else 1e6
    mesh_pts = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    if mesh_pts:  # explicit single config
        ups, n_modes = run_config(build_ctx(mesh_pts), n_particles, "constant")
        print(json.dumps({
            "metric": f"phonon-timestep updates/sec/chip ({n_particles:.0e} "
                      f"particles, {n_modes} modes)",
            "value": ups,
            "unit": "updates/s",
            "vs_baseline": ups / BASELINE_UPDATES_PER_S,
        }))
        return

    # small-table config first (round-1 continuity line) ...
    ups8, _ = run_config(build_ctx(8), n_particles, "constant")
    print(json.dumps({
        "metric": "phonon-timestep updates/sec/chip (1e6 particles, "
                  "Si-film-analog, 8^3 table)",
        "value": ups8,
        "unit": "updates/s",
        "vs_baseline": ups8 / BASELINE_UPDATES_PER_S,
    }), flush=True)
    # ... the production-table line at 1e6 particles (round-2/3 continuity):
    # the reference Si sample's full 31^3 mesh = 178,746 modes
    # (classes/Phonon.py:115-139), with the O(buffer) 'pooled' reservoir
    # generation scheme sized for production mode tables.
    ctx31 = build_ctx(31)
    ups31, n_modes = run_config(ctx31, n_particles, "pooled")
    print(json.dumps({
        "metric": f"phonon-timestep updates/sec/chip (1e6 particles, "
                  f"production 31^3 table = {n_modes} modes, pooled gen)",
        "value": ups31,
        "unit": "updates/s",
        "vs_baseline": ups31 / BASELINE_UPDATES_PER_S,
    }), flush=True)
    # ... and the HEADLINE (last line = the one the driver records): the
    # production 31^3 table at 1e7 particles, where the per-step fixed
    # overheads (narrow event machinery, injection pipeline, host dispatch)
    # amortise over 10x the population — the regime a production chip
    # actually runs (BASELINE config 5 is 1e8 across chips; pool+tables =
    # ~1.5 GB of the chip's 16 GB HBM at 1e7/chip). The chip is a shared
    # pool: a failed large-pool allocation must not abort the bench, so
    # this config degrades to re-printing the 1e6 headline.
    try:
        ups1e7p, _ = run_config(ctx31, 1e7, "pooled")
        print(json.dumps({
            "metric": f"phonon-timestep updates/sec/chip (1e7 particles, "
                      f"production 31^3 table = {n_modes} modes, pooled "
                      f"gen)",
            "value": ups1e7p,
            "unit": "updates/s",
            "vs_baseline": ups1e7p / BASELINE_UPDATES_PER_S,
        }))
    except Exception as e:  # noqa: BLE001 — fall back to the 1e6 headline
        print(f"# 1e7/31^3 line skipped ({type(e).__name__}); "
              f"re-printing the 1e6 production line as the headline",
              flush=True)
        print(json.dumps({
            "metric": f"phonon-timestep updates/sec/chip (1e6 particles, "
                      f"production 31^3 table = {n_modes} modes, pooled "
                      f"gen)",
            "value": ups31,
            "unit": "updates/s",
            "vs_baseline": ups31 / BASELINE_UPDATES_PER_S,
        }))


if __name__ == "__main__":
    main()
