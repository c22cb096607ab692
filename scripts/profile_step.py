"""Ablation cost map of the fused step on the real TPU.

Usage: python scripts/profile_step.py [n_particles] [mesh_pts]

Runs the flagship film config with each phase skipped in turn
(params.debug_skip) and prints per-step ms so the cascade/binning/injection/
RTA shares are measured, not guessed. Also sweeps N to separate the fixed
overhead from the per-particle cost.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(n_particles, mesh_pts, debug_skip="", n_inner=20, **overrides):
    from nanokappa_tpu.material import synthetic_material
    from nanokappa_tpu.geometry.domain import build_domain
    from nanokappa_tpu.geometry.device import build_device_geometry
    from nanokappa_tpu.sim.state import (
    SimParams, init_state, particle_count, round_pool_cap,
)
    from nanokappa_tpu.sim.boundary_tables import build_boundary_tables
    from nanokappa_tpu.sim.reservoir import build_reservoir_tables
    from nanokappa_tpu.sim.step import build_step

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
    n_p, rho = particle_count(("total", n_particles), mat, dom)
    rtab = build_reservoir_tables(mat, dom, 1.0, rho)
    from nanokappa_tpu.sim.reservoir import autosize_c_max, autosize_inj_cap

    kw = dict(
        dt=1.0,
        n_cap=round_pool_cap(int(n_p * 1.25)),
        inj_cap=autosize_inj_cap(rtab),
        c_max=autosize_c_max(rtab),
        temp_interp="nearest",
        particle_density=rho,
        n_active_modes=mat.n_active_modes,
        t_reference=300.0,
        debug_skip=debug_skip,
    )
    kw.update(overrides)
    params = SimParams(**kw)
    geo = build_device_geometry(dom)
    btab = build_boundary_tables(mat, dom)
    state = init_state(
        mat, dom, geo, params, n_p, temp_dist="linear", btab=btab
    )
    run = build_step(geo, mat.device_tables(), btab, rtab, params, n_inner=n_inner)
    return run, state


def build_wire(n_particles, mesh_pts, eta=2.0, n_inner=20, **overrides):
    """Event-BOUND config: 8-sided cylinder nanowire with diffuse (eta>0)
    side walls — every wall hit rides the narrow event machinery (README
    'Performance': the wire measures ~7x below the film at 1e6)."""
    from nanokappa_tpu.material import synthetic_material
    from nanokappa_tpu.geometry.domain import build_domain
    from nanokappa_tpu.geometry.device import build_device_geometry
    from nanokappa_tpu.sim.state import (
        SimParams, init_state, particle_count, round_pool_cap,
    )
    from nanokappa_tpu.sim.boundary_tables import build_boundary_tables
    from nanokappa_tpu.sim.reservoir import (
        autosize_c_max, autosize_inj_cap, build_reservoir_tables,
    )
    from nanokappa_tpu.sim.step import build_step

    mat = synthetic_material(mesh=(mesh_pts, mesh_pts, mesh_pts))
    dom = build_domain(
        geometry="cylinder",
        dimensions=(4e3, 500.0, 8),
        subvolumes=("slice", 5, 2),
        bound_pos=(
            "relative",
            0.5, 0.5, -0.1,
            0.5, 0.5, 1.1,
            1.1, 0.5, 0.5,
        ),
        bound_cond=("T", "T", "R", "R"),
        bound_values=(305.0, 295.0, eta, eta),
        connect_pos=("relative",),
    )
    n_p, rho = particle_count(("total", n_particles), mat, dom)
    rtab = build_reservoir_tables(mat, dom, 1.0, rho)
    kw = dict(
        dt=1.0,
        n_cap=round_pool_cap(int(n_p * 1.25)),
        inj_cap=autosize_inj_cap(rtab),
        c_max=autosize_c_max(rtab),
        temp_interp="nearest",
        particle_density=rho,
        n_active_modes=mat.n_active_modes,
        t_reference=300.0,
    )
    kw.update(overrides)
    params = SimParams(**kw)
    geo = build_device_geometry(dom)
    btab = build_boundary_tables(mat, dom)
    state = init_state(
        mat, dom, geo, params, n_p, temp_dist="linear", btab=btab
    )
    run = build_step(geo, mat.device_tables(), btab, rtab, params, n_inner=n_inner)
    return run, state


def time_config(n_particles, mesh_pts, debug_skip="", n_inner=20, n_outer=5, **ov):
    import jax

    run, state = build(n_particles, mesh_pts, debug_skip, n_inner, **ov)
    state, out = run(state)
    state, out = run(state)
    jax.block_until_ready(state.pos)
    t0 = time.perf_counter()
    for _ in range(n_outer):
        state, out = run(state)
    jax.block_until_ready(state.pos)
    dt_ms = (time.perf_counter() - t0) / (n_outer * n_inner) * 1e3
    return dt_ms


def main():
    from nanokappa_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    mode = sys.argv[1] if len(sys.argv) > 1 else "ablate"
    n = float(sys.argv[2]) if len(sys.argv) > 2 else 1e6
    mesh_pts = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    if mode == "ablate":
        full = time_config(n, mesh_pts)
        print(f"full step @ N={n:.0e}, mesh={mesh_pts}^3: {full:.3f} ms/step "
              f"-> {n / full * 1e3:.3e} updates/s", flush=True)
        for skip in ["inject", "cascade", "bin",
                     "inject,cascade", "inject,cascade,bin,rta"]:
            ms = time_config(n, mesh_pts, debug_skip=skip)
            print(f"  skip {skip:24s}: {ms:.3f} ms/step (delta {full - ms:+.3f})",
                  flush=True)
    elif mode == "nsweep":
        for nn in [1e5, 1e6, 4e6, 1.6e7]:
            ms = time_config(nn, mesh_pts)
            print(f"  N={nn:.0e}: {ms:.3f} ms/step -> "
                  f"{nn / ms * 1e3:.3e} updates/s", flush=True)
    else:  # single config: mode is the debug_skip string ('' = full)
        skip = "" if mode == "full" else mode
        ms = time_config(n, mesh_pts, debug_skip=skip)
        print(f"  skip '{skip}' N={n:.0e}: {ms:.3f} ms/step -> "
              f"{n / ms * 1e3:.3e} updates/s", flush=True)


if __name__ == "__main__":
    main()
