"""Time each phase of the step as an isolated jitted function on real state,
plus the scan-vs-unrolled comparison, to find where the milliseconds live."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from nanokappa_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from scripts.profile_step import build
    from nanokappa_tpu.sim.reservoir import inject
    from nanokappa_tpu.sim.cascade import run_cascade
    from nanokappa_tpu.sim import cascade as C
    from nanokappa_tpu.sim.binning import (
        bin_all, interp_T_particles, lookup_E_of_T, lookup_T_of_E,
        particle_energies, subvol_id,
    )
    from nanokappa_tpu.sim.scatter import rta_scatter

    n = float(sys.argv[1]) if len(sys.argv) > 1 else 1e6
    run, state = build(n, 8, n_inner=20)
    # reach steady state
    state, _ = run(state)
    jax.block_until_ready(state.pos)

    import functools
    from nanokappa_tpu.material import synthetic_material
    from nanokappa_tpu.geometry.domain import build_domain
    from nanokappa_tpu.geometry.device import build_device_geometry
    from nanokappa_tpu.sim.state import SimParams, particle_count
    from nanokappa_tpu.sim.boundary_tables import build_boundary_tables
    from nanokappa_tpu.sim.reservoir import build_reservoir_tables
    from scripts.profile_step import build as build_cfg

    # rebuild the pieces the same way build() does
    mat_h = synthetic_material(mesh=(8, 8, 8))
    dom = build_domain(
        geometry="box", dimensions=(5e3, 1e3, 1e3),
        subvolumes=("slice", 10, 0),
        bound_pos=("relative", -0.1, 0.5, 0.5, 1.1, 0.5, 0.5, 0.5, 0.5,
                   -0.1, 0.5, 0.5, 1.1),
        bound_cond=("T", "T", "R", "R", "P"),
        bound_values=(302.0, 298.0, 0.0, 0.0),
        connect_pos=("relative", 0.5, -0.1, 0.5, 0.5, 1.1, 0.5),
    )
    n_p, rho = particle_count(("total", n), mat_h, dom)
    params = SimParams(
        dt=1.0, n_cap=int(n_p * 1.25), inj_cap=1 << 13, evt_cap=1 << 16,
        temp_interp="nearest", particle_density=rho,
        n_active_modes=mat_h.n_active_modes, t_reference=300.0,
    )
    geo = build_device_geometry(dom)
    btab = build_boundary_tables(mat_h, dom)
    rtab = build_reservoir_tables(mat_h, dom, params.dt, rho)
    mat = mat_h.device_tables()

    key = jax.random.PRNGKey(0)

    @jax.jit
    def phase_inject(state):
        return inject(state, geo, mat, rtab, params, key, 0)

    print(f"inject:   {timeit(phase_inject, state):7.3f} ms", flush=True)
    st2, stale_idx = phase_inject(state)

    @jax.jit
    def phase_cascade(st2, stale_idx):
        return run_cascade(st2, stale_idx, geo, mat, btab, params, key)

    print(
        f"cascade:  {timeit(phase_cascade, st2, stale_idx):7.3f} ms",
        flush=True,
    )
    st3 = phase_cascade(st2, stale_idx)

    @jax.jit
    def phase_bin(state):
        sv = subvol_id(geo, state.pos)
        energies = particle_energies(
            state.omega, state.dev, state.alive, state.T_sv[sv],
            params.t_reference,
        )
        e_dev_sv, phi, np_sv = bin_all(
            geo, mat, energies, state.vel, sv, state.alive,
            params.energy_normal, params.particle_density, lambda x: x,
        )
        E_sv = e_dev_sv + lookup_E_of_T(mat, state.T_sv)
        T_sv_new = lookup_T_of_E(mat, E_sv)
        T_p = interp_T_particles(geo, T_sv_new, state.pos, sv, params.temp_interp)
        dev = rta_scatter(
            mat, state.dev, state.mode, state.omega, T_p, state.alive,
            params.dt, params.t_reference, tau=state.tau,
        )
        return sv, T_sv_new, np_sv, phi, dev

    print(f"bin+rta:  {timeit(phase_bin, st3):7.3f} ms", flush=True)

    # cascade internals
    @jax.jit
    def casc_compact(state):
        event = state.alive & (state.coll_facet >= 0)
        return C._compact(event, 1 << 16)

    print(f"  compact alone: {timeit(casc_compact, st3):7.3f} ms", flush=True)

    # scan overhead: n_inner=1 vs 20
    run1, _ = build_cfg(n, 8, n_inner=1)
    print(f"step n_inner=1:  {timeit(run1, state):7.3f} ms", flush=True)
    print(f"step n_inner=20: {timeit(run, state):7.3f} ms (/20 = "
          f"{timeit(run, state) / 20:.3f})", flush=True)


if __name__ == "__main__":
    main()
