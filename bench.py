"""Benchmark: phonon-timestep updates/sec/chip on the flagship film config.

Prints ONE JSON line per config; the LAST line is the headline the driver
records:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference (brunohs1993/Nanokappa) sustains ~1.7e5
particle-timestep updates/s single-thread (BASELINE.md: 10 timesteps of 1e5
particles per ~5.9 s on the author's machine).

Failure isolation (round-3 lesson: one Mosaic compile failure zeroed the
round's whole perf record): every config runs inside `measure`, which
 (a) retries with the v1 XLA step when the fused v2 path fails to compile,
 (b) on total failure prints a comment line and lets the remaining configs
     run, and
 (c) guarantees the headline slot re-prints the best earlier film line if
     the 1e7 config cannot run, so the driver always records SOME verified
     number and the process exits 0.

Wall-clock budget: the mode-table/boundary-table/geometry build is
n_p-independent, so it is built ONCE per (mesh size, domain) and shared
across the configs that use it (the 31^3 boundary tables alone cost ~1 min
of host work); the bench stays inside its window with a warm compilation
cache.

Round-5 ladder (SEVEN lines; the driver records the LAST):
  1. 1e6 film, 8^3 table (round-1 continuity)
  2. 1e6 film, production 31^3 table
  3. 1e6 8-side nanowire, diffuse walls (in-kernel diffuse path)
  4. 1e6 96-side cylinder, kernel_cast-off + Pallas large-mesh cast
  5. steps-to-converged-kappa (--conv_crit 0.01 5) via the FULL driver
  6. 4e7 film (config-5 per-chip density half-gate)
  7. 1e7 film HEADLINE (last)
"""

from __future__ import annotations

import json
import sys
import time
import traceback

BASELINE_UPDATES_PER_S = 1.7e5


def build_ctx(mesh_pts: int, mat=None):
    """Population-independent context: material + domain + device geometry +
    boundary tables (all O(modes), none O(particles))."""
    from nanokappa_tpu.material import synthetic_material
    from nanokappa_tpu.geometry.domain import build_domain
    from nanokappa_tpu.geometry.device import build_device_geometry
    from nanokappa_tpu.sim.boundary_tables import build_boundary_tables

    if mat is None:
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


def build_wire_ctx(mat):
    """Event-BOUND context: 8-sided cylinder nanowire, diffuse (eta > 0)
    side walls, axial slice subvolumes — every wall hit rides the narrow
    event machinery, so this line tracks cascade/boundary regressions the
    film (specular fast path) cannot see."""
    from nanokappa_tpu.geometry.domain import build_domain
    from nanokappa_tpu.geometry.device import build_device_geometry
    from nanokappa_tpu.sim.boundary_tables import build_boundary_tables

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
        bound_values=(305.0, 295.0, 2.0, 2.0),
        connect_pos=("relative",),
    )
    geo = build_device_geometry(dom)
    btab = build_boundary_tables(mat, dom)
    return mat, dom, geo, btab


def build_bigmesh_ctx(mat):
    """Large-mesh context (opt-in line, `python bench.py largemesh`): a
    96-side cylinder = 384 triangles, beyond the fused step's in-kernel
    cast budget (TRI_KERNEL_MAX=128) — the imported-STL code path: the
    fused step with kernel_cast off (injections pre-cast, every boundary
    event exported) and the Pallas bbox-prefiltered large-mesh ray cast
    (ops/raycast_pallas.py); the 96-normal boundary tables (1.6 GB) ride
    as jit parameters (sim/step.py _parameterize_tables)."""
    from nanokappa_tpu.geometry.domain import build_domain
    from nanokappa_tpu.geometry.device import build_device_geometry
    from nanokappa_tpu.sim.boundary_tables import build_boundary_tables

    dom = build_domain(
        geometry="cylinder",
        dimensions=(4e3, 500.0, 96),
        subvolumes=("slice", 5, 2),
        bound_pos=(
            "relative",
            0.5, 0.5, -0.1,
            0.5, 0.5, 1.1,
            1.1, 0.5, 0.5,
        ),
        bound_cond=("T", "T", "R", "R"),
        bound_values=(305.0, 295.0, 2.0, 2.0),
        connect_pos=("relative",),
    )
    geo = build_device_geometry(dom)
    btab = build_boundary_tables(mat, dom)
    return mat, dom, geo, btab


def run_config(ctx, n_particles: float, res_gen: str, step_impl: str = "auto"):
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
        step_impl=step_impl,
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


def emit(metric: str, ups: float):
    print(json.dumps({
        "metric": metric,
        "value": ups,
        "unit": "updates/s",
        "vs_baseline": ups / BASELINE_UPDATES_PER_S,
    }), flush=True)


def run_convergence(mat, n_particles: float = 1e6):
    """Drive the FULL driver (CLI semantics) on the film config to
    --conv_crit 0.01 5 and return (steps, converged, kappa, ci95, wall_s).

    BASELINE.json's metric line names 'iters to converged kappa' — this
    records it as a driver artifact instead of prose (round-4 'missing' 1).
    Reference anchor: the golden run's convergence machinery
    (classes/Population.py:1797-1830; readme_fig/test_white_0/convergence.txt
    runs 1000 steps WITHOUT reaching the criterion)."""
    import tempfile

    import numpy as np

    from nanokappa_tpu.driver import Simulation
    from nanokappa_tpu.io.config import read_args

    with tempfile.TemporaryDirectory() as td:
        argv = [
            "--mat_folder", td, "--poscar_file", "POSCAR",
            "--hdf_file", "none.h5",
            "--geometry", "box", "--dimensions", "5e3", "1e3", "1e3",
            "--subvolumes", "slice", "10", "0",
            "--bound_pos", "relative", "-0.1", "0.5", "0.5", "1.1", "0.5",
            "0.5", "0.5", "0.5", "-0.1", "0.5", "0.5", "1.1",
            "--bound_cond", "T", "T", "R", "R", "P",
            "--bound_values", "302", "298", "0", "0",
            "--connect_pos", "relative", "0.5", "-0.1", "0.5", "0.5",
            "1.1", "0.5",
            "--temp_dist", "linear", "--temp_interp", "nearest",
            "--particles", "total", f"{n_particles:.0f}",
            "--timestep", "1", "--iterations", "6000",
            "--n_mean", "10", "--conv_crit", "0.01", "5",
            "--results_folder", td + "/conv",
            "--output", "screen",
            "--reservoir_gen", "pooled",
        ]
        sim = Simulation(read_args(argv), material=mat)
        t0 = time.perf_counter()
        sim.run(verbose=False)
        wall = time.perf_counter() - t0
        ks = np.array(
            [w["kappa_total"] for w in sim.window], dtype=float
        )
        kappa = float(np.nanmean(ks))
        ci = float(1.96 * np.nanstd(ks) / max(np.sqrt(len(ks)), 1.0))
        return sim.current_timestep, bool(sim.finish_sim), kappa, ci, wall


def measure(ctx, n_particles: float, res_gen: str, metric: str,
            emit_line: bool = True):
    """Failure-isolated measurement: v2 (auto) twice (remote-compile tunnels
    throw transient INTERNAL errors — observed round 4: 'response body
    closed before all bytes were read'), then one v1 retry on any failure
    (a Pallas/Mosaic compile error must degrade, not abort — the round-3
    BENCH record was empty because config 1 died). Returns
    (ups, metric_actually_emitted) or (None, None)."""
    for attempt in (1, 2):
        try:
            ups, _ = run_config(ctx, n_particles, res_gen, "auto")
            if emit_line:
                emit(metric, ups)
            return ups, metric
        except Exception as e:  # noqa: BLE001
            print(f"# {metric}: fused path attempt {attempt} failed "
                  f"({type(e).__name__}: {str(e).splitlines()[0][:160]}); "
                  f"{'retrying fused' if attempt == 1 else 'retrying with the v1 XLA step'}",
                  flush=True)
            traceback.print_exc(file=sys.stderr)
    try:
        ups, _ = run_config(ctx, n_particles, res_gen, "v1")
        metric_v1 = metric + " [v1 fallback]"
        if emit_line:
            emit(metric_v1, ups)
        return ups, metric_v1
    except Exception as e:  # noqa: BLE001
        print(f"# {metric}: v1 fallback ALSO failed ({type(e).__name__}); "
              f"skipping this config", flush=True)
        traceback.print_exc(file=sys.stderr)
        return None, None


def main():
    from nanokappa_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    if len(sys.argv) > 1 and sys.argv[1] == "largemesh":
        # opt-in: 384-triangle cylinder at 1e6 (v1 + Pallas large-mesh cast)
        from nanokappa_tpu.material import synthetic_material

        mat = synthetic_material(mesh=(31, 31, 31))
        ups, n_modes = run_config(build_bigmesh_ctx(mat), 1e6, "constant")
        emit(
            f"phonon-timestep updates/sec/chip (1e6 particles, 96-side "
            f"cylinder = 384 triangles, fused kernel_cast-off + Pallas large-mesh cast, "
            f"{n_modes} modes)", ups,
        )
        return

    n_particles = float(sys.argv[1]) if len(sys.argv) > 1 else 1e6
    mesh_pts = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    if mesh_pts:  # explicit single config
        ups, n_modes = run_config(build_ctx(mesh_pts), n_particles, "constant")
        emit(
            f"phonon-timestep updates/sec/chip ({n_particles:.0e} "
            f"particles, {n_modes} modes)", ups,
        )
        return

    # small-table config first (round-1 continuity line) ...
    measure(
        build_ctx(8), n_particles, "constant",
        "phonon-timestep updates/sec/chip (1e6 particles, Si-film-analog, "
        "8^3 table)",
    )
    # ... the production-table line at 1e6 particles (round-2/3 continuity):
    # the reference Si sample's full 31^3 mesh = 178,746 modes
    # (classes/Phonon.py:115-139), with the O(buffer) 'pooled' reservoir
    # generation scheme sized for production mode tables.
    ctx31 = build_ctx(31)
    n_modes = ctx31[0].n_modes
    ups31, metric31 = measure(
        ctx31, n_particles, "pooled",
        f"phonon-timestep updates/sec/chip (1e6 particles, production 31^3 "
        f"table = {n_modes} modes, pooled gen)",
    )
    # ... the event-bound line: the 8-side nanowire with diffuse walls at
    # 1e6 (README 'Performance') — tracks the cascade/narrow machinery the
    # specular film never exercises. Shares the 31^3 material tables.
    measure(
        build_wire_ctx(ctx31[0]), n_particles, "constant",
        f"phonon-timestep updates/sec/chip (1e6 particles, 8-side nanowire, "
        f"diffuse walls, 31^3 table = {n_modes} modes)",
    )
    # ... the imported-STL code path as a RECORDED line (round-4 'missing'
    # 2): 96-side cylinder = 384 triangles > TRI_KERNEL_MAX, so the fused
    # step runs kernel_cast-off with the Pallas bbox-prefiltered large-mesh
    # ray cast (ops/raycast_pallas.py; reference classes/Mesh.py:806-856)
    measure(
        build_bigmesh_ctx(ctx31[0]), n_particles, "constant",
        f"phonon-timestep updates/sec/chip (1e6 particles, 96-side cylinder "
        f"= 384 triangles, kernel_cast-off + Pallas large-mesh cast, "
        f"{n_modes} modes)",
    )
    # ... iterations-to-converged-kappa as a driver artifact (BASELINE.json
    # names the metric explicitly; previously only prose in
    # docs/VALIDATION.md). Failure-isolated like every line.
    try:
        steps, convd, kappa, ci, wall = run_convergence(ctx31[0], 1e6)
        print(json.dumps({
            "metric": (
                f"steps to converged kappa (film 1e6, 31^3 table, "
                f"--conv_crit 0.01 5; kappa={kappa:.2f}+-{ci:.2f} W/m.K, "
                f"converged={convd}, wall={wall:.0f}s)"
            ),
            "value": float(steps),
            "unit": "steps",
            # the reference sustains ~1.7 steps/s at 1e5 particles
            # (BASELINE.md): time it would need for the same trajectory at
            # OUR particle count, over our wall-clock
            "vs_baseline": (steps / 1.7) * (1e6 / 1e5) / max(wall, 1e-9),
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"# convergence line failed ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}); skipping", flush=True)
        traceback.print_exc(file=sys.stderr)
    # ... the config-5 per-chip density half-gate (round-4 'missing' 4): a
    # 4e7-particle film line proves the pool/compaction/event machinery at
    # the per-chip load a 1e8 x 8-chip run implies (pool ~3.6 GB of 16 GB
    # HBM). Expected to match the 1e7 rate (the step is per-particle-bound).
    measure(
        ctx31, 4e7, "pooled",
        f"phonon-timestep updates/sec/chip (4e7 particles, production 31^3 "
        f"table = {n_modes} modes, pooled gen)",
    )
    # ... and the HEADLINE (last line = the one the driver records): the
    # production 31^3 table at 1e7 particles, where the per-step fixed
    # overheads (narrow event machinery, injection pipeline, host dispatch)
    # amortise over 10x the population — the regime a production chip
    # actually runs (BASELINE config 5 is 1e8 across chips; pool+tables =
    # ~1.5 GB of the chip's 16 GB HBM at 1e7/chip). The chip is a shared
    # pool: any failure here (OOM, compile) degrades to re-printing the 1e6
    # production line so the LAST line is always a real number.
    ups1e7, _ = measure(
        ctx31, 1e7, "pooled",
        f"phonon-timestep updates/sec/chip (1e7 particles, production 31^3 "
        f"table = {n_modes} modes, pooled gen)",
    )
    if ups1e7 is None and ups31 is not None:
        print("# 1e7/31^3 line failed; re-printing the 1e6 production line "
              "as the headline", flush=True)
        emit(metric31, ups31)


if __name__ == "__main__":
    main()
