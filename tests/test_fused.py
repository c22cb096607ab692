"""Fused (v2) step vs the XLA reference (v1) implementation.

The Pallas kernels run in interpret mode on CPU; the deterministic
temperature/periodic configuration makes v1 and v2 trajectories identical
particle-for-particle (injection draws share keys; no reflection
randomness), so per-step observables must agree to f32 summation order.
"""

import numpy as np
import jax
import pytest

from nanokappa_tpu.geometry.device import build_device_geometry
from nanokappa_tpu.geometry.domain import build_domain
from nanokappa_tpu.material import synthetic_material
from nanokappa_tpu.sim.boundary_tables import build_boundary_tables
from nanokappa_tpu.sim.reservoir import build_reservoir_tables
from nanokappa_tpu.sim.state import SimParams, init_state, particle_count
from nanokappa_tpu.sim.step import make_step


def _build(bound="TTP", rough=0.0, n_p=3000, impl="v1", n_shards=1):
    mat = synthetic_material(mesh=(4, 4, 4))
    if bound == "TTP":
        bc, bv = ("T", "T", "P"), (302.0, 298.0)
        bp = ("relative", -0.1, 0.5, 0.5, 1.1, 0.5, 0.5)
        cp = ("relative", 0.5, -0.1, 0.5, 0.5, 1.1, 0.5,
              0.5, 0.5, -0.1, 0.5, 0.5, 1.1)
    else:
        bc, bv = ("T", "T", "R", "R", "P"), (302.0, 298.0, rough, rough)
        bp = ("relative", -0.1, 0.5, 0.5, 1.1, 0.5, 0.5,
              0.5, 0.5, -0.1, 0.5, 0.5, 1.1)
        cp = ("relative", 0.5, -0.1, 0.5, 0.5, 1.1, 0.5)
    dom = build_domain(
        geometry="box", dimensions=(2e3, 1e3, 1e3),
        subvolumes=("slice", 5, 0),
        bound_pos=bp, bound_cond=bc, bound_values=bv, connect_pos=cp,
    )
    n_p, rho = particle_count(("total", n_p), mat, dom)
    params = SimParams(
        dt=1.0, n_cap=4096, inj_cap=512, temp_interp="nearest",
        particle_density=rho, n_active_modes=mat.n_active_modes,
        t_reference=300.0, step_impl=impl, n_shards=n_shards,
    )
    geo = build_device_geometry(dom)
    btab = build_boundary_tables(mat, dom)
    rtab = build_reservoir_tables(mat, dom, 1.0, rho)
    state = init_state(
        mat, dom, geo, params, n_p, temp_dist="linear", seed=3, btab=btab
    )
    return mat, dom, geo, btab, rtab, params, state


def _run(impl, bound="TTP", rough=0.0, n_steps=4):
    mat, dom, geo, btab, rtab, params, state = _build(bound, rough, impl=impl)
    step = jax.jit(make_step(geo, mat.device_tables(), btab, rtab, params))
    outs = []
    for _ in range(n_steps):
        state, out = step(state)
        outs.append(out)
    return state, outs, (mat, geo, params)


def test_v2_matches_v1_deterministic():
    s1, o1, _ = _run("v1")
    s2, o2, aux = _run("v2")
    for k, (a, b) in enumerate(zip(o1, o2)):
        np.testing.assert_allclose(
            np.asarray(a.T_sv), np.asarray(b.T_sv), rtol=2e-6,
            err_msg=f"T_sv step {k}")
        np.testing.assert_array_equal(
            np.asarray(a.Np_sv), np.asarray(b.Np_sv), f"Np_sv step {k}")
        np.testing.assert_allclose(
            np.asarray(a.E_sv), np.asarray(b.E_sv), rtol=2e-6)
        np.testing.assert_allclose(
            np.asarray(a.res_energy_balance),
            np.asarray(b.res_energy_balance), rtol=3e-4, atol=1e-9)
        np.testing.assert_array_equal(
            np.asarray(a.n_leaving), np.asarray(b.n_leaving))
        assert int(b.lost) == 0 and int(b.frozen) == 0

    # same particle multiset (different slots): finalize applies v2's pending
    # deferred RTA, after which sorted occupations must match v1's
    from nanokappa_tpu.sim.fused import make_finalize

    mat, geo, params = aux
    s2f = make_finalize(geo, mat.device_tables(), params)(s2)
    d1 = np.sort(np.asarray(s1.dev)[np.asarray(s1.alive)])
    d2 = np.sort(np.asarray(s2f.dev)[np.asarray(s2f.alive)])
    assert d1.shape == d2.shape
    np.testing.assert_allclose(d1, d2, rtol=5e-4, atol=1e-7)
    p1 = np.sort(np.asarray(s1.pos)[np.asarray(s1.alive)][:, 0])
    p2 = np.sort(np.asarray(s2f.pos)[np.asarray(s2f.alive)][:, 0])
    np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-3)


def test_v2_diffuse_walls_run():
    """Diffuse reflections draw per-lane randomness (lane assignment differs
    from v1), so check invariants instead of equality."""
    s2, o2, _ = _run("v2", bound="TTRRP", rough=10.0, n_steps=4)
    last = o2[-1]
    assert int(last.lost) == 0
    T = np.asarray(last.T_sv)
    assert np.all(T > 290) and np.all(T < 310)
    assert abs(int(last.N_p) - 3000) < 200
    assert np.isfinite(np.asarray(last.phi_sv)).all()


def test_v2_sharded_runs():
    """v2 under shard_map on the virtual CPU mesh: psums + per-shard
    injection must compose with the Pallas kernels (interpret mode)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    from nanokappa_tpu.parallel import (
        build_sharded_step, make_particle_mesh, shard_state,
    )

    mat, dom, geo, btab, rtab, params, state = _build(impl="v2", n_shards=2)
    mesh = make_particle_mesh(2)
    state = shard_state(state, mesh)
    run = build_sharded_step(
        geo, mat.device_tables(), btab, rtab, params, mesh, n_inner=2
    )
    state, out = run(state)
    T = np.asarray(out.T_sv)
    assert np.all(T > 290) and np.all(T < 310)
    assert int(out.lost) == 0
    assert abs(int(out.N_p) - 3000) < 200


def test_v2_sharded_parameterized_tables(monkeypatch):
    """The sharded builder's big-table escape: tables as shard_map
    PARAMETERS with replicated specs (forced via the threshold). Must
    produce the same invariants as the constant-baking sharded path."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    import nanokappa_tpu.sim.step as stp
    from nanokappa_tpu.parallel import (
        build_sharded_step, make_particle_mesh, shard_state,
    )

    monkeypatch.setattr(stp, "_BIG_CONST_BYTES", 0)
    mat, dom, geo, btab, rtab, params, state = _build(impl="v2", n_shards=2)
    mesh = make_particle_mesh(2)
    state = shard_state(state, mesh)
    run = build_sharded_step(
        geo, mat.device_tables(), btab, rtab, params, mesh, n_inner=2
    )
    state, out = run(state)
    T = np.asarray(out.T_sv)
    assert np.all(T > 290) and np.all(T < 310)
    assert int(out.lost) == 0
    assert abs(int(out.N_p) - 3000) < 200


def test_v2_mirror_specular_matches_v1():
    """eta = 0 film walls: the in-kernel specular fast path (mirror-cache
    register swap, ops/megastep.py) must reproduce the v1 XLA cascade.
    With p = 1 both paths are deterministic (the specularity draw cannot
    fail), so trajectories agree to f32 arithmetic (the kernel's expm1
    Taylor twin differs by ~2e-5 relative on reflected occupations)."""
    from nanokappa_tpu.sim.fused import mirror_eligible

    mat, dom, geo, btab, rtab, params, state = _build(
        bound="TTRRP", rough=0.0, impl="v2"
    )
    assert mirror_eligible(
        geo, btab, params, mat.device_tables()
    ), "fast path must be active"
    # the cache must actually be filled at init
    mm = np.asarray(state.mirror)[np.asarray(state.alive)]
    # coarse 4^3 grids leave v_y = 0 modes without a mirror partner; the
    # majority must still be covered
    assert (mm[:, 0].view(np.int32) >= 0).mean() > 0.5

    s1, o1, _ = _run("v1", bound="TTRRP", rough=0.0)
    s2, o2, _ = _run("v2", bound="TTRRP", rough=0.0)
    for k, (a, b) in enumerate(zip(o1, o2)):
        np.testing.assert_allclose(
            np.asarray(a.T_sv), np.asarray(b.T_sv), rtol=1e-4,
            err_msg=f"T_sv step {k}")
        np.testing.assert_allclose(
            np.asarray(a.Np_sv), np.asarray(b.Np_sv), atol=3,
            err_msg=f"Np_sv step {k}")
        assert int(b.lost) == 0
    # the specular walls conserve particles: y-velocity distribution stays
    # symmetric and no lane escapes through the R walls
    pos = np.asarray(s2.pos)[np.asarray(s2.alive)]
    assert pos[:, 1].min() >= -1e-3 and pos[:, 1].max() <= 1e3 + 1e-3


def test_v2_full_mirror_matches_v1(monkeypatch):
    """Pin the FULL (24-row) mirror-cache path. The eta = 0 film config is
    slim-eligible, so test_v2_mirror_specular_matches_v1 exercises only the
    18-row layout; forcing slim_mirror_axis to None keeps the full-path
    kernel branches (_mirror_assemble/_mirror_rows, 24-row else-branch swap)
    covered by a v1 parity check too."""
    import nanokappa_tpu.sim.boundary_tables as bt

    monkeypatch.setattr(bt, "slim_mirror_axis", lambda *a, **k: None)
    s1, o1, _ = _run("v1", bound="TTRRP", rough=0.0)
    s2, o2, _ = _run("v2", bound="TTRRP", rough=0.0)
    for k, (a, b) in enumerate(zip(o1, o2)):
        np.testing.assert_allclose(
            np.asarray(a.T_sv), np.asarray(b.T_sv), rtol=1e-4,
            err_msg=f"T_sv step {k}")
        np.testing.assert_allclose(
            np.asarray(a.Np_sv), np.asarray(b.Np_sv), atol=3,
            err_msg=f"Np_sv step {k}")
        assert int(b.lost) == 0


def test_slim_axis_cache_no_cross_material_alias():
    """Two different (btab, mat) pairs must never share a slim-eligibility
    verdict: the cache lives on the btab instance (a module dict keyed on
    id() aliased after GC — ADVICE r3)."""
    from nanokappa_tpu.sim.boundary_tables import slim_mirror_axis

    mat_a, dom, geo, btab_a, _rt, _pp, _st = _build(bound="TTRRP", rough=0.0)
    # build a second, distinct material/btab pair for the same domain
    mat_b = synthetic_material(mesh=(5, 5, 5))
    btab_b = build_boundary_tables(mat_b, dom)
    ax_a = slim_mirror_axis(geo, btab_a, mat_a)
    ax_b = slim_mirror_axis(geo, btab_b, mat_b)
    # both verdicts computed independently and stashed per-instance
    assert getattr(btab_a, "_slim_axis") is not getattr(btab_b, "_slim_axis")
    # verdicts are stable on re-query (cache hit) and not cross-wired
    assert slim_mirror_axis(geo, btab_a, mat_a) == ax_a
    assert slim_mirror_axis(geo, btab_b, mat_b) == ax_b


def test_v2_runner_conserves_population():
    """The build_step runner (scan harness: entry compaction + tail-pressure
    compaction cadence) must keep the population balanced from a FRESH
    init_state, whose particles are spread across the whole pool and whose
    free_count is a free-list depth, not a tail pointer. A round-3 bug made
    the first sub-block skip compaction, so injections overwrote live lanes
    at a bogus tail and the population decayed by the absorption rate."""
    from nanokappa_tpu.sim.step import build_step

    mat, dom, geo, btab, rtab, params, state = _build(
        bound="TTRRP", rough=0.0, impl="v2"
    )
    run = build_step(geo, mat.device_tables(), btab, rtab, params, n_inner=5)
    n0 = int(np.asarray(state.alive).sum())
    for _ in range(4):
        state, out = run(state)
    assert int(out.lost) == 0
    assert abs(int(out.N_p) - n0) < 0.05 * n0, (int(out.N_p), n0)


def test_parameterized_tables_runner(monkeypatch):
    """Force the big-tables path of build_step (tables ride as jit
    PARAMETERS instead of baked constants — the remote-compile tunnel
    rejects GB-scale constants, e.g. a 96-normal boundary table): results
    must match the plain constant-baking path exactly, including the
    mirror/slim build logic that runs host-side reads during tracing."""
    import nanokappa_tpu.sim.step as stp
    from nanokappa_tpu.sim.step import build_step

    mat, dom, geo, btab, rtab, params, state = _build(
        bound="TTRRP", rough=0.0, impl="v2"
    )
    run_const = build_step(
        geo, mat.device_tables(), btab, rtab, params, n_inner=3
    )
    s1, out1 = run_const(state)

    monkeypatch.setattr(stp, "_BIG_CONST_BYTES", 0)
    state2 = _build(bound="TTRRP", rough=0.0, impl="v2")[-1]
    run_param = build_step(
        geo, mat.device_tables(), btab, rtab, params, n_inner=3
    )
    s2, out2 = run_param(state2)
    np.testing.assert_array_equal(
        np.asarray(out1.T_sv), np.asarray(out2.T_sv)
    )
    np.testing.assert_array_equal(
        np.asarray(out1.Np_sv), np.asarray(out2.Np_sv)
    )
    assert int(out2.lost) == 0


@pytest.mark.parametrize(
    "subvols",
    [
        ("grid", 2, 2, 2),
        ("voronoi", 6),
        # beyond the 32-centre unroll budget: the fori_loop SMEM-table
        # argmin + chunked one-hot binning path (ops/megastep.py)
        ("grid", 4, 4, 5),
    ],
)
def test_v2_nearest_subvolumes_match_v1(subvols):
    """Box domains with grid/voronoi subvolumes now ride the fused step
    (kernel nearest-centre argmin: unrolled static table up to 32 centres,
    SMEM fori_loop beyond). On the deterministic TTP config the v1 and v2
    trajectories coincide particle-for-particle; subvolume observables must
    agree to f32 noise (cell-border ulp ties may bin a particle
    differently)."""
    mat = synthetic_material(mesh=(4, 4, 4))
    dom = build_domain(
        geometry="box", dimensions=(2e3, 1e3, 1e3), subvolumes=subvols,
        bound_pos=("relative", -0.1, 0.5, 0.5, 1.1, 0.5, 0.5),
        bound_cond=("T", "T", "P"), bound_values=(302.0, 298.0),
        connect_pos=("relative", 0.5, -0.1, 0.5, 0.5, 1.1, 0.5,
                     0.5, 0.5, -0.1, 0.5, 0.5, 1.1),
    )
    n_p, rho = particle_count(("total", 3000), mat, dom)
    geo = build_device_geometry(dom)
    btab = build_boundary_tables(mat, dom)
    rtab = build_reservoir_tables(mat, dom, 1.0, rho)
    outs = {}
    for impl in ("v1", "v2"):
        params = SimParams(
            dt=1.0, n_cap=4096, inj_cap=512, temp_interp="nearest",
            particle_density=rho, n_active_modes=mat.n_active_modes,
            t_reference=300.0, step_impl=impl,
        )
        from nanokappa_tpu.sim.fused import v2_eligible

        assert v2_eligible(geo, params) == (impl == "v2")
        state = init_state(
            mat, dom, geo, params, n_p, temp_dist="linear", seed=3, btab=btab
        )
        step = jax.jit(make_step(geo, mat.device_tables(), btab, rtab, params))
        o = []
        for _ in range(4):
            state, out = step(state)
            o.append(out)
        outs[impl] = o
    for k, (a, b) in enumerate(zip(outs["v1"], outs["v2"])):
        np.testing.assert_allclose(
            np.asarray(a.T_sv), np.asarray(b.T_sv), rtol=1e-4,
            err_msg=f"T_sv step {k} {subvols}")
        np.testing.assert_allclose(
            np.asarray(a.Np_sv), np.asarray(b.Np_sv), atol=3,
            err_msg=f"Np_sv step {k} {subvols}")
        assert int(b.lost) == 0


def _build_cylinder(impl, n_sides=8):
    """Nanowire: cylinder with T caps and eta = 0 rough side walls. The
    synthetic k-grid has no specular partners across the octagon wall
    normals (mirror-map coverage 0), so the mirror fast path must stay OFF
    (sim/fused.py mirror_eligible coverage gate) and the fused step runs
    the in-kernel TRIANGLE ray cast + index-export path."""
    mat = synthetic_material(mesh=(4, 4, 4))
    dom = build_domain(
        geometry="cylinder", dimensions=(2e3, 500.0, n_sides),
        subvolumes=("slice", 5, 2),
        bound_pos=("relative", 0.5, 0.5, -0.1, 0.5, 0.5, 1.1),
        bound_cond=("T", "T", "R"), bound_values=(302.0, 298.0, 0.0),
    )
    n_p, rho = particle_count(("total", 3000), mat, dom)
    params = SimParams(
        dt=1.0, n_cap=4096, inj_cap=512, temp_interp="nearest",
        particle_density=rho, n_active_modes=mat.n_active_modes,
        t_reference=300.0, step_impl=impl,
    )
    geo = build_device_geometry(dom)
    btab = build_boundary_tables(mat, dom)
    rtab = build_reservoir_tables(mat, dom, 1.0, rho)
    state = init_state(
        mat, dom, geo, params, n_p, temp_dist="linear", seed=3, btab=btab
    )
    return mat, dom, geo, btab, rtab, params, state


def test_v2_cylinder_matches_v1():
    """Non-box geometry on the fused step: the in-kernel unrolled
    Möller–Trumbore cast (ops/megastep.py _tri_raycast) against v1's
    general raycast. All cylinder-wall reflections are DIFFUSE here (no
    specular partners on the synthetic grid), so per-lane RNG differs
    between the paths; compare population/ledger statistics, not
    trajectories. Guards the denormal-flush regression that absorbed every
    exported event row at reservoir 0 (n_leaving[0] read 65 vs v1's 6)."""
    from nanokappa_tpu.sim.fused import mirror_eligible, v2_eligible

    mat, dom, geo, btab, rtab, params, state = _build_cylinder("v2")
    assert not geo.is_box
    assert v2_eligible(geo, params)
    assert not mirror_eligible(geo, btab, params, mat.device_tables())

    res = {}
    for impl in ("v1", "v2"):
        mat, dom, geo, btab, rtab, params, state = _build_cylinder(impl)
        step = jax.jit(
            make_step(geo, mat.device_tables(), btab, rtab, params)
        )
        o = []
        for _ in range(4):
            state, out = step(state)
            o.append(out)
        res[impl] = o
    for k, (a, b) in enumerate(zip(res["v1"], res["v2"])):
        np.testing.assert_allclose(
            np.asarray(a.T_sv), np.asarray(b.T_sv), atol=0.05,
            err_msg=f"T_sv step {k}")
        # the first step has identical lane states in both paths: the
        # absorption ledger must agree exactly
        if k == 0:
            np.testing.assert_array_equal(
                np.asarray(a.n_leaving), np.asarray(b.n_leaving))
        assert int(b.lost) == 0 and int(b.frozen) == 0
        assert abs(int(a.N_p) - int(b.N_p)) < 30
    # population balanced (injection replaces absorption; the pre-fix
    # mirror+denormal path drained ~60 particles/step)
    assert abs(int(res["v2"][-1].N_p) - 3000) < 100


def test_v2_large_mesh_matches_v1():
    """Meshes beyond the in-kernel cast budget (here a 96-side cylinder =
    384 triangles > TRI_KERNEL_MAX) ride the fused step with kernel_cast
    OFF: injections are pre-cast at buffer width (freshness sign-encoded in
    C_TCOLL) and EVERY boundary event exports to the narrow machinery,
    whose raycast dispatch covers large meshes (Pallas on TPU, XLA scan on
    CPU). Diffuse reflections draw per-lane RNG, so compare statistics;
    step 0's absorption ledger is deterministic and must agree exactly."""
    from nanokappa_tpu.sim.fused import (
        TRI_KERNEL_MAX, kernel_cast_ok, mirror_eligible, v2_eligible,
    )

    mat, dom, geo, btab, rtab, params, state = _build_cylinder(
        "v2", n_sides=96
    )
    assert geo.tri_origin.shape[0] > TRI_KERNEL_MAX
    assert not kernel_cast_ok(geo)
    assert v2_eligible(geo, params)
    assert not mirror_eligible(geo, btab, params, mat.device_tables())

    res = {}
    for impl in ("v1", "v2"):
        mat, dom, geo, btab, rtab, params, state = _build_cylinder(
            impl, n_sides=96
        )
        step = jax.jit(
            make_step(geo, mat.device_tables(), btab, rtab, params)
        )
        o = []
        for _ in range(4):
            state, out = step(state)
            o.append(out)
        res[impl] = o
    for k, (a, b) in enumerate(zip(res["v1"], res["v2"])):
        np.testing.assert_allclose(
            np.asarray(a.T_sv), np.asarray(b.T_sv), atol=0.05,
            err_msg=f"T_sv step {k}")
        if k == 0:
            np.testing.assert_array_equal(
                np.asarray(a.n_leaving), np.asarray(b.n_leaving))
        assert int(b.lost) == 0
        assert abs(int(a.N_p) - int(b.N_p)) < 30
    assert abs(int(res["v2"][-1].N_p) - 3000) < 100


def test_v2_imported_stl_runs(tmp_path):
    """Full imported-STL pipeline (SURVEY validation gate 4): tessellate a
    144-side cylinder, export it with the framework's own STL writer, load
    it back through build_domain(<path>.stl), and run the FUSED step — the
    576-triangle mesh exceeds TRI_KERNEL_MAX, so this drives the
    kernel_cast-off path + Pallas large-mesh ray cast end to end from a
    file on disk, exactly how a reference user imports geometry."""
    from nanokappa_tpu.geometry.primitives import make_primitive
    from nanokappa_tpu.geometry.stl import save_stl
    from nanokappa_tpu.sim.fused import (
        TRI_KERNEL_MAX, kernel_cast_ok, v2_eligible,
    )
    from nanokappa_tpu.sim.step import build_step

    mesh = make_primitive("cylinder", (2e3, 500.0, 144))
    path = str(tmp_path / "wire.stl")
    save_stl(mesh, path)

    mat = synthetic_material(mesh=(4, 4, 4))
    dom = build_domain(
        geometry=path,
        subvolumes=("slice", 5, 2),
        bound_pos=("relative", 0.5, 0.5, -0.1, 0.5, 0.5, 1.1),
        bound_cond=("T", "T", "R"), bound_values=(302.0, 298.0, 2.0),
        connect_pos=("relative",),
    )
    n_p, rho = particle_count(("total", 2000), mat, dom)
    params = SimParams(
        dt=1.0, n_cap=4096, inj_cap=512, temp_interp="nearest",
        particle_density=rho, n_active_modes=mat.n_active_modes,
        t_reference=300.0, step_impl="v2",
    )
    geo = build_device_geometry(dom)
    assert geo.tri_origin.shape[0] > TRI_KERNEL_MAX
    assert not kernel_cast_ok(geo) and v2_eligible(geo, params)
    btab = build_boundary_tables(mat, dom)
    rtab = build_reservoir_tables(mat, dom, 1.0, rho)
    state = init_state(
        mat, dom, geo, params, n_p, temp_dist="linear", seed=5, btab=btab
    )
    run = build_step(geo, mat.device_tables(), btab, rtab, params, n_inner=5)
    for _ in range(3):
        state, out = run(state)
    T = np.asarray(out.T_sv)
    assert np.all(T > 290) and np.all(T < 310)
    assert T[0] > T[-1]  # hot cap -> cold cap gradient forming
    assert int(out.lost) == 0
    assert abs(int(out.N_p) - n_p) < 0.1 * n_p


def test_megastep_row_export_bit_exact():
    """Kernel-level guard for the exported-ROW extraction: every exported
    row must be a BIT-EXACT copy of its source pool lane. The extraction
    mask-reduce must run in the int domain — the bitcast facet/mode/onf
    columns of small ids are f32 denormals that a float add flushes to
    zero (ops/megastep.py step 5.9)."""
    import jax.numpy as jnp
    from nanokappa_tpu.ops.compact_pool import compact_pool
    from nanokappa_tpu.ops.megastep import drift_megastep, tile_width
    from nanokappa_tpu.sim.state import C_ALIVE, C_REM

    mat, dom, geo, btab, rtab, params, state = _build_cylinder("v2")
    N = state.packed.shape[0]
    L = tile_width(N) // 8
    pool3 = jnp.concatenate(
        [
            state.packed.T.reshape(16, N // L, L),
            state.mirror.T.reshape(8, N // L, L),
        ],
        axis=0,
    )
    pool3, _, _ = compact_pool(pool3, None, interpret=True)
    EVT_CAP = 2048
    out = drift_megastep(
        pool3, state.T_sv, jnp.asarray(0), geo, params, ecap=EVT_CAP,
        interpret=True, export_rows=True, w_exp=256, tau_bounds=(0.1, 3e38),
    )
    pool3_d, evt_buf, ecnt, _acnt, _starts, kept, ledger, _kbins = out
    k = int(np.asarray(kept).sum())
    assert k > 20, "config must export a healthy batch of event rows"
    assert int(np.asarray(ecnt).sum()) == k  # none frozen
    rows = np.asarray(evt_buf)[:16, :EVT_CAP].T[:k]
    # source lanes: alive in the input pool, dead in the output pool, with
    # remaining time (absorbed lanes also die but consume their dt)
    pin = np.asarray(pool3.reshape(24, N))
    pout = np.asarray(pool3_d.reshape(24, N))
    exp_lanes = np.nonzero(
        (pin[C_ALIVE] > 0.5) & (pout[C_ALIVE] < 0.5)
        & (pout[C_REM] > 1e-5)
    )[0]
    assert len(exp_lanes) == k
    # the exported rows are verbatim copies of the written tile (the alive
    # column reads 0 — sim/fused.py's vbuf restores liveness downstream)
    src = pout[:16, exp_lanes].T.copy()
    a = np.sort(rows.view(np.int32), axis=0)
    b = np.sort(src.view(np.int32), axis=0)
    np.testing.assert_array_equal(a, b)


def test_v2_sharded_triangle_geometry():
    """Non-box fused step under shard_map on the virtual CPU mesh: the
    in-kernel triangle cast + index-export path must compose with psums
    and per-shard injection (the box sharded test cannot catch tri-cast
    table handling inside the mapped kernel)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    from nanokappa_tpu.parallel import (
        build_sharded_step, make_particle_mesh, shard_state,
    )

    mat, dom, geo, btab, rtab, params, state = _build_cylinder("v2")
    import dataclasses

    params = dataclasses.replace(params, n_shards=2)
    state = init_state(
        mat, dom, geo, params, 3000, temp_dist="linear", seed=3, btab=btab
    )
    mesh = make_particle_mesh(2)
    state = shard_state(state, mesh)
    run = build_sharded_step(
        geo, mat.device_tables(), btab, rtab, params, mesh, n_inner=2
    )
    state, out = run(state)
    T = np.asarray(out.T_sv)
    assert np.all(T > 290) and np.all(T < 310)
    assert int(out.lost) == 0
    assert abs(int(out.N_p) - 3000) < 200
