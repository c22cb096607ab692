"""Real-TPU equivalence checks (skipped on CPU back ends).

The production step's Pallas kernels fall back to XLA formulations on CPU,
so CI never exercises the exact code that produces the benchmark number.
These tests run ONLY when a TPU backend is attached and assert the Pallas
and XLA paths produce identical results on identical inputs (they are exact
algorithms, not stochastic): stream compaction, the sorted row scatter, and
the fused drift/merge kernels against the v1 XLA step.

Run manually on the chip (they are excluded from the CPU suite by the
skip marker): PYTHONPATH=. python -m pytest tests/test_onchip.py -v
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs a real TPU backend"
)


def test_compact_pallas_matches_searchsorted():
    from nanokappa_tpu.ops.compact import compact_indices_pallas

    rng = np.random.default_rng(5)
    n, cap = 200_000, 1 << 14
    mask = jnp.asarray(rng.random(n) < 0.05)
    pidx, nv = compact_indices_pallas(mask, cap)
    csum = jnp.cumsum(mask.astype(jnp.int32))
    j = jnp.arange(cap, dtype=jnp.int32)
    ref = jnp.searchsorted(csum, j + 1, side="left").astype(jnp.int32)
    ref = jnp.where(j < jnp.minimum(csum[-1], cap), ref, n)
    assert int(nv) == int(jnp.minimum(csum[-1], cap))
    np.testing.assert_array_equal(np.asarray(pidx), np.asarray(ref))


def test_scatter_rows_pallas_matches_xla():
    from nanokappa_tpu.ops.scatter_rows import scatter_rows_sorted

    rng = np.random.default_rng(7)
    n, e, c = 150_000, 4096, 16
    base = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    rows = jnp.asarray(rng.standard_normal((e, c)), jnp.float32)
    idx = np.sort(rng.choice(n, size=e, replace=False)).astype(np.int32)
    idx[-5:] = n + np.arange(5)  # sentinel tail
    idx = jnp.asarray(np.sort(idx))
    out_p = scatter_rows_sorted(base, rows, idx)
    out_x = base.at[idx].set(
        rows, mode="drop", indices_are_sorted=True, unique_indices=True
    )
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_x))


def test_v2_step_matches_v1_on_chip():
    """One deterministic (reflection-free) config, stepped by both
    implementations ON THE CHIP: identical particle sets step for step."""
    from tests.test_fused import _run

    s1, o1, _ = _run("v1", n_steps=3)
    s2, o2, _ = _run("v2", n_steps=3)
    for k, (a, b) in enumerate(zip(o1, o2)):
        np.testing.assert_allclose(
            np.asarray(a.T_sv), np.asarray(b.T_sv), rtol=5e-6,
            err_msg=f"T_sv step {k}")
        np.testing.assert_array_equal(
            np.asarray(a.Np_sv), np.asarray(b.Np_sv))
        np.testing.assert_array_equal(
            np.asarray(a.n_leaving), np.asarray(b.n_leaving))


def test_v2_mirror_specular_on_chip():
    """The Mosaic-compiled specular fast path (mirror-cache register swap,
    ops/megastep.py step 4) vs the v1 XLA cascade on an eta = 0 film: the
    two resolve reflections in entirely different code, so agreement here
    validates the in-kernel swap + re-cast on real hardware."""
    from tests.test_fused import _run

    s1, o1, _ = _run("v1", bound="TTRRP", rough=0.0, n_steps=4)
    s2, o2, _ = _run("v2", bound="TTRRP", rough=0.0, n_steps=4)
    for k, (a, b) in enumerate(zip(o1, o2)):
        np.testing.assert_allclose(
            np.asarray(a.T_sv), np.asarray(b.T_sv), rtol=1e-4,
            err_msg=f"T_sv step {k}")
        np.testing.assert_allclose(
            np.asarray(a.Np_sv), np.asarray(b.Np_sv), atol=3)
        assert int(b.lost) == 0
    # specular walls seal the domain
    pos = np.asarray(s2.pos)[np.asarray(s2.alive)]
    assert pos[:, 1].min() >= -1e-3 and pos[:, 1].max() <= 1e3 + 1e-3


def test_pallas_raycast_large_mesh_on_chip():
    """Mosaic-compiled bbox-prefiltered large-mesh cast
    (ops/raycast_pallas.py) vs the XLA broadcast path on a 384-triangle
    cylinder: same data as the CPU interpret-mode parity test, but here the
    scalar-prefetch SMEM AABB table, the HBM chunk DMA and the skip
    control flow run on real hardware."""
    from tests.test_raycast_large import _wire_geo
    from nanokappa_tpu.ops import raycast as rc
    from nanokappa_tpu.ops.raycast_pallas import (
        pallas_eligible, raycast_pallas,
    )

    dom, geo = _wire_geo(96)
    assert pallas_eligible(geo)
    rng = np.random.default_rng(11)
    n = 50_000
    lo, hi = np.asarray(dom.mesh.bounds)
    pos = rng.uniform(lo + 1.0, hi - 1.0, (n, 3))
    r = np.linalg.norm(pos[:, :2] - dom.mesh.center_mass[:2], axis=1)
    pos[r > 350.0, :2] = dom.mesh.center_mass[:2]
    vel = rng.normal(0, 40.0, (n, 3))
    pos32, vel32 = jnp.asarray(pos, jnp.float32), jnp.asarray(vel, jnp.float32)
    excl = jnp.full(n, -1, jnp.int32)

    t_ref, f_ref = rc._raycast_broadcast(geo, pos32, vel32, excl)
    t_pal, f_pal = raycast_pallas(geo, pos32, vel32, excl)
    t_ref, f_ref = np.asarray(t_ref), np.asarray(f_ref)
    t_pal, f_pal = np.asarray(t_pal), np.asarray(f_pal)
    agree = f_ref == f_pal
    assert agree.mean() > 0.995
    both = np.isfinite(t_ref) & np.isfinite(t_pal) & agree
    np.testing.assert_allclose(t_pal[both], t_ref[both], rtol=2e-4, atol=1e-4)
    assert np.isfinite(t_pal).all()

    # recast-from-wall with the OWN facet excluded — the exact bit-hazard
    # that broke on hardware in round 4: facet ids carried as f32 BIT
    # patterns are denormals, and the input path flushed them to 0, so the
    # exclusion never matched and every reflected lane re-hit its own
    # facet at t = 0 (event backlog grew without bound). Facet ids now ride
    # as float VALUES; this leg pins the fix.
    pos_wall = pos32 + vel32 * jnp.asarray(t_ref)[:, None]
    nrm = np.asarray(geo.facet_normal)[f_ref]
    vr = np.asarray(vel32) - 2.0 * (np.asarray(vel32) * nrm).sum(1)[:, None] * nrm
    t2, f2 = raycast_pallas(
        geo, pos_wall, jnp.asarray(vr, jnp.float32), jnp.asarray(f_ref)
    )
    t2, f2 = np.asarray(t2), np.asarray(f2)
    self_hit = (f2 == f_ref) & (t2 < 1e-3)
    assert self_hit.mean() < 1e-3, self_hit.sum()


def test_v2_triangle_cast_on_chip():
    """Mosaic-compiled non-box fused step: cylinder nanowire with an
    unrolled in-kernel Möller–Trumbore cast (ops/megastep.py _tri_raycast).
    Wall reflections are diffuse (per-lane RNG differs between paths), so
    compare population statistics plus the first step's exact absorption
    ledger (lane states are identical until the first reflection)."""
    from tests.test_fused import _build_cylinder
    from nanokappa_tpu.sim.step import make_step

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
        if k == 0:
            np.testing.assert_array_equal(
                np.asarray(a.n_leaving), np.asarray(b.n_leaving))
        assert int(b.lost) == 0 and int(b.frozen) == 0
        assert abs(int(a.N_p) - int(b.N_p)) < 30


def test_dkern_diffuse_on_chip_matches_machinery():
    """Mosaic-compiled IN-KERNEL diffuse reflection (ops/megastep.py dkern
    branch: hardware PRNG Bernoulli against the in-register Ziman
    specularity + presample-window mode replacement) against the exact
    narrow-machinery path (NANOKAPPA_NO_DKERN=1): the two draw different
    random streams, so equivalence is STATISTICAL — time-averaged subvolume
    temperature and axial-flux profiles on a diffuse-wall nanowire must
    agree within Monte Carlo noise, with a quiet frozen/lost ledger on
    both sides."""
    import os

    from tests.test_diffuse_kernel import _wire_setup
    from nanokappa_tpu.sim.step import build_step

    profs = {}
    for mode in ("on", "off"):
        if mode == "off":
            os.environ["NANOKAPPA_NO_DKERN"] = "1"
        try:
            (mat, dom, geo, btab, rtab, params, state,
             n_p) = _wire_setup(n_particles=40000)
            run = build_step(
                geo, mat.device_tables(), btab, rtab, params,
                n_inner=10, n_outer=1,
            )
            Ts, Ps = [], []
            for i in range(12):
                state, out = run(state)
                if i >= 4:
                    Ts.append(np.asarray(out.T_sv))
                    Ps.append(np.asarray(out.phi_sv)[:, 2])
            profs[mode] = (np.mean(Ts, axis=0), np.mean(Ps, axis=0))
            assert int(np.asarray(state.frozen)) < n_p // 20
            assert int(np.asarray(state.lost).sum()) < n_p // 100
        finally:
            os.environ.pop("NANOKAPPA_NO_DKERN", None)
    T_on, P_on = profs["on"]
    T_off, P_off = profs["off"]
    assert np.max(np.abs(T_on - T_off)) < 0.5, (T_on, T_off)
    denom = max(np.abs(P_off).max(), 1e-3)
    assert np.max(np.abs(P_on - P_off)) / denom < 0.25, (P_on, P_off)
