"""k (wavevector) scattering model on the in-kernel mirror fast path.

Round-4 VERDICT item 5: mirror_eligible previously hard-rejected
scat_model='k' even though the k-model correspondence table
(classes/Population.py:1058-1239) is just as static as the velocity one.
The gate now treats both models equally; the k model's degenerate-branch
energy split (classes/Population.py:1017-1040) is pre-drawn at cache-FILL
time (sim/fused.py kmodel_degen_split) so the kernel's register swap stays
draw-free.

Real eligibility still depends on the material: a k-mirror map must cover
>= 95% of wall-incident modes (the synthetic test grids cover ~27%, so
they legitimately fall back to the exact narrow machinery — asserted
below together with v1/v2 parity there). The gate/plumbing itself is
pinned with a crafted full-coverage involution table.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanokappa_tpu.material import synthetic_material
from nanokappa_tpu.sim.boundary_tables import build_boundary_tables
from nanokappa_tpu.sim.fused import kmodel_degen_split, mirror_eligible

from tests.test_sim_box import film_setup


@pytest.fixture(scope="module")
def kfilm(small_material):
    mat = small_material
    dom, geo, btab_v, rtab, params, state = film_setup(
        mat, n_particles=16000
    )
    btab_k = build_boundary_tables(mat, dom, "k")
    params_k = dataclasses.replace(params, scat_model="k")
    return mat, dom, geo, btab_k, rtab, params_k


def test_kmodel_gate_honest_on_sparse_coverage(kfilm):
    """On the synthetic grid the k-correspondence is sparse, so the
    coverage gate must keep the mirror path OFF (a sparse map would
    freeze most reflections against the w_exp export budget)."""
    mat, dom, geo, btab_k, rtab, params_k = kfilm
    corr = btab_k._host["corr"]
    cov = float((corr >= 0).mean())
    assert cov < 0.95  # the premise: sparse map on this grid
    assert not mirror_eligible(geo, btab_k, params_k, mat.device_tables())


def test_kmodel_gate_accepts_full_coverage_involution(kfilm):
    """With a (crafted) full-coverage involutive correspondence whose
    mapped properties satisfy the swap invariants, the k model passes the
    gate exactly like the velocity model — the scat_model hard-reject is
    gone."""
    mat, dom, geo, btab_k, rtab, params_k = kfilm
    M = mat.n_modes
    # identity is the simplest involution with bitwise-equal properties;
    # specularity 1 everywhere a partner exists (eta = 0 walls)
    ident = np.arange(M, dtype=np.int32)
    spec = np.ones_like(btab_k._host["specularity"])
    corr = np.tile(ident, (btab_k.n_rows, 1)).astype(np.int32)
    crafted = dataclasses.replace(
        btab_k,
        spec2=jnp.asarray(
            np.stack(
                [spec, corr.view(np.float32)], axis=-1
            )
        ),
    )
    object.__setattr__(crafted, "_host", {
        **btab_k._host, "specularity": spec, "corr": corr,
    })
    assert mirror_eligible(geo, crafted, params_k, mat.device_tables())


def test_kmodel_degen_split_statistics(kfilm):
    """The pre-drawn degenerate split is 50/50 per mapped mode and only
    fires where a partner branch exists (reference
    classes/Population.py:1017-1040 semantics)."""
    mat, dom, geo, btab_k, rtab, params_k = kfilm
    dp = np.asarray(btab_k.degen_partner)
    has = np.nonzero(dp >= 0)[0]
    if len(has) == 0:
        pytest.skip("no degeneracies in this table")
    corr = jnp.asarray(np.tile(has, 64).astype(np.int32))
    out = np.asarray(
        kmodel_degen_split(btab_k, corr, jax.random.PRNGKey(7))
    )
    swapped = out != np.asarray(corr)
    # swapped values must be the partner of the original
    np.testing.assert_array_equal(
        out[swapped], dp[np.asarray(corr)[swapped]]
    )
    frac = swapped.mean()
    assert 0.45 < frac < 0.55, frac
    # no partner -> never swapped
    none = np.nonzero(dp < 0)[0]
    if len(none):
        corr2 = jnp.asarray(np.tile(none, 16).astype(np.int32))
        out2 = np.asarray(
            kmodel_degen_split(btab_k, corr2, jax.random.PRNGKey(8))
        )
        np.testing.assert_array_equal(out2, np.asarray(corr2))


def test_kmodel_v1_v2_parity(kfilm):
    """k-model film: the fused v2 step (narrow machinery on this sparse
    table) matches the v1 XLA step within Monte Carlo noise."""
    from nanokappa_tpu.sim.state import init_state, round_pool_cap
    from nanokappa_tpu.sim.step import build_step

    mat, dom, geo, btab_k, rtab, params_k = kfilm
    dmat = mat.device_tables()
    prof = {}
    for impl, seed in (("v1", 3), ("v2", 4)):
        p = dataclasses.replace(
            params_k, step_impl=impl, n_cap=round_pool_cap(26000)
        )
        s = init_state(
            mat, dom, geo, p, 16000, temp_dist="linear", btab=btab_k,
            seed=seed,
        )
        run = build_step(geo, dmat, btab_k, rtab, p, n_inner=10)
        Ts = []
        for i in range(8):
            s, out = run(s)
            if i >= 3:
                Ts.append(np.asarray(out.T_sv))
        prof[impl] = np.mean(Ts, axis=0)
        assert int(np.asarray(out.lost)) == 0
    assert np.abs(prof["v1"] - prof["v2"]).max() < 0.35, prof
