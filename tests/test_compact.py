"""Pallas stream-compaction kernel vs NumPy (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nanokappa_tpu.ops.compact import compact_indices_pallas


@pytest.mark.parametrize("n,p", [(40960, 0.06), (40960, 0.5), (16384, 0.0),
                                 (16384, 1.0), (20000, 0.01)])
def test_compact_matches_numpy(n, p, rng):
    mask = rng.random(n) < p
    cap = 8192
    pidx, nv = compact_indices_pallas(jnp.asarray(mask), cap, interpret=True)
    pidx, nv = np.asarray(pidx), int(nv)
    want = np.nonzero(mask)[0]
    assert nv == min(len(want), cap)
    np.testing.assert_array_equal(pidx[:nv], want[:nv])
    assert np.all(pidx[nv:] == n)
