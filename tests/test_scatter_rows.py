"""Pallas sorted-row-scatter kernel vs NumPy (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nanokappa_tpu.ops.scatter_rows import scatter_rows_sorted


@pytest.mark.parametrize(
    "n,e,nval",
    [
        (40_000, 4096, 2000),  # multi-block, sentinel tail
        (16_384, 1024, 1024),  # exactly one block, no sentinels
        (20_000, 512, 0),  # no updates at all
        (50_000, 2048, 2048),  # dense cluster in one block
    ],
)
def test_scatter_rows_matches_numpy(n, e, nval, rng):
    C = 14
    base = rng.standard_normal((n, C)).astype(np.float32)
    rows = rng.standard_normal((e, C)).astype(np.float32)
    idx = np.full(e, n, np.int32)
    if nval:
        if nval == 2048 and n == 50_000:
            # clustered: consecutive indices inside one block
            idx_v = (20_000 + np.arange(nval)).astype(np.int32)
        else:
            idx_v = np.sort(
                rng.choice(n, nval, replace=False).astype(np.int32)
            )
        idx[:nval] = idx_v
    out = np.asarray(
        scatter_rows_sorted(
            jnp.asarray(base), jnp.asarray(rows), jnp.asarray(idx),
            interpret=True,
        )
    )
    ref = base.copy()
    if nval:
        ref[idx[:nval]] = rows[:nval]
    np.testing.assert_array_equal(out, ref)
