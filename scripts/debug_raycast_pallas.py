"""On-chip A/B diagnosis of ops/raycast_pallas.py vs the XLA broadcast path.

Run with NK_ONCHIP=1 on a real chip (interpret mode still executes its jnp
ops on the TPU backend there — which is exactly what caught the two
hardware-only failure modes of round 4: denormal facet-id flush in the f32
output tile, and the default bf16-pass f32 matmul breaking barycentric
tolerances; see docs/ONCHIP_EQUIVALENCE.md).
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from tests.test_raycast_large import _wire_geo
from nanokappa_tpu.ops import raycast as rc
from nanokappa_tpu.ops.raycast_pallas import (
    _prep, pallas_eligible, raycast_pallas,
)

dom, geo = _wire_geo(96)
assert pallas_eligible(geo)
bbox, tab, nc = _prep(geo)
print("nc =", nc, "tab", tab.shape, "bbox", bbox.shape)

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
t_hw, f_hw = raycast_pallas(geo, pos32, vel32, excl)
t_in, f_in = raycast_pallas(geo, pos32, vel32, excl, interpret=True)

t_ref, f_ref = np.asarray(t_ref), np.asarray(f_ref)
t_hw, f_hw = np.asarray(t_hw), np.asarray(f_hw)
t_in, f_in = np.asarray(t_in), np.asarray(f_in)

print("ref finite:", np.isfinite(t_ref).mean())
print("hw  finite:", np.isfinite(t_hw).mean(), " facet=-1:", (f_hw < 0).mean())
print("hw vs ref facet agree:", (f_hw == f_ref).mean())
print("hw vs interpret facet agree:", (f_hw == f_in).mean())
mis = np.nonzero(f_hw != f_ref)[0]
print("hw vs REF mismatches:", len(mis), "of", n)
for i in mis[:10]:
    print(f"  lane {i}: hw (t={t_hw[i]:.5f}, f={f_hw[i]}) "
          f"ref (t={t_ref[i]:.5f}, f={f_ref[i]})")
