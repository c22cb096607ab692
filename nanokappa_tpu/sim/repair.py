"""Particle-escape self-healing (reference contains_check,
classes/Population.py:1712-1722).

Numerical round-off occasionally pushes a particle through a wall. Every 100
timesteps the reference resamples escaped particles uniformly inside the
volume and re-raycasts them. Here escaped particles draw a replacement
position from a pre-sampled pool of interior points (host-sampled once at
init) and their collision cache is marked stale so the next cascade recasts
them; mode/occupation are untouched, exactly like the reference.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from nanokappa_tpu.geometry.device import DeviceGeometry
from nanokappa_tpu.sim.state import SimState, STALE

_TOL = 1e-2  # angstrom; bounding-box escape tolerance (reference uses 1e-10
#              in f64; f32 positions at 2e4 A scale carry ~1e-3 A of noise)


def make_contains_check(geo: DeviceGeometry, interior_pool: jax.Array, dt: float = 1.0):
    """Returns check(state, key) -> (state, n_escaped)."""

    @jax.jit
    def check(state: SimState, key: jax.Array):
        from nanokappa_tpu.ops.raycast import raycast

        lo, hi = geo.bounds[0], geo.bounds[1]
        out = state.alive & (
            jnp.any(state.pos < lo[None] - _TOL, axis=1)
            | jnp.any(state.pos > hi[None] + _TOL, axis=1)
        )
        idx = jax.random.randint(
            key, (state.pos.shape[0],), 0, interior_pool.shape[0]
        )
        pos = jnp.where(out[:, None], interior_pool[idx], state.pos)
        # re-cast the repaired particles immediately (runs every 100 steps;
        # the per-step cascade no longer sweeps for stray STALE entries)
        t, f = raycast(
            geo, pos, state.vel, jnp.full(pos.shape[0], -1, jnp.int32)
        )
        t_coll = jnp.where(out, t / dt, state.t_coll)
        coll_facet = jnp.where(out, f, state.coll_facet)
        from nanokappa_tpu.sim.state import with_cols

        new_state = with_cols(
            state, pos=pos, t_coll=t_coll, coll_facet=coll_facet
        )
        return new_state, out.sum(dtype=jnp.int32)

    return check
