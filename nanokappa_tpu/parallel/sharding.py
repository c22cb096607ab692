"""Multi-chip scale-out: particle-axis data parallelism over a device mesh.

The reference is a single serial process (SURVEY.md section 2). The scaling
design here follows the algorithm's communication structure:

  * particle arrays shard over the "p" mesh axis — drift, cascade, scattering
    and ray casting are embarrassingly parallel;
  * phonon mode tables and geometry replicate (a few MB);
  * per-subvolume energy/flux/count reductions and reservoir ledgers are the
    only cross-chip traffic: (SV,)- and (R,)-shaped psums over ICI per step;
  * each shard owns an independent slice of the reservoir process
    (rate/n_shards, own accumulator, decorrelated RNG) and its own dead-slot
    pool — particles never migrate between shards.

An optional leading "r" (replica/ensemble) axis runs independent Monte Carlo
replicas for variance reduction; replica results average over DCN-friendly
collectives only at readout.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nanokappa_tpu.sim.state import SimState
from nanokappa_tpu.sim.step import make_step


def make_particle_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("p",))


def state_specs(state: SimState) -> SimState:
    """PartitionSpec pytree for a SimState: particle-axis arrays shard on "p",
    subvolume/ledger arrays replicate, per-shard reservoir accumulators shard
    on their leading axis."""
    n_cap = state.pos.shape[0]

    def spec_of(path, leaf):
        name = path[0].name
        if name == "res_counter":
            return P("p", None, None)
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == n_cap:
            return P("p") if leaf.ndim == 1 else P("p", *([None] * (leaf.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec_of, state)


def shard_state(state: SimState, mesh: Mesh) -> SimState:
    """Place a host-built state onto the mesh with the canonical shardings.

    The state must have been built with params.n_shards == mesh size (so the
    pool capacity and the reservoir accumulator leading axis divide evenly).
    """
    specs = state_specs(state)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )


def build_sharded_step(
    geo,
    mat,
    btab,
    rtab,
    params,
    mesh: Mesh,
    n_inner: int = 1,
):
    """Jitted multi-chip multi-step: shard_map over the particle axis.

    Tables/geometry are closed over (replicated); only the state travels
    sharded. Returns run(state) -> (state, last StepOutputs)."""
    step = make_step(geo, mat, btab, rtab, params, axis_name="p")

    def run_local(state: SimState):
        from nanokappa_tpu.sim.step import refresh_tau

        state = refresh_tau(state, geo, mat, params)
        state, outs = jax.lax.scan(step, state, length=n_inner)
        last = jax.tree.map(lambda x: x[-1], outs)
        return state, last

    def specs_for(tree, sharded_cap):
        def spec_of(path, leaf):
            name = path[0].name if path else ""
            if name == "res_counter":
                return P("p", None, None)
            if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == sharded_cap:
                return (
                    P("p") if leaf.ndim == 1 else P("p", *([None] * (leaf.ndim - 1)))
                )
            return P()

        return jax.tree_util.tree_map_with_path(spec_of, tree)

    def make(state: SimState):
        from nanokappa_tpu.sim.step import StepOutputs

        in_specs = specs_for(state, state.pos.shape[0])
        # outputs: state keeps the same specs; StepOutputs are replicated
        # (cannot eval_shape here: axis_index is only bound inside shard_map)
        out_specs = (
            in_specs,
            StepOutputs(**{f: P() for f in StepOutputs.__dataclass_fields__}),
        )
        return jax.jit(
            jax.shard_map(
                run_local, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs
            )
        )

    # build lazily on first call so specs match the concrete state
    cache = {}

    def run(state: SimState):
        if "fn" not in cache:
            cache["fn"] = make(state)
        return cache["fn"](state)

    return run
