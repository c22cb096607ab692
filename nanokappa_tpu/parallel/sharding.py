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


def make_ensemble_mesh(
    n_replicas: int, n_particle_shards: int, devices=None
) -> Mesh:
    """2-D mesh: "r" = independent Monte Carlo replicas (own subvolume
    temperatures, error bars for free), "p" = particle shards within a
    replica (psum over ICI)."""
    devices = devices if devices is not None else jax.devices()
    n = n_replicas * n_particle_shards
    return Mesh(
        np.array(devices[:n]).reshape(n_replicas, n_particle_shards), ("r", "p")
    )


def state_specs(state: SimState) -> SimState:
    """PartitionSpec pytree for a SimState: particle-axis arrays shard on "p",
    subvolume/ledger arrays replicate, per-shard reservoir accumulators shard
    on their leading axis."""
    n_cap = state.pos.shape[0]

    def spec_of(path, leaf):
        name = path[0].name
        if name == "res_counter":
            return P("p", None, None)
        if name == "free_count":
            return P("p")
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
    n_outer: int = 1,
):
    """Jitted multi-chip multi-step: shard_map over the particle axis.

    Tables/geometry are closed over (replicated); only the state travels
    sharded. Returns run(state) -> (state, StepOutputs) — one datapoint when
    n_outer == 1, else n_outer stacked datapoints (device-batched
    convergence, one ledger reset per block)."""
    from nanokappa_tpu.sim.fused import v2_eligible
    from nanokappa_tpu.sim.step import make_v2_block_runner

    step = make_step(geo, mat, btab, rtab, params, axis_name="p")

    if v2_eligible(geo, params):
        # the fast v2 harness (3-D pool layout + compaction cadence) runs
        # PER SHARD inside shard_map — the per-step psums are the only
        # cross-chip traffic either way
        run_local = make_v2_block_runner(
            geo, mat, btab, params, step, n_inner, n_outer, vary=("p",)
        )
    else:
        def run_local(state: SimState):
            from nanokappa_tpu.sim.step import (
                maybe_refresh_tau, reset_ledgers,
            )

            def block(state, _=None):
                state = maybe_refresh_tau(state, geo, mat, params)
                state, outs = jax.lax.scan(step, state, length=n_inner)
                last = jax.tree.map(lambda x: x[-1], outs)
                return reset_ledgers(state), last

            if n_outer == 1:
                state = maybe_refresh_tau(state, geo, mat, params)
                state, outs = jax.lax.scan(step, state, length=n_inner)
                last = jax.tree.map(lambda x: x[-1], outs)
            else:
                state, last = jax.lax.scan(block, state, length=n_outer)
            return state, last

    def specs_for(tree, sharded_cap):
        def spec_of(path, leaf):
            name = path[0].name if path else ""
            if name == "res_counter":
                return P("p", None, None)
            if name == "free_count":
                return P("p")
            if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == sharded_cap:
                return (
                    P("p") if leaf.ndim == 1 else P("p", *([None] * (leaf.ndim - 1)))
                )
            return P()

        return jax.tree_util.tree_map_with_path(spec_of, tree)

    def make(state: SimState):
        import contextlib

        from nanokappa_tpu.sim.step import (
            StepOutputs, _BIG_CONST_BYTES, _array_fields, _swap_fields,
        )

        in_specs = specs_for(state, state.pos.shape[0])
        # outputs: state keeps the same specs; StepOutputs are replicated
        # (cannot eval_shape here: axis_index is only bound inside shard_map)
        out_specs = (
            in_specs,
            StepOutputs(**{f: P() for f in StepOutputs.__dataclass_fields__}),
        )
        # big-table configs (many-normal boundary tables) must pass the
        # tables as jit PARAMETERS — same constant-size escape as the
        # single-chip build_step (sim/step.py _parameterize_tables), with
        # replicated (P()) shard_map specs so every shard sees full tables
        table_objs = {"mat": mat, "btab": btab, "rtab": rtab}
        tabs = {n: _array_fields(o) for n, o in table_objs.items()}
        table_bytes = sum(
            v.nbytes for fields in tabs.values() for v in fields.values()
        )
        if table_bytes > _BIG_CONST_BYTES:
            tab_specs = jax.tree.map(lambda _: P(), tabs)

            def run_wrapped(st, tabs_in):
                with contextlib.ExitStack() as stack:
                    for n, obj in table_objs.items():
                        stack.enter_context(_swap_fields(obj, tabs_in[n]))
                    return run_local(st)

            fn = jax.jit(
                jax.shard_map(
                    run_wrapped, mesh=mesh, in_specs=(in_specs, tab_specs),
                    out_specs=out_specs, check_vma=False,
                )
            )
            return lambda st: fn(st, tabs)
        return jax.jit(
            jax.shard_map(
                run_local, mesh=mesh, in_specs=(in_specs,),
                out_specs=out_specs,
                # vma tracking cannot see through pallas_call kernel bodies
                # (iota-derived values inside the kernel carry no axes);
                # behavioural sharding correctness is asserted by
                # tests/test_sharding.py instead
                check_vma=False,
            )
        )

    # build lazily on first call so specs match the concrete state
    cache = {}

    def run(state: SimState):
        if "fn" not in cache:
            cache["fn"] = make(state)
        return cache["fn"](state)

    return run


def build_ensemble_step(
    geo,
    mat,
    btab,
    rtab,
    params,
    mesh: Mesh,
    n_inner: int = 1,
):
    """Jitted 2-axis multi-chip multi-step over a ("r", "p") mesh.

    Particle arrays shard jointly over (r, p); subvolume reductions psum over
    "p" only, so each replica row evolves an independent Monte Carlo chain
    (own T_sv). StepOutputs come back with a leading replica axis; averaging
    across it gives ensemble means and error bars.
    params.n_shards must equal the "p" axis size (per-replica rate split).
    """
    from nanokappa_tpu.sim.step import StepOutputs, maybe_refresh_tau

    step = make_step(
        geo, mat, btab, rtab, params, axis_name="p", vary_axes=("r", "p")
    )

    def run_local(state: SimState):
        # per-replica scalars arrive as (1,)/(1,3) views of the stacked axis
        state = dataclasses.replace(
            state, lost=state.lost.reshape((3,)),
            frozen=state.frozen.reshape(()),
            step=state.step.reshape(()),
        )
        state = maybe_refresh_tau(state, geo, mat, params)
        state, outs = jax.lax.scan(step, state, length=n_inner)
        last = jax.tree.map(lambda x: x[-1], outs)
        # give every output / scalar a leading replica axis of size 1 so
        # shard_map stacks the independent replica rows
        last = jax.tree.map(lambda x: jnp.asarray(x)[None], last)
        state = dataclasses.replace(
            state, lost=state.lost[None], frozen=state.frozen[None],
            step=state.step[None],
        )
        return state, last

    def specs_for(tree, sharded_cap):
        def spec_of(path, leaf):
            name = path[0].name if path else ""
            if name == "res_counter":
                return P(("r", "p"), None, None)
            if name == "free_count":
                return P(("r", "p"))
            if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == sharded_cap:
                return P(("r", "p"), *([None] * (leaf.ndim - 1)))
            # per-replica vectors / stacked scalars (T_sv, ledgers, key, ...)
            nd = max(getattr(leaf, "ndim", 1), 1)
            return P("r", *([None] * (nd - 1)))

        return jax.tree_util.tree_map_with_path(spec_of, tree)

    cache = {}

    def make(state: SimState):
        in_specs = specs_for(state, state.pos.shape[0])
        out_specs = (
            in_specs,
            StepOutputs(**{
                f: P("r") for f in StepOutputs.__dataclass_fields__
            }),
        )
        return jax.jit(
            jax.shard_map(
                run_local, mesh=mesh, in_specs=(in_specs,),
                out_specs=out_specs,
                # vma tracking cannot see through pallas_call kernel bodies
                # (iota-derived values inside the kernel carry no axes);
                # behavioural sharding correctness is asserted by
                # tests/test_sharding.py instead
                check_vma=False,
            )
        )

    def run(state: SimState):
        if "fn" not in cache:
            cache["fn"] = make(state)
        return cache["fn"](state)

    return run


def stack_ensemble_state(states: list[SimState], mesh: Mesh) -> SimState:
    """Concatenate per-replica host states along their leading axes (scalars
    are stacked) and place the result on the ("r","p") mesh. Build each
    replica's state with a distinct seed so the Monte Carlo chains are
    independent."""
    r = mesh.shape["r"]
    assert len(states) == r

    def cat(*leaves):
        ls = [jnp.asarray(l) for l in leaves]
        if ls[0].ndim == 0:
            return jnp.stack(ls)
        return jnp.concatenate(ls, axis=0)

    merged = jax.tree.map(lambda *ls: cat(*ls), *states)
    n_cap_total = merged.pos.shape[0]

    def spec_of(path, leaf):
        name = path[0].name
        if name == "res_counter":
            return P(("r", "p"), None, None)
        if name == "free_count":
            return P(("r", "p"))
        if leaf.ndim >= 1 and leaf.shape[0] == n_cap_total:
            return P(("r", "p"), *([None] * (leaf.ndim - 1)))
        return P("r", *([None] * (max(leaf.ndim, 1) - 1)))

    specs = jax.tree_util.tree_map_with_path(spec_of, merged)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), merged, specs
    )
