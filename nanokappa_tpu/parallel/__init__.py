from nanokappa_tpu.parallel.sharding import (
    make_particle_mesh,
    make_ensemble_mesh,
    shard_state,
    stack_ensemble_state,
    build_sharded_step,
    build_ensemble_step,
    state_specs,
)

__all__ = [
    "make_particle_mesh",
    "make_ensemble_mesh",
    "shard_state",
    "stack_ensemble_state",
    "build_sharded_step",
    "build_ensemble_step",
    "state_specs",
]
