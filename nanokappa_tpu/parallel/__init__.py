from nanokappa_tpu.parallel.sharding import (
    make_particle_mesh,
    shard_state,
    build_sharded_step,
    state_specs,
)

__all__ = [
    "make_particle_mesh",
    "shard_state",
    "build_sharded_step",
    "state_specs",
]
