from nanokappa_tpu.sim.state import SimState, SimParams, init_state
from nanokappa_tpu.sim.step import build_step, StepOutputs
from nanokappa_tpu.sim.boundary_tables import BoundaryTables, build_boundary_tables
from nanokappa_tpu.sim.reservoir import ReservoirTables, build_reservoir_tables

__all__ = [
    "SimState",
    "SimParams",
    "init_state",
    "build_step",
    "StepOutputs",
    "BoundaryTables",
    "build_boundary_tables",
    "ReservoirTables",
    "build_reservoir_tables",
]
