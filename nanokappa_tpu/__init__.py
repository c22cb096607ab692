"""nanokappa_tpu — TPU-native phonon Monte Carlo BTE solver.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
brunohs1993/Nanokappa (Silva et al., Comput. Phys. Commun. 294 (2024) 108954):
a Monte Carlo solver for the phonon Boltzmann transport equation under the
relaxation-time approximation, tracking energy-deviation particles through
drift, boundary interaction (isothermal reservoirs, periodic translation,
rough-wall specular/diffuse reflection) and RTA scattering until per-subvolume
temperature / heat flux / thermal conductivity converge.

Unlike the reference (serial NumPy object soup), the simulation state here is
a single immutable pytree of fixed-shape device arrays and the whole timestep
is one fused XLA program, sharded over the particle axis across TPU chips.
"""

from nanokappa_tpu import constants  # noqa: F401

__version__ = "0.1.0"
