"""Device Bose-Einstein occupation math, formulated for float32 stability.

Particle occupations are stored as deviations from a fixed reference
temperature, ``dev = n - n0(T_ref, omega_m)``. Absolute occupations at 300 K
are O(10^2) for soft modes while physically meaningful deviations are tiny;
storing the deviation and evaluating occupation *differences* analytically
with expm1 keeps everything well-conditioned in f32:

    n0(T) - n0(T0) = (expm1(x0) - expm1(x)) / (expm1(x) * expm1(x0)),
    x = hbar*omega / (kB*T).

This replaces the reference's float64 absolute occupations
(classes/Phonon.py:338-345, classes/Population.py:704-713).
"""

from __future__ import annotations

import jax.numpy as jnp

from nanokappa_tpu.constants import HBAR, KB

_X_MAX = 80.0  # exp overflow guard; expm1(80) ~ 5e34 within f32 range? no ->
#                use where() masking so inactive branches never overflow.


def _expm1_x(T, omega):
    """expm1(hbar*omega / kB T) with masking for T<=0 / omega<=0."""
    ok = (T > 0) & (omega > 0)
    x = jnp.where(ok, omega * HBAR / (jnp.where(ok, T, 1.0) * KB), 1.0)
    x = jnp.minimum(x, _X_MAX)
    return jnp.expm1(x), ok


def occupation_delta_T(T, T_ref, omega):
    """g = n0(T, omega) - n0(T_ref, omega), elementwise, f32-stable."""
    eT, okT = _expm1_x(T, omega)
    eR, okR = _expm1_x(T_ref, omega)
    nT = jnp.where(okT, 1.0 / eT, 0.0)
    nR = jnp.where(okR, 1.0 / eR, 0.0)
    both = okT & okR
    g = jnp.where(both, (eR - eT) / (eT * eR), nT - nR)
    return g


def occupation_delta_omega(T_ref, omega_a, omega_b):
    """n0(T_ref, omega_a) - n0(T_ref, omega_b), f32-stable.

    Used for specular reflections, which conserve the absolute occupation
    while the mode (and its reference occupation) changes
    (classes/Population.py:941-971 keeps n unchanged)."""
    eA, okA = _expm1_x(T_ref, omega_a)
    eB, okB = _expm1_x(T_ref, omega_b)
    nA = jnp.where(okA, 1.0 / eA, 0.0)
    nB = jnp.where(okB, 1.0 / eB, 0.0)
    both = okA & okB
    return jnp.where(both, (eB - eA) / (eA * eB), nA - nB)
