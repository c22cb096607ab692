"""Kernel-safe math for Pallas TPU (Mosaic has no expm1/isfinite/sign
primitives; these reimplement what the kernels need from sim/bose.py with
supported ops only).
"""

from __future__ import annotations

import jax.numpy as jnp

from nanokappa_tpu.constants import HBAR, KB

_X_MAX = 80.0


def expm1k(x):
    """f32-stable expm1 for x >= 0: 5-term Taylor below 0.25 (rel err <
    2e-5 at the crossover, exact limit for x -> 0), exp(x)-1 above (where
    cancellation is harmless)."""
    p = x * (
        1.0
        + x * (0.5 + x * (1.0 / 6.0 + x * (1.0 / 24.0 + x * (1.0 / 120.0))))
    )
    return jnp.where(x < 0.25, p, jnp.exp(jnp.minimum(x, _X_MAX)) - 1.0)


def occupation_delta_T_k(T, T_ref: float, omega):
    """g = n0(T, omega) - n0(T_ref, omega), the kernel twin of
    sim/bose.py:occupation_delta_T (same masking and difference algebra)."""
    okT = (T > 0) & (omega > 0)
    okR = omega > 0  # T_ref is a positive static float
    xT = jnp.where(okT, omega * HBAR / (jnp.where(okT, T, 1.0) * KB), 1.0)
    xT = jnp.minimum(xT, _X_MAX)
    xR = jnp.where(okR, omega * (HBAR / (T_ref * KB)), 1.0)
    xR = jnp.minimum(xR, _X_MAX)
    eT = expm1k(xT)
    eR = expm1k(xR)
    nT = jnp.where(okT, 1.0 / eT, 0.0)
    nR = jnp.where(okR, 1.0 / eR, 0.0)
    both = okT & okR
    return jnp.where(both, (eR - eT) / (eT * eR), nT - nR)


def occupation_delta_omega_k(T_ref: float, om_a, om_b):
    """n0(T_ref, om_a) - n0(T_ref, om_b), the kernel twin of
    sim/bose.py:occupation_delta_omega (specular reflections conserve the
    absolute occupation while the mode's reference occupation changes,
    classes/Population.py:941-971)."""
    okA = om_a > 0
    okB = om_b > 0
    c = HBAR / (T_ref * KB)
    xA = jnp.minimum(jnp.where(okA, om_a * c, 1.0), _X_MAX)
    xB = jnp.minimum(jnp.where(okB, om_b * c, 1.0), _X_MAX)
    eA = expm1k(xA)
    eB = expm1k(xB)
    nA = jnp.where(okA, 1.0 / eA, 0.0)
    nB = jnp.where(okB, 1.0 / eB, 0.0)
    both = okA & okB
    return jnp.where(both, (eB - eA) / (eA * eB), nA - nB)


def signk(x):
    return jnp.where(x >= 0.0, 1.0, -1.0)
