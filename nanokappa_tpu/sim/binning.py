"""Subvolume binning, energy/temperature refresh and heat flux.

Replaces the reference's per-subvolume Python loops and scipy interpolators
(classes/Population.py:671-747, classes/Geometry.py:1198-1213) with
segment sums and table lookups inside the fused step:

  * subvolume id: slice -> index arithmetic; general -> argmin distance,
    with the |x|^2 - 2 x.c + |c|^2 expansion so the cross term is a matmul
    that lands on the MXU,
  * subvolume energy: segment_sum of hbar*omega*dn with 'mean' or 'fixed'
    normalisation (classes/Population.py:704-728),
  * T = f(E): searchsorted + lerp over the monotone energy table
    (classes/Phonon.py:372-390),
  * particle temperatures: linear interpolation along the slice axis or
    nearest-centre (classes/Population.py:685-702).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nanokappa_tpu.constants import HBAR
from nanokappa_tpu.geometry.device import DeviceGeometry
from nanokappa_tpu.material.tables import MaterialTables
from nanokappa_tpu.sim.bose import occupation_delta_T


def subvol_id(geo: DeviceGeometry, pos: jax.Array) -> jax.Array:
    if geo.subvol_type == "slice":
        ax = geo.slice_axis
        lo = geo.bounds[0, ax]
        length = (geo.bounds[1, ax] - geo.bounds[0, ax]) / geo.n_subvols
        i = jnp.floor((pos[:, ax] - lo) / length).astype(jnp.int32)
        return jnp.clip(i, 0, geo.n_subvols - 1)
    c = geo.subvol_center  # (SV,3)
    # dist^2 = |x|^2 - 2 x.c + |c|^2 ; only the relative ordering matters
    cross = pos @ c.T  # (N,SV) matmul -> MXU
    d2 = (c**2).sum(axis=1)[None, :] - 2.0 * cross
    return jnp.argmin(d2, axis=1).astype(jnp.int32)


def interp_T_particles(
    geo: DeviceGeometry, T_sv: jax.Array, pos: jax.Array, sv: jax.Array, kind: str
) -> jax.Array:
    """Temperature at particle positions from subvolume temperatures
    (reference classes/Population.py:685-702: 'nearest', 'linear' for slices,
    RBF 'radial' otherwise)."""
    if kind == "linear" and geo.subvol_type == "slice":
        # slice centres are uniformly spaced -> index arithmetic, then lerp
        # with linear extrapolation at the ends (scipy interp1d
        # fill_value='extrapolate' equivalent)
        ax = geo.slice_axis
        c0 = geo.subvol_center[0, ax]
        dc = (geo.subvol_center[-1, ax] - c0) / (geo.n_subvols - 1)
        f = (pos[:, ax] - c0) / dc
        i = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, geo.n_subvols - 2)
        w = f - i
        return T_sv[i] * (1 - w) + T_sv[i + 1] * w
    if kind == "radial":
        return _rbf_interp(geo.subvol_center, T_sv, pos)
    # nearest
    return T_sv[sv]


def _rbf_interp(centers: jax.Array, values: jax.Array, x: jax.Array) -> jax.Array:
    """Cubic RBF interpolation (scipy RBFInterpolator kernel='cubic'
    equivalent, reference classes/Population.py:574-588): solve the small
    (SV+4, SV+4) augmented system on device, evaluate with one matmul."""
    n = centers.shape[0]
    d = jnp.linalg.norm(centers[:, None, :] - centers[None, :, :], axis=-1)
    K = d**3
    P = jnp.concatenate([jnp.ones((n, 1)), centers], axis=1)  # (n,4)
    A = jnp.block([[K, P], [P.T, jnp.zeros((4, 4))]])
    b = jnp.concatenate([values, jnp.zeros(4)])
    coef = jnp.linalg.solve(A, b)
    dx = jnp.linalg.norm(x[:, None, :] - centers[None, :, :], axis=-1)  # (N,SV)
    phi = dx**3
    return phi @ coef[:n] + coef[n] + x @ coef[n + 1 :]


def lookup_T_of_E(mat: MaterialTables, E: jax.Array) -> jax.Array:
    i = jnp.clip(jnp.searchsorted(mat.E_grid, E) - 1, 0, mat.E_grid.shape[0] - 2)
    w = (E - mat.E_grid[i]) / (mat.E_grid[i + 1] - mat.E_grid[i])
    w = jnp.clip(w, 0.0, 1.0)
    return mat.T_grid[i] * (1 - w) + mat.T_grid[i + 1] * w


def lookup_E_of_T(mat: MaterialTables, T: jax.Array) -> jax.Array:
    i = jnp.clip(jnp.searchsorted(mat.T_grid, T) - 1, 0, mat.T_grid.shape[0] - 2)
    w = (T - mat.T_grid[i]) / (mat.T_grid[i + 1] - mat.T_grid[i])
    w = jnp.clip(w, 0.0, 1.0)
    return mat.E_grid[i] * (1 - w) + mat.E_grid[i + 1] * w


def particle_energies(
    omega: jax.Array,
    dev: jax.Array,
    alive: jax.Array,
    T_local: jax.Array,
    t_reference: float,
) -> jax.Array:
    """e_p = hbar*omega*(n - n0(T_local)) per particle, eV
    (classes/Population.py:704-713 with reference_temp='local')."""
    dn = dev - occupation_delta_T(T_local, t_reference, omega)
    return jnp.where(alive, HBAR * omega * dn, 0.0)


def segment_matmul(vals: jax.Array, seg: jax.Array, n_seg: int) -> jax.Array:
    """Segment sum as a one-hot matmul: (n_seg, K) = onehot(seg).T @ vals.

    XLA lowers jax.ops.segment_sum to a serial scatter-add on TPU (~8 ms at
    N=1e6, 5 columns — measured from a profile trace); the same reduction as
    an MXU matmul runs in ~30 us. The one-hot comparison fuses into the dot's
    operand, so no (N, n_seg) buffer is materialised."""
    oh = (seg[:, None] == jnp.arange(n_seg, dtype=seg.dtype)[None, :]).astype(
        vals.dtype
    )
    # Precision.HIGHEST: the MXU's default precision rounds the f32 `vals`
    # operand to bf16 (~2^-8 relative error), which would silently degrade the
    # energy-balance ledgers this framework advertises as exact. The one-hot
    # operand is exact either way; the dot is (n_seg, K)-shaped output so the
    # extra passes cost microseconds.
    return jax.lax.dot_general(
        oh, vals, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def bin_all(
    geo: DeviceGeometry,
    mat: MaterialTables,
    energies: jax.Array,  # (N,)
    vel: jax.Array,  # (N,3)
    sv: jax.Array,
    alive: jax.Array,
    energy_normal: str,
    particle_density: float,
    psum=lambda x: x,
):
    """All subvolume reductions in ONE padded segment matmul:
    values (N,5) = [e, e*vx, e*vy, e*vz, alive]. Returns
    (E_dev_sv (SV,), phi_sv (SV,3) in eV/ps/A^2, Np_sv (SV,) i32).

    Reference classes/Population.py:704-747. Under particle-axis sharding
    `psum` all-reduces the raw sums over ICI before normalisation — the only
    cross-particle communication in the entire algorithm."""
    n_sv = geo.n_subvols
    n_pad = max(8, -(-(n_sv + 1) // 8) * 8)
    seg = jnp.where(alive, sv, n_pad - 1)
    vals = jnp.concatenate(
        [
            energies[:, None],
            energies[:, None] * vel,
            alive.astype(energies.dtype)[:, None],
        ],
        axis=1,
    )  # (N,5)
    sums = psum(segment_matmul(vals, seg, n_pad))[:n_sv]
    e_sv = sums[:, 0]
    phi = sums[:, 1:4]
    np_sv = sums[:, 4].astype(jnp.int32)

    if energy_normal == "fixed":
        norm = mat.n_active_modes / (particle_density * geo.subvol_volume)
        norm = jnp.asarray(norm, dtype=e_sv.dtype)
    else:  # 'mean'
        norm = mat.n_active_modes / jnp.maximum(np_sv, 1).astype(e_sv.dtype)
        norm = jnp.where(np_sv == 0, 0.0, norm)
    dens = 1.0 / (mat.n_qpoints * mat.volume_unitcell)
    e_sv = e_sv * norm * dens
    phi = phi * (norm * dens)[:, None]
    return e_sv, phi, np_sv


def bin_energy(
    geo: DeviceGeometry,
    mat: MaterialTables,
    energies: jax.Array,
    sv: jax.Array,
    alive: jax.Array,
    energy_normal: str,
    particle_density: float,
    psum=lambda x: x,
):
    """Subvolume energy density (eV/A^3) relative to the local reference.

    Returns (E_dev_sv, Np_sv). Reference classes/Population.py:714-728.
    Under particle-axis sharding `psum` all-reduces the raw segment sums over
    ICI before normalisation — the only cross-particle communication in the
    entire algorithm."""
    n_sv = geo.n_subvols
    seg = jnp.where(alive, sv, n_sv)  # dead -> overflow bucket
    e_sv = psum(jax.ops.segment_sum(energies, seg, num_segments=n_sv + 1)[:n_sv])
    np_sv = psum(
        jax.ops.segment_sum(alive.astype(jnp.int32), seg, num_segments=n_sv + 1)[
            :n_sv
        ]
    )
    if energy_normal == "fixed":
        norm = mat.n_active_modes / (particle_density * geo.subvol_volume)
    else:  # 'mean'
        norm = mat.n_active_modes / jnp.maximum(np_sv, 1).astype(e_sv.dtype)
        norm = jnp.where(np_sv == 0, 0.0, norm)
    e_sv = e_sv * norm / (mat.n_qpoints * mat.volume_unitcell)
    return e_sv, np_sv


def bin_heat_flux(
    geo: DeviceGeometry,
    mat: MaterialTables,
    energies: jax.Array,
    mode: jax.Array,
    sv: jax.Array,
    alive: jax.Array,
    np_sv: jax.Array,
    energy_normal: str,
    particle_density: float,
    psum=lambda x: x,
) -> jax.Array:
    """Subvolume heat flux (eV/ps/A^2, converted by caller)
    (classes/Population.py:730-747)."""
    n_sv = geo.n_subvols
    seg = jnp.where(alive, sv, n_sv)
    ev = energies[:, None] * mat.velocity[mode]  # (N,3)
    phi = psum(jax.ops.segment_sum(ev, seg, num_segments=n_sv + 1)[:n_sv])
    if energy_normal == "fixed":
        norm = mat.n_active_modes / (particle_density * geo.subvol_volume)
    else:
        norm = mat.n_active_modes / jnp.maximum(np_sv, 1).astype(phi.dtype)
    phi = phi * norm[:, None] / (mat.n_qpoints * mat.volume_unitcell)
    return phi
