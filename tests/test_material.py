"""Material pipeline tests: symmetry, FBZ folding, loader round-trip, E<->T."""

import numpy as np
import pytest

from nanokappa_tpu.constants import HBAR, KB
from nanokappa_tpu.material import synthetic_material, write_synthetic_hdf5, load_material
from nanokappa_tpu.material.poscar import parse_poscar
from nanokappa_tpu.material.symmetry import (
    crystal_rotations,
    reciprocal_operations,
    ir_reciprocal_mesh,
)
from nanokappa_tpu.material.synthetic import _si_like_crystal
from nanokappa_tpu.material.tables import bose_einstein, fold_to_fbz


def test_poscar_roundtrip(tmp_path):
    write_synthetic_hdf5(str(tmp_path), mesh=(4, 4, 4))
    c = parse_poscar(str(tmp_path / "POSCAR"))
    assert c.lattice.shape == (3, 3)
    assert c.frac_positions.shape == (2, 3)
    assert c.species == ["Si", "Si"]
    assert c.volume == pytest.approx(5.431**3, rel=1e-9)


def test_symmetry_group_properties():
    c = _si_like_crystal()
    rots = crystal_rotations(c)
    # CsCl-like basis on a cubic lattice: full O_h point group, 48 ops
    assert len(rots) == 48
    recs = reciprocal_operations(c)
    # time reversal adds nothing (inversion already present)
    assert len(recs) == 48
    # group closure under multiplication
    as_set = {tuple(r.ravel()) for r in recs}
    for a in recs[:8]:
        for b in recs[:8]:
            assert tuple((a @ b).ravel()) in as_set


def test_ir_mesh_weights_sum():
    c = _si_like_crystal()
    recs = reciprocal_operations(c)
    ir_q, w = ir_reciprocal_mesh((6, 6, 6), recs)
    assert w.sum() == 6**3
    assert ir_q.shape[0] == len(w)
    assert ir_q.shape[0] < 6**3  # actually reduced


def test_fold_to_fbz_minimal_norm():
    c = _si_like_crystal()
    B = c.reciprocal_lattice
    rng = np.random.default_rng(0)
    q = rng.uniform(0, 1, size=(50, 3))
    k = fold_to_fbz(q @ B.T, B)
    # every folded vector has minimal norm among its 27 nearest images
    shifts = np.stack(
        np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1], indexing="ij"), axis=-1
    ).reshape(-1, 3) @ B.T
    norms = np.linalg.norm(k[:, None, :] + shifts[None, :, :], axis=-1)
    assert np.all(np.linalg.norm(k, axis=1) <= norms.min(axis=1) + 1e-9)
    # folding is idempotent
    assert np.allclose(fold_to_fbz(k, B), k, atol=1e-9)


def test_loader_matches_direct_synthesis(tmp_path):
    """Full-BZ tables from the hdf5 loader must match direct generation."""
    mesh = (4, 4, 4)
    write_synthetic_hdf5(str(tmp_path), mesh=mesh)
    loaded = load_material(str(tmp_path), "kappa-m444.hdf5", "POSCAR")
    direct = synthetic_material(mesh=mesh)

    assert loaded.n_qpoints == direct.n_qpoints == 64
    assert loaded.n_branches == 6

    # same multiset of (omega, |v|) mode pairs
    def key(mat):
        w = np.round(mat.omega.ravel(), 6)
        v = np.round(np.linalg.norm(mat.group_vel, axis=2).ravel(), 6)
        order = np.lexsort((v, w))
        return w[order], v[order]

    lw, lv = key(loaded)
    dw, dv = key(direct)
    np.testing.assert_allclose(lw, dw, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(lv, dv, rtol=1e-6, atol=1e-8)
    # energy tables agree
    np.testing.assert_allclose(
        loaded.crystal_energy([200.0, 300.0]),
        direct.crystal_energy([200.0, 300.0]),
        rtol=1e-9,
    )


def test_loader_isotope_scattering(tmp_path):
    write_synthetic_hdf5(str(tmp_path), mesh=(4, 4, 4))
    base = load_material(str(tmp_path), "kappa-m444.hdf5", "POSCAR")
    iso = load_material(
        str(tmp_path), "kappa-m444.hdf5", "POSCAR", isotope_scattering=True
    )
    act = base.tau > 0
    assert np.all(iso.tau[act] < base.tau[act])


def test_bose_einstein():
    # n0 at x = hbar*w/kT = 1 -> 1/(e-1)
    T = 300.0
    omega = KB * T / HBAR
    assert bose_einstein(T, omega) == pytest.approx(1 / (np.e - 1), rel=1e-12)
    assert bose_einstein(0.0, omega) == 0.0
    assert bose_einstein(T, 0.0) == 0.0


def test_temperature_energy_inversion(small_material):
    mat = small_material
    T = np.array([123.4, 250.0, 381.7])
    E = mat.energy_from_temperature(T)
    np.testing.assert_allclose(mat.temperature_from_energy(E), T, atol=0.05)
    # E(T) strictly increasing
    assert np.all(np.diff(mat.E_grid) > 0)


def test_degeneracies_found(small_material):
    # TA1/TA2 and TO1/TO2 are degenerate by construction away from Gamma
    deg = small_material.degeneracies
    assert deg.shape[0] > 0
    q, j1, j2 = deg.T
    np.testing.assert_allclose(
        small_material.omega[q, j1], small_material.omega[q, j2], atol=1e-12
    )


def test_bulk_kappa_reasonable(small_material):
    k = small_material.bulk_kappa_rta(300.0)
    # isotropic cubic crystal: kappa tensor ~ diagonal and equal
    assert np.all(k > 10) and np.all(k < 1000)
    assert np.allclose(k, k.mean(), rtol=0.05)


def test_device_tables(small_material):
    t = small_material.device_tables()
    M = small_material.n_modes
    assert t.omega.shape == (M,)
    assert t.velocity.shape == (M, 3)
    assert t.tau.shape == (len(small_material.tau_T), M)
    assert int(t.active.sum()) == small_material.n_active_modes
    assert t.n_active_modes == small_material.n_active_modes
