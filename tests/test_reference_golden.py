"""Golden-format parity against the reference's shipped example run.

/root/reference/readme_fig/test_white_0/ contains a complete convergence.txt,
subvolumes.txt and residue.txt from a real Nano-kappa run (Si film,
10 slices, 2 reservoirs). Our readers/writers use the same column layout, so
the reference artifacts must parse cleanly and reproduce the documented
numbers (BASELINE.md)."""

import os

import numpy as np
import pytest

REF = "/root/reference/readme_fig/test_white_0"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference artifacts not available"
)


def test_reference_convergence_parses():
    from nanokappa_tpu.visual import read_convergence

    conv = read_convergence(
        os.path.join(REF, "convergence.txt"), n_sv=10, n_res=2,
        subvol_type="slice", n_con=9,
    )
    assert conv["timestep"][-1] == 1000
    assert conv["T"].shape[1] == 10
    # BASELINE.md: final kappa total 75.31 W/m/K; final T profile
    # 301.40 -> 298.47 K
    assert conv["k"][-1] == pytest.approx(75.31, abs=0.01)
    assert conv["T"][-1, 0] == pytest.approx(301.40, abs=0.01)
    assert conv["T"][-1, -1] == pytest.approx(298.47, abs=0.01)
    # reservoir energy balance residuals trend small
    assert abs(conv["en_res"][-1]).max() < 0.1


def test_reference_residue_parses():
    res = np.loadtxt(os.path.join(REF, "residue.txt"))
    # slice layout: 3*n_sv + n_res columns (T, phi_x, en_res, kappa blocks)
    assert res.shape[1] == 3 * 10 + 2


def test_our_convergence_matches_reference_column_count(tmp_path):
    """A row written by our writer must have the same token count as a row of
    the reference file (same header structure)."""
    from nanokappa_tpu.io.writers import ConvergenceWriter

    w = ConvergenceWriter(str(tmp_path), 10, 2, "slice", np.zeros((0, 2), int))
    w.write_row(
        10, 10.0, 1.0,
        np.zeros(2), np.zeros((2, 3)), 1000,
        np.full(10, 300.0), np.zeros(10), np.zeros((10, 3)),
        np.full(10, 100), kappa_sv=np.zeros(10), kappa_total=0.0,
    )
    ours = open(tmp_path / "convergence.txt").readlines()[-1].split()
    with open(os.path.join(REF, "convergence.txt")) as f:
        f.readline()
        theirs = f.readline().split()
    assert len(ours) == len(theirs)
