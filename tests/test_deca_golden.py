"""Deca-alanine golden-anchor regression net (ROADMAP round-5 item 0).

The trp-cage equilibrium anchor is an honest negative (13 transitions in
632 ns — see tests/test_trpcage_golden.py); deca-alanine's helix-coil
mode is ~50x faster, so its equilibrium ensemble holds hundreds of
transitions and supports the ala2-grade 1-D comparison.

Pins the committed anchor produced on TPU by tools/trpcage_golden_eq.py
--name deca: data/golden/deca_msm_eq.npz holds the symmetrized-Ulam
grid eigenfunction on TICA(CA-pairdist) CVs plus a 1-in-10 stride of
the comparison samples (cv_sample, chi_sample).  The tests re-derive
the chi-vs-eigenfunction correlation from the stored samples through
the live eigenfunction-evaluation path, so regressions in
analysis.msm fail loudly.
"""

import os

import numpy as np
import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EQ = os.path.join(HERE, "data", "golden", "deca_msm_eq.npz")


@pytest.fixture(scope="module")
def eq():
    if not os.path.exists(EQ):
        pytest.skip("deca equilibrium golden not generated yet")
    with np.load(EQ) as z:
        return {k: z[k] for k in z.files}


def test_spectral_sanity(eq):
    vals = np.asarray(eq["eigvals"], np.float64)
    assert abs(vals[0] - 1.0) < 1e-6
    assert 0.0 < vals[1] < 1.0
    # the slow mode is separated from the trivial one
    assert vals[1] < 1.0 - 1e-4


def test_chi_matches_msm_eigenfunction(eq):
    from isokann_tpu.analysis.msm import eigenfunction_on_samples

    ref = eigenfunction_on_samples(
        eq["cv_sample"], eq["cells"], eq["vec"], eq["lo"], eq["hi"],
        int(eq["nbins"]), periodic=False)
    fin = np.isfinite(ref)
    assert fin.mean() > 0.95
    corr = abs(np.corrcoef(eq["chi_sample"][fin], ref[fin])[0, 1])
    # mid-scale acceptance: the BASELINE.md ala2 philosophy (>= 0.95)
    # on a system with abundant equilibrium transitions
    assert corr >= 0.95, corr
