"""Deca-alanine golden-anchor regression net (ROADMAP round-5 item 0).

The trp-cage equilibrium anchor is an honest negative (13 transitions in
632 ns — see tests/test_trpcage_golden.py); deca-alanine's helix-coil
mode is ~50x faster, so its equilibrium ensemble holds hundreds of
transitions.  The anchor-instrument probe (tools/anchor_probe_npz.py,
out/deca_production/anchor_probe_npz.json) shows the deca ground truth
is WELL-DETERMINED — bootstrap eigenvector identifiability >= 0.987 at
every (lag, bins) rung — but the campaign chi's 1-D correlation is
ceiling-limited at 0.85 by its within-cell variance on the 2-D CV grid
(corr plateaus 0.76-0.79, deconvolved 0.92 at 250 ps).  The 0.95
acceptance therefore lives on the ESTIMATOR-EQUIVALENCE metric:
trajectory-ISOKANN and the grid MSM estimated from the SAME frames at
the SAME identifiable 250 ps lag (tools/trpcage_traj_iso.py --name
deca, cv_chi_corr).

Pins the committed anchors produced on TPU:
- data/golden/deca_msm_eq.npz (tools/trpcage_golden_eq.py --name deca):
  symmetrized-Ulam grid eigenfunction on TICA(CA-pairdist) CVs plus a
  1-in-10 stride of the comparison samples.  The test re-derives the
  chi-vs-eigenfunction correlation through the live
  eigenfunction-evaluation path and pins it against the recorded value
  (regression, not threshold — the threshold claim is the traj-iso
  equivalence).
- data/golden/deca_traj_iso.npz (tools/trpcage_traj_iso.py): the
  acceptance bundle.
- data/golden/deca_multichi.npz (tools/deca_multichi.py, nout=5): the
  multi-dimensional chi study.  Its psi_2-containment acceptance FAILED
  (subspace R ~= 0.42) and the spectrum-rank diagnostic
  (tools/deca_spectrum_rank.py) explains why: the learned 5-D invariant
  subspace holds THREE modes with lag-250 ps autocorrelation 0.95-0.99
  (timescales >~ 5 ns), all slower than the grid anchor's entire
  spectrum (lambda_2 = 0.734, 808 ps helix-coil), so the leading
  invariant subspace legitimately excludes the comparatively fast
  helix-coil mode — the multi-dim generalization of the 1-D
  full-feature honest negative.  Pinned below as regressions.
  NOTE: this artifact was trained under the pre-round-4 SUM-loss
  multi-dim dynamics; kept as the record of that study.
- data/golden/deca_multichi_meanloss.npz (round 5,
  out/deca_multichi_meanloss/multichi.json): the SAME protocol rerun at
  nout=3 under the corrected per-observation-MEAN dynamics (the
  round-4 verdict's open question).  The honest negative PERSISTS:
  subspace R(psi_2) = 0.56 (up from 0.42 but far below the 0.95
  acceptance), and the trained span still variationally dominates the
  anchor (two modes with lag-250 ps autocorrelation ~0.94-0.96 vs
  lambda_2 = 0.735) — so the round-4 conclusion stands under correct
  training dynamics.  Pinned below.
"""

import json
import os

import numpy as np
import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EQ = os.path.join(HERE, "data", "golden", "deca_msm_eq.npz")
TRAJ = os.path.join(HERE, "data", "golden", "deca_traj_iso.npz")
MULTI = os.path.join(HERE, "data", "golden", "deca_multichi.npz")
MULTI_ML = os.path.join(HERE, "data", "golden", "deca_multichi_meanloss.npz")
GOLDEN_MD = os.path.join(HERE, "out", "golden_md.json")


@pytest.fixture(scope="module")
def eq():
    if not os.path.exists(EQ):
        pytest.skip("deca equilibrium golden not generated yet")
    with np.load(EQ) as z:
        return {k: z[k] for k in z.files}


@pytest.fixture(scope="module")
def traj():
    if not os.path.exists(TRAJ):
        pytest.skip("deca traj-iso golden not generated yet")
    with np.load(TRAJ) as z:
        return {k: z[k] for k in z.files}


def _recorded_row(substr):
    if not os.path.exists(GOLDEN_MD):
        return None
    rows = json.load(open(GOLDEN_MD))
    hits = [r for r in rows if isinstance(r, dict)
            and substr in r.get("system", "")]
    return hits[-1] if hits else None


def test_spectral_sanity(eq):
    vals = np.asarray(eq["eigvals"], np.float64)
    assert abs(vals[0] - 1.0) < 1e-6
    assert 0.0 < vals[1] < 1.0
    # the slow mode is separated from the trivial one
    assert vals[1] < 1.0 - 1e-4


def test_recorded_corr_rederives(eq):
    from isokann_tpu.analysis.msm import eigenfunction_on_samples

    ref = eigenfunction_on_samples(
        eq["cv_sample"], eq["cells"], eq["vec"], eq["lo"], eq["hi"],
        int(eq["nbins"]), periodic=False)
    fin = np.isfinite(ref)
    assert fin.mean() > 0.95
    corr = abs(np.corrcoef(eq["chi_sample"][fin], ref[fin])[0, 1])
    row = _recorded_row("deca-alanine (Ala10) + OBC2 (equilibrium")
    if row is None:
        pytest.skip("no recorded deca equilibrium row in golden_md.json")
    # the stored samples are a 1-in-10 stride of the full comparison
    # set; their correlation through the live lookup path must
    # reproduce the recorded full-set value within sampling tolerance
    assert abs(corr - float(row["chi_corr"])) < 0.05, \
        (corr, float(row["chi_corr"]))


def test_anchor_is_identifiable():
    # what separates deca from the trp-cage honest negative: the
    # anchor's own bootstrap agrees with itself about psi_2
    probe = os.path.join(HERE, "out", "deca_production",
                         "anchor_probe_npz.json")
    if not os.path.exists(probe):
        pytest.skip("deca anchor probe not generated yet")
    doc = json.load(open(probe))
    assert doc["best"] is not None
    assert doc["best"]["identifiability"] >= 0.95


def test_traj_iso_rederives(traj):
    fin = np.isfinite(traj["ref"])
    corr = abs(np.corrcoef(traj["chi_traj"][fin], traj["ref"][fin])[0, 1])
    assert abs(corr - float(traj["chi_corr"])) < 0.05, \
        (corr, float(traj["chi_corr"]))


@pytest.fixture(scope="module")
def multi():
    if not os.path.exists(MULTI):
        pytest.skip("deca multichi golden not generated yet")
    with np.load(MULTI) as z:
        return {k: z[k] for k in z.files}


def test_multichi_subspace_R_rederives(multi):
    # the recorded honest negative: psi_2 is NOT contained in the
    # learned 5-D invariant subspace (stored R from the full-frame
    # computation; the npz carries a 1-in-10 stride of the same arrays)
    from isokann_tpu.analysis.msm import containment_R

    chi = np.asarray(multi["chi"], np.float64)
    ref = np.asarray(multi["ref"], np.float64)
    R, finfrac = containment_R(ref, chi)
    assert finfrac > 0.95
    assert abs(R - float(multi["subspace_R_psi2"])) < 0.02, \
        (R, float(multi["subspace_R_psi2"]))
    # and it stays an honest negative: far below the 0.95 acceptance
    assert R < 0.6


def test_multichi_variational_dominance(multi):
    # why the containment fails: the chi span's own projected spectrum
    # (generalized eigenvalues of C_tau vs C_0 on span{chi columns})
    # holds three modes slower than the grid anchor's ENTIRE spectrum.
    # Constants mirror tools/deca_multichi.py: 32 walkers x 1580 frames
    # at 12.5 ps/frame, npz stride 10, lag 250 ps -> strided lag 2.
    chi = np.asarray(multi["chi"], np.float64)
    W, sstep, n_frames, slag = 32, 10, 1580, 2
    assert len(chi) * sstep == W * n_frames
    idx = np.arange(len(chi))
    orig = idx * sstep
    ok = ((orig // n_frames) == ((orig + slag * sstep) // n_frames)) \
        & (idx + slag < len(chi))
    from isokann_tpu.analysis.msm import subspace_spectrum

    gev, _, _ = subspace_spectrum(chi[idx[ok]], chi[idx[ok] + slag])
    lam2 = float(np.asarray(multi["msm_eigvals"], np.float64)[1])
    assert 0.7 < lam2 < 0.8  # the helix-coil anchor eigenvalue
    # three modes at >= 0.94, i.e. timescales >= ~4 ns at the 250 ps
    # lag, vs the anchor's slowest 808 ps — variational dominance
    assert gev[0] <= 1.0 + 1e-6
    assert (gev[:3] >= 0.94).all(), gev.tolist()
    assert (gev[:3] > lam2 + 0.2).all(), (gev.tolist(), lam2)


def test_method_equivalence_threshold(traj):
    # THE mid-scale acceptance bar (BASELINE.md ala2 philosophy, >= 0.95
    # on a system with abundant equilibrium transitions and an
    # identifiable anchor): ISOKANN and the grid MSM estimate the same
    # projected operator from the same frames at the same lag
    assert float(traj["cv_chi_corr"]) >= 0.95, float(traj["cv_chi_corr"])


# -- round-5 mean-loss rerun (deca_multichi_meanloss.npz) ------------------

@pytest.fixture(scope="module")
def multi_ml():
    if not os.path.exists(MULTI_ML):
        pytest.skip("deca mean-loss multichi rerun not generated yet")
    with np.load(MULTI_ML) as z:
        return {k: z[k] for k in z.files}


def test_multichi_meanloss_negative_persists(multi_ml):
    """The round-4 verdict's open question: does the psi_2-containment
    honest negative survive the corrected per-observation-MEAN training
    dynamics?  It does — R moved 0.42 -> 0.56, still far below the 0.95
    acceptance.  Pinned against the recorded full-frame value (the npz
    carries a 1-in-10 stride, hence the 0.05 tolerance)."""
    from isokann_tpu.analysis.msm import containment_R

    assert int(multi_ml["nout"]) == 3
    chi = np.asarray(multi_ml["chi"], np.float64)
    ref = np.asarray(multi_ml["ref"], np.float64)
    R, finfrac = containment_R(ref, chi)
    assert finfrac > 0.95
    assert abs(R - float(multi_ml["subspace_R_psi2"])) < 0.05, \
        (R, float(multi_ml["subspace_R_psi2"]))
    assert R < 0.95    # the acceptance bar stays unmet
    assert 0.45 < float(multi_ml["subspace_R_psi2"]) < 0.70  # recorded 0.56


def test_multichi_meanloss_variational_dominance(multi_ml):
    """Why the containment still fails under correct dynamics: the
    learned 3-D span holds TWO modes slower than the anchor's entire
    spectrum (the third direction is the near-constant partition-of-
    unity combination, degenerate after mean-centering)."""
    from isokann_tpu.analysis.msm import subspace_spectrum

    chi = np.asarray(multi_ml["chi"], np.float64)
    W, sstep, n_frames, slag = 32, 10, 1580, 2
    assert len(chi) * sstep == W * n_frames
    idx = np.arange(len(chi))
    orig = idx * sstep
    ok = ((orig // n_frames) == ((orig + slag * sstep) // n_frames)) \
        & (idx + slag < len(chi))
    gev, _, _ = subspace_spectrum(chi[idx[ok]], chi[idx[ok] + slag])
    lam2 = float(np.asarray(multi_ml["msm_eigvals"], np.float64)[1])
    assert 0.7 < lam2 < 0.8
    assert gev[0] <= 1.0 + 1e-6
    assert (gev[:2] >= 0.93).all(), gev.tolist()
    assert (gev[:2] > lam2 + 0.19).all(), (gev.tolist(), lam2)
