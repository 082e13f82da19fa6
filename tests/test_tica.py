"""TICA slow-CV estimator (``analysis/msm.tica``): recovery of known
slow directions on an analytic linear process, regularization behavior,
and the committed trp-cage golden-anchor regression."""

import os

import numpy as np
import pytest

from isokann_tpu.analysis.msm import (
    tica, ulam_transition_matrix, koopman_eigenfunctions,
    chi_msm_correlation)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _linear_pairs(n=20000, rho=(0.9, 0.3), angle=0.7, seed=0):
    """Lagged pairs of a 2-D AR(1) process with per-mode autocorrelations
    ``rho``, observed through a rotation (so neither feature axis is the
    slow direction)."""
    rng = np.random.default_rng(seed)
    rho = np.asarray(rho)
    # stationary unit-variance AR(1) per mode
    z = rng.standard_normal((n, 2))
    zlag = rho * z + np.sqrt(1 - rho ** 2) * rng.standard_normal((n, 2))
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, -s], [s, c]])
    return z @ R.T, zlag @ R.T, R


def test_tica_recovers_slow_direction():
    f_x, f_y, R = _linear_pairs()
    lam, V, mu = tica(f_x, f_y, dim=2, n_pca=2)
    assert lam[0] == pytest.approx(0.9, abs=0.02)
    assert lam[1] == pytest.approx(0.3, abs=0.02)
    # first component aligns with the rotated slow axis
    slow = R[:, 0]
    cos = abs(np.dot(V[:, 0] / np.linalg.norm(V[:, 0]), slow))
    assert cos > 0.99
    # projection of fresh samples is decorrelated in the right order
    t = (f_x - mu) @ V
    t_lag = (f_y - mu) @ V
    ac0 = np.corrcoef(t[:, 0], t_lag[:, 0])[0, 1]
    ac1 = np.corrcoef(t[:, 1], t_lag[:, 1])[0, 1]
    assert ac0 > ac1 + 0.3


def test_tica_burst_shape_and_regularization():
    f_x, f_y, _ = _linear_pairs(n=3000)
    # (n, k, f) burst endpoints collapse identically to repeated pairs
    lam_flat, V_flat, _ = tica(f_x, f_y, dim=1, n_pca=2)
    lam_b, V_b, _ = tica(f_x, f_y[:, None, :], dim=1, n_pca=2)
    assert lam_b[0] == pytest.approx(lam_flat[0], abs=1e-12)
    # n_pca caps the whitened rank even with redundant features
    fx3 = np.hstack([f_x, f_x[:, :1] + f_x[:, 1:]])   # rank-deficient
    fy3 = np.hstack([f_y, f_y[:, :1] + f_y[:, 1:]])
    lam3, V3, _ = tica(fx3, fy3, dim=2, n_pca=2)
    assert np.all(np.isfinite(lam3)) and V3.shape == (3, 2)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(ROOT, "data", "golden",
                                    "trpcage_msm.npz")),
    reason="trp-cage golden not committed")
def test_trpcage_golden_regression():
    """Re-running the Ulam estimation + chi correlation from the
    committed arrays must reproduce the committed verdict — any change
    to grid_assign / ulam_transition_matrix / eigen machinery that
    shifts the trp-cage anchor fails here."""
    d = np.load(os.path.join(ROOT, "data", "golden", "trpcage_msm.npz"))
    cv_x, cv_y, chi = d["cv_x"], d["cv_y"], d["chi"]
    lo, hi, nbins = d["lo"], d["hi"], int(d["nbins"])
    P, cells, _ = ulam_transition_matrix(cv_x, cv_y, lo, hi, nbins,
                                         periodic=False, min_count=2)
    vals, vecs = koopman_eigenfunctions(P, k=4)
    np.testing.assert_allclose(vals, d["eigvals"], atol=1e-10)
    assert np.array_equal(cells, d["cells"])
    golden = dict(cells=cells, vec=vecs[:, 1], lo=lo, hi=hi,
                  nbins=nbins, periodic=False)
    corr, coverage = chi_msm_correlation(chi, cv_x, golden)
    ref = abs(float(np.corrcoef(
        chi, np.where(np.isfinite(chi), chi, 0))[0, 1]))  # sanity guard
    assert ref == pytest.approx(1.0)
    # reproduce the committed eigenfunction exactly, then the committed
    # correlation through the full evaluation path
    stored = dict(cells=d["cells"], vec=d["vec"], lo=lo, hi=hi,
                  nbins=nbins, periodic=False)
    corr_stored, _ = chi_msm_correlation(chi, cv_x, stored)
    assert corr == pytest.approx(corr_stored, abs=1e-8)
    assert coverage == 1.0


# ---- subspace diagnostics (containment_R / subspace_spectrum) ----------

def test_containment_R_basics():
    from isokann_tpu.analysis.msm import containment_R

    rng = np.random.default_rng(3)
    n = 4000
    slow = rng.standard_normal(n)
    noise = rng.standard_normal((n, 2))
    # basis mixes the target with noise through an invertible map:
    # the span contains it, so R -> 1 even though no column does
    M = np.array([[0.5, 1.0, -0.3], [0.8, -0.2, 0.4], [0.1, 0.7, 0.9]])
    basis = np.stack([slow, noise[:, 0], noise[:, 1]], axis=1) @ M.T
    basis = np.concatenate([basis, rng.standard_normal((n, 1))], axis=1)
    R, finfrac = containment_R(2.0 * slow - 1.0, basis)
    assert finfrac == 1.0
    assert R > 0.999
    # an independent series is not contained
    R0, _ = containment_R(rng.standard_normal(n), basis)
    assert R0 < 0.1
    # 1-D basis reduces to |corr|
    x = rng.standard_normal(n)
    y = 0.6 * x + 0.8 * rng.standard_normal(n)
    R1, _ = containment_R(y, x)
    assert R1 == pytest.approx(abs(np.corrcoef(x, y)[0, 1]), abs=1e-12)
    # non-finite ref entries are masked, not propagated
    yn = y.copy()
    yn[::7] = np.nan
    Rn, fr = containment_R(yn, x)
    assert 0.8 < fr < 0.9 and np.isfinite(Rn)


def test_subspace_spectrum_recovers_mode_ladder():
    from isokann_tpu.analysis.msm import subspace_spectrum

    rng = np.random.default_rng(5)
    n, rho = 40000, np.array([0.9, 0.4, 0.0])
    z = rng.standard_normal((n, 3))
    zlag = rho * z + np.sqrt(1 - rho ** 2) * rng.standard_normal((n, 3))
    # observe through a non-orthogonal mixing (a trained multi-dim chi
    # never exposes the modes axis-aligned)
    A = np.array([[1.0, 0.3, -0.2], [0.5, -1.0, 0.4], [0.2, 0.6, 1.0]])
    lam, V, mu = subspace_spectrum(z @ A.T, zlag @ A.T)
    assert lam.shape == (3,)
    assert lam[0] == pytest.approx(0.9, abs=0.03)
    assert lam[1] == pytest.approx(0.4, abs=0.03)
    assert abs(lam[2]) < 0.03
    # the slow combination recovers the rho=0.9 latent mode
    proj = (z @ A.T - mu) @ V[:, 0]
    corr = abs(np.corrcoef(proj, z[:, 0])[0, 1])
    assert corr > 0.99
