"""Equilibrium-trajectory MSM estimators (analysis/msm.py):
trajectory_pairs extraction and the detailed-balance symmetrized Ulam
option used by the trp-cage equilibrium golden anchor
(tools/trpcage_golden_eq.py)."""

import numpy as np
import pytest

from isokann_tpu.analysis.msm import (koopman_eigenfunctions,
                                      trajectory_pairs,
                                      ulam_transition_matrix)


def test_trajectory_pairs_basic():
    cv = np.arange(2 * 5 * 1, dtype=float).reshape(2, 5, 1)
    x, y = trajectory_pairs(cv, 2)
    assert x.shape == (6, 1)
    np.testing.assert_array_equal(x.ravel(), [0, 1, 2, 5, 6, 7])
    np.testing.assert_array_equal(y.ravel(), [2, 3, 4, 7, 8, 9])


def test_trajectory_pairs_repeats_kept():
    cv = np.arange(3 * 4 * 2, dtype=float).reshape(3, 4, 2)
    x1, _ = trajectory_pairs(cv, 1, walkers=[2, 2])
    x2, _ = trajectory_pairs(cv, 1, walkers=[2])
    assert len(x1) == 2 * len(x2)
    np.testing.assert_array_equal(x1[:len(x2)], x1[len(x2):])


def test_trajectory_pairs_lag_bounds():
    cv = np.zeros((1, 4, 1))
    with pytest.raises(ValueError):
        trajectory_pairs(cv, 4)
    with pytest.raises(ValueError):
        trajectory_pairs(cv, 0)


def _two_state_chains(p01=0.05, p10=0.10, W=20, F=400, seed=0):
    """Ensemble of 2-state Markov chains embedded as CV values 0/1."""
    rng = np.random.default_rng(seed)
    s = rng.integers(0, 2, W)
    out = np.empty((W, F, 1))
    for t in range(F):
        out[:, t, 0] = s
        flip = rng.random(W) < np.where(s == 0, p01, p10)
        s = np.where(flip, 1 - s, s)
    return out


def test_symmetrized_ulam_recovers_two_state_eigenvalue():
    cv = _two_state_chains()
    x, y = trajectory_pairs(cv, 1)
    P, cells, counts = ulam_transition_matrix(
        x, y, -0.5, 1.5, 2, periodic=False, symmetrize=True)
    assert P.shape == (2, 2)
    np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=1e-12)
    vals, vecs = koopman_eigenfunctions(P, k=2)
    # lambda_2 = 1 - p01 - p10 = 0.85
    assert abs(vals[1] - 0.85) < 0.05
    # detailed balance: pi_i P_ij symmetric by construction
    pi = counts / counts.sum()
    np.testing.assert_allclose(pi[:, None] * P, (pi[:, None] * P).T,
                               atol=1e-12)


def test_symmetrized_matches_raw_in_expectation():
    cv = _two_state_chains(W=40, F=800, seed=3)
    x, y = trajectory_pairs(cv, 1)
    P_s, _, _ = ulam_transition_matrix(x, y, -0.5, 1.5, 2,
                                       periodic=False, symmetrize=True)
    P_r, _, _ = ulam_transition_matrix(x, y, -0.5, 1.5, 2,
                                       periodic=False)
    v_s, _ = koopman_eigenfunctions(P_s, k=2)
    v_r, _ = koopman_eigenfunctions(P_r, k=2)
    assert abs(v_s[1] - v_r[1]) < 0.03


def test_disconnected_trajectories_flags_isolated_walker():
    from isokann_tpu.analysis.msm import disconnected_trajectories

    rng = np.random.default_rng(0)
    # 15 connected walkers: chi hovers near 0.1 with real fluctuations
    chi = 0.1 + 0.02 * rng.standard_normal((16, 200))
    # 1 isolated walker: chi pinned at the opposite end (indicator mode)
    chi[7] = 0.9 + 0.002 * rng.standard_normal(200)
    flagged, info = disconnected_trajectories(chi)
    assert flagged.tolist() == [7]
    assert info["ratio"] > 10


def test_disconnected_trajectories_keeps_two_state_split():
    from isokann_tpu.analysis.msm import disconnected_trajectories

    rng = np.random.default_rng(1)
    # genuinely metastable 2-state ensemble: half the walkers in each
    # basin, chi near 0/1 — NOT a disconnect (two large groups)
    chi = np.where(np.arange(16)[:, None] < 8, 0.05, 0.95) \
        + 0.01 * rng.standard_normal((16, 200))
    flagged, _ = disconnected_trajectories(chi)
    assert flagged.size == 0


def test_disconnected_trajectories_quiet_without_collapse():
    from isokann_tpu.analysis.msm import disconnected_trajectories

    rng = np.random.default_rng(2)
    # healthy chi: within-walker variance dominates
    chi = rng.uniform(0, 1, (12, 300))
    flagged, info = disconnected_trajectories(chi)
    assert flagged.size == 0
    assert info["ratio"] < 10


def test_anchor_identifiability_two_state():
    from isokann_tpu.analysis.msm import anchor_identifiability

    cv = _two_state_chains(W=20, F=400, seed=4)
    rng = np.random.default_rng(7)
    chi = cv[..., 0] + 0.03 * rng.standard_normal(cv.shape[:2])
    res = anchor_identifiability(cv, 1, -0.5, 1.5, 2, n_boot=20,
                                 min_count=1, chi=chi)
    # a clean 2-state system: psi_2 is perfectly identifiable and chi
    # (the state indicator) correlates ~1 with it
    assert res["identifiability"] > 0.99
    assert abs(res["eigvals"][1] - 0.85) < 0.05
    assert res["chi_corr"] > 0.98
    assert res["coverage"] == 1.0
    lo95, hi95 = res["chi_corr_ci95"]
    assert lo95 > 0.95 and hi95 <= 1.0
    assert res["n_boot_ok"] == 20


def test_anchor_identifiability_degenerate_modes_low():
    from isokann_tpu.analysis.msm import anchor_identifiability

    # two INDEPENDENT two-state coordinates with identical rates:
    # lambda_2 = lambda_3 exactly, so individual eigenvectors of the
    # estimated matrix are arbitrary rotations within the degenerate
    # eigenspace -- bootstrap replicas must disagree about psi_2
    a = _two_state_chains(W=16, F=300, seed=5)
    b = _two_state_chains(W=16, F=300, seed=6)
    cv = np.concatenate([a, b], axis=2)
    res = anchor_identifiability(cv, 1, -0.5, 1.5, 2, n_boot=20,
                                 min_count=1)
    assert res["identifiability"] < 0.95
    assert "chi_corr" not in res  # chi not provided


def test_grid_ceiling_bounds_any_cell_constant_reference():
    from isokann_tpu.analysis.msm import grid_assign, grid_ceiling

    rng = np.random.default_rng(0)
    cv = rng.uniform(0, 1, (600, 2))
    chi = cv[:, 0] + 0.3 * rng.standard_normal(600)
    ceiling, cellmean = grid_ceiling(chi, cv, 0.0, 1.0, 4,
                                     periodic=False)
    assert 0.0 < ceiling < 1.0
    np.testing.assert_allclose(
        ceiling, abs(np.corrcoef(chi, cellmean)[0, 1]), atol=1e-12)
    # no cell-constant g can correlate with chi beyond the ceiling
    ids, shape = grid_assign(cv, 0.0, 1.0, 4, periodic=False)
    ncell = int(np.prod(shape))
    advs = [np.random.default_rng(s).standard_normal(ncell)[ids]
            for s in range(5)]
    advs.append((cellmean > np.median(cellmean)).astype(float))
    advs.append(2.0 * cellmean - 1.0)  # affine images of the optimum
    for g in advs:
        assert abs(np.corrcoef(chi, g)[0, 1]) <= ceiling + 1e-9


def test_grid_ceiling_saturates_for_cell_constant_chi():
    from isokann_tpu.analysis.msm import grid_assign, grid_ceiling

    rng = np.random.default_rng(1)
    cv = rng.uniform(0, 1, (400, 2))
    ids, shape = grid_assign(cv, 0.0, 1.0, 3, periodic=False)
    chi = np.linspace(0, 1, int(np.prod(shape)))[ids]
    ceiling, _ = grid_ceiling(chi, cv, 0.0, 1.0, 3, periodic=False)
    np.testing.assert_allclose(ceiling, 1.0, atol=1e-12)
