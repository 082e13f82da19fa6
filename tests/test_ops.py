import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isokann_tpu.ops import (
    sqpairdist, flatpairdists, pdists, halfinds, localpdistinds,
    align, aligned_rmsd, pairwise_aligned_rmsd, aligntrajectory,
    dihedral,
)


def test_sqpairdist_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 3))
    d = np.asarray(sqpairdist(jnp.asarray(x, jnp.float32)))
    ref = ((x[:, :, None, :] - x[:, None, :, :]) ** 2).sum(-1)
    assert np.allclose(d, ref, atol=1e-5)


def test_flatpairdists():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 15))  # 5 atoms
    d = np.asarray(flatpairdists(jnp.asarray(x)))
    assert d.shape == (4, 10)
    xyz = x.reshape(4, 5, 3)
    ref = np.linalg.norm(xyz[:, 0] - xyz[:, 1], axis=-1)
    assert np.allclose(d[:, 0], ref, atol=1e-5)


def test_flatpairdists_atoms_subset():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 30))
    d = np.asarray(flatpairdists(jnp.asarray(x), atoms=[0, 3, 7]))
    assert d.shape == (3, 3)


def test_flatpairdists_grad_finite():
    x = jnp.asarray(np.random.default_rng(3).normal(size=(12,)), jnp.float32)
    g = jax.grad(lambda z: jnp.sum(flatpairdists(z[None, :])))(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_pdists():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 12))
    pairs = np.array([[0, 1], [2, 3]])
    d = np.asarray(pdists(jnp.asarray(x), pairs))
    xyz = x.reshape(2, 4, 3)
    assert np.allclose(d[:, 0], np.linalg.norm(xyz[:, 0] - xyz[:, 1], axis=-1),
                       atol=1e-5)


def test_localpdistinds():
    coords = np.zeros((1, 9))
    coords[0, 0:3] = [0, 0, 0]
    coords[0, 3:6] = [0.1, 0, 0]
    coords[0, 6:9] = [5.0, 0, 0]
    pairs = localpdistinds(coords, radius=1.0)
    assert pairs.tolist() == [[0, 1]]


def _random_rotation(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def test_align_recovers_rotation():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(7, 3))
    x -= x.mean(0)
    R = _random_rotation(rng)
    y = x @ R.T + rng.normal(size=3)
    out = np.asarray(align(jnp.asarray(x.ravel()), jnp.asarray(y.ravel()[None, :])))
    assert np.allclose(out.reshape(7, 3), x, atol=1e-4)


def test_aligned_rmsd_zero_for_rotated():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(6, 3))
    R = _random_rotation(rng)
    y = (x - x.mean(0)) @ R.T + 3.0
    d = float(aligned_rmsd(jnp.asarray(x.ravel()),
                           jnp.asarray(y.ravel()[None, :]))[0])
    assert d < 1e-4


def test_pairwise_aligned_rmsd():
    rng = np.random.default_rng(7)
    xs = rng.normal(size=(5, 12))
    D = pairwise_aligned_rmsd(jnp.asarray(xs))
    assert D.shape == (5, 5)
    assert np.allclose(np.diag(D), 0.0)
    assert np.allclose(D, D.T, atol=1e-5, equal_nan=True)


def test_pairwise_aligned_rmsd_masked():
    rng = np.random.default_rng(8)
    xs = rng.normal(size=(4, 9))
    mask = np.zeros((4, 4), bool)
    mask[0, 2] = True
    D = pairwise_aligned_rmsd(jnp.asarray(xs), mask=mask)
    assert np.isfinite(D[0, 2]) and np.isfinite(D[2, 0])
    assert np.isnan(D[0, 1])


def test_aligntrajectory():
    rng = np.random.default_rng(9)
    traj = rng.normal(size=(4, 15))
    out = np.asarray(aligntrajectory(jnp.asarray(traj)))
    assert out.shape == (4, 15)
    # successive frames should be at least as close as unaligned
    a = np.linalg.norm(out[1] - out[0])
    assert np.isfinite(a)


def test_dihedral_known_angles():
    # four points in a plane -> dihedral 180 or 0
    p = jnp.asarray([[0., 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]])
    assert abs(float(dihedral(p))) < 1e-5  # cis = 0
    p2 = jnp.asarray([[0., 0, 0], [1, 0, 0], [1, 1, 0], [2, 1, 0]])
    assert abs(abs(float(dihedral(p2))) - np.pi) < 1e-5  # trans
    # right angle
    p3 = jnp.asarray([[0., 0, 1], [0, 0, 0], [1, 0, 0], [1, 1, 0]])
    assert abs(abs(float(dihedral(p3))) - np.pi / 2) < 1e-5


def _rmsd_via_rotation(x, ys, weights=None):
    """Explicit-rotation RMSD (the pre-QCP formulation) for parity."""
    a = np.asarray(align(jnp.asarray(x), jnp.asarray(ys),
                         weights=weights, flat=False))
    w = np.ones(x.shape[-2]) if weights is None else np.asarray(weights)
    d = ((a - x) ** 2 * w[:, None]).sum(axis=(-1, -2)) / w.sum()
    return np.sqrt(d)


def test_aligned_rmsd_qcp_matches_rotation():
    rng = np.random.default_rng(21)
    x = rng.normal(size=(9, 3)).astype(np.float32)
    ys = (x[None] + 0.3 * rng.normal(size=(50, 9, 3))).astype(np.float32)
    d_qcp = np.asarray(aligned_rmsd(jnp.asarray(x), jnp.asarray(ys),
                                    flat=False))
    d_rot = _rmsd_via_rotation(x, ys)
    assert np.allclose(d_qcp, d_rot, atol=2e-3, rtol=1e-3)


def test_aligned_rmsd_qcp_weighted():
    rng = np.random.default_rng(22)
    x = rng.normal(size=(7, 3)).astype(np.float32)
    ys = (x[None] + 0.5 * rng.normal(size=(20, 7, 3))).astype(np.float32)
    w = rng.uniform(0.5, 2.0, size=7).astype(np.float32)
    d_qcp = np.asarray(aligned_rmsd(jnp.asarray(x), jnp.asarray(ys),
                                    weights=jnp.asarray(w), flat=False))
    d_rot = _rmsd_via_rotation(x, ys, weights=jnp.asarray(w))
    assert np.allclose(d_qcp, d_rot, atol=2e-3, rtol=1e-3)


def test_aligned_rmsd_qcp_no_reflection():
    # a mirrored structure must NOT report rmsd 0: the QCP maximum is
    # over proper rotations only, like the det-corrected Kabsch path
    rng = np.random.default_rng(23)
    x = rng.normal(size=(8, 3)).astype(np.float32)
    x -= x.mean(0)
    y = x.copy()
    y[:, 2] *= -1.0
    d = float(np.asarray(aligned_rmsd(jnp.asarray(x),
                                      jnp.asarray(y[None]),
                                      flat=False))[0])
    d_rot = float(_rmsd_via_rotation(x, y[None])[0])
    assert d > 0.1
    assert abs(d - d_rot) < 2e-3
