"""CMAP torsion-torsion maps (md/cmap.py) + importer round trips.

Beyond the reference's amber14/ff14SB surface: CMAP is what makes
ff19SB/CHARMM prmtops (md/amberio.py) and CMAPTorsionForce-bearing
serialized OpenMM systems (md/openmm_xml.py) run with their full
functional form."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isokann_tpu.md.cmap import (bicubic_coefs, cmap_energy, cmap_force,
                                 has_cmap, _cmap_e_points, _torsion)
from isokann_tpu.md.forces import (energy_terms, force_flat,
                                   potential_energy_flat)
from isokann_tpu.md.system import system_from_tables

R = 24
KCAL = 4.184


def _grid(fn):
    ang = -np.pi + 2 * np.pi * np.arange(R) / R
    P, S = np.meshgrid(ang, ang, indexing="ij")
    return fn(P, S)


def _toy(grids, nmaps=1):
    """5-atom chain with one CMAP term over torsions (0123, 1234)."""
    return system_from_tables(
        masses=[12.0] * 5, charges=[0.0] * 5,
        rmin_half=[0.0] * 5, eps=[0.0] * 5,
        bond_idx=[(i, i + 1) for i in range(4)],
        bond_k=[1e4] * 4, bond_r0=[0.15] * 4,
        excl_idx=[(i, j) for i in range(5) for j in range(i + 1, 5)],
        excl_qq=[0.0] * 10, excl_lj=[0.0] * 10,
        cmap_idx=[[0, 1, 2, 3, 1, 2, 3, 4]] * len(grids),
        cmap_type=list(range(len(grids))),
        cmap_grids=grids, method="NoCutoff")


def _chain_coords(phi, psi):
    """5 atoms with torsion(0123) = phi, torsion(1234) = psi, ideal
    tetrahedral-ish geometry."""
    # place via simple NeRF with bond 0.15, angle 109.5 deg
    b, theta = 0.15, math.radians(109.5)
    pts = [np.array([0.0, 0.0, 0.0]),
           np.array([b, 0.0, 0.0]),
           np.array([b + b * math.cos(math.pi - theta),
                     b * math.sin(math.pi - theta), 0.0])]
    for tor in (phi, psi):
        p1, p2, p3 = pts[-3], pts[-2], pts[-1]
        e1 = (p3 - p2) / np.linalg.norm(p3 - p2)
        nrm = np.cross(p2 - p1, e1)
        nrm /= np.linalg.norm(nrm)
        m = np.cross(nrm, e1)
        d = (-b * math.cos(theta) * e1
             + b * math.sin(theta) * (math.cos(tor) * m
                                      - math.sin(tor) * nrm))
        pts.append(p3 + d)
    return np.stack(pts)


def test_chain_coords_hit_requested_torsions():
    x = jnp.asarray(_chain_coords(0.7, -1.9))
    phi = float(_torsion(x[0][None], x[1][None], x[2][None], x[3][None])[0])
    psi = float(_torsion(x[1][None], x[2][None], x[3][None], x[4][None])[0])
    assert abs(phi - 0.7) < 1e-6
    assert abs(psi - (-1.9)) < 1e-6


def test_bicubic_exact_at_grid_points_and_accurate_between():
    grid = _grid(lambda p, s: 3.0 * np.cos(p) + 2.0 * np.sin(s)
                 + 1.5 * np.cos(p + s))
    sys = _toy([grid])
    ang = -np.pi + 2 * np.pi * np.arange(R) / R
    # exact at grid points
    for (i, j) in [(0, 0), (5, 17), (23, 23), (12, 1)]:
        x = _chain_coords(ang[i], ang[j])
        e = float(cmap_energy(sys, jnp.asarray(x)))
        assert abs(e - grid[i, j]) < 1e-4, (i, j)
    # accurate between grid points (smooth surface, R=24)
    rng = np.random.default_rng(0)
    for _ in range(10):
        phi, psi = rng.uniform(-np.pi, np.pi, 2)
        e = float(cmap_energy(sys, jnp.asarray(_chain_coords(phi, psi))))
        want = (3.0 * np.cos(phi) + 2.0 * np.sin(psi)
                + 1.5 * np.cos(phi + psi))
        assert abs(e - want) < 0.02


def test_cmap_force_matches_autodiff():
    grid = _grid(lambda p, s: 2.0 * np.cos(p) * np.sin(s))
    sys = _toy([grid])
    x = jnp.asarray(_chain_coords(0.43, 2.11))
    f = np.asarray(cmap_force(sys, x))
    f_auto = np.asarray(-jax.grad(
        lambda z: cmap_energy(sys, z))(x))
    np.testing.assert_allclose(f, f_auto, rtol=1e-5, atol=1e-6)
    # net force and torque-free (internal coordinates only)
    np.testing.assert_allclose(f.sum(0), 0.0, atol=1e-4)


@pytest.mark.slow
def test_cmap_in_full_energy_and_terms():
    grid = _grid(lambda p, s: np.cos(p) + np.cos(s))
    sys = _toy([grid])
    x = jnp.asarray(_chain_coords(0.3, 0.9).reshape(-1))
    terms = energy_terms(sys, x.reshape(-1, 3))
    assert "cmap" in terms
    e_direct = float(cmap_energy(sys, x.reshape(-1, 3)))
    assert abs(float(terms["cmap"]) - e_direct) < 1e-5
    # force_flat includes the cmap gradient
    f = np.asarray(force_flat(sys, x))
    f_auto = np.asarray(-jax.grad(
        lambda z: potential_energy_flat(sys, z))(x))
    np.testing.assert_allclose(f, f_auto, rtol=1e-4, atol=1e-4)


def test_cmap_prmtop_roundtrip(tmp_path):
    from isokann_tpu.md import save_prmtop, system_from_prmtop
    g1 = _grid(lambda p, s: np.cos(p) + 0.5 * np.sin(2 * s))
    g2 = _grid(lambda p, s: 0.3 * np.sin(p - s))
    sys = _toy([g1, g2])
    path = tmp_path / "cmap.prmtop"
    save_prmtop(sys, str(path))
    text = path.read_text()
    assert "CMAP_COUNT" in text and "CMAP_PARAMETER_02" in text
    sys2, _, _ = system_from_prmtop(str(path), method="NoCutoff")
    assert has_cmap(sys2)
    np.testing.assert_array_equal(np.asarray(sys2.cmap_idx),
                                  np.asarray(sys.cmap_idx))
    x = jnp.asarray(_chain_coords(-2.2, 1.3).reshape(-1))
    # grid values go through kcal with %9.5f precision
    np.testing.assert_allclose(
        float(potential_energy_flat(sys2, x)),
        float(potential_energy_flat(sys, x)), atol=1e-3)


def test_cmap_xml_roundtrip():
    from isokann_tpu.md import load_system_xml, save_system_xml
    g1 = _grid(lambda p, s: np.cos(p) + 0.5 * np.sin(2 * s))
    sys = _toy([g1])
    text = save_system_xml(sys)
    assert "CMAPTorsionForce" in text
    sys2, _, _ = load_system_xml(text)
    assert has_cmap(sys2)
    x = jnp.asarray(_chain_coords(0.8, -0.6).reshape(-1))
    np.testing.assert_allclose(
        float(potential_energy_flat(sys2, x)),
        float(potential_energy_flat(sys, x)), rtol=1e-5, atol=1e-5)


def test_cmap_sparse_path_matches_dense():
    """bonded_energy_sparse / bonded_force_sparse carry the CMAP term."""
    from isokann_tpu.md.neighbor import (bonded_energy_sparse,
                                         bonded_force_sparse)
    grid = _grid(lambda p, s: 1.7 * np.cos(2 * p) * np.cos(s))
    sys = _toy([grid])
    x = jnp.asarray(_chain_coords(1.1, -0.4))
    e_cmap = float(cmap_energy(sys, x))
    e_sparse = float(bonded_energy_sparse(sys, x))
    # subtract the (identical) bond terms by zeroing the map
    sys0 = _toy([np.zeros((R, R))])
    e0 = float(bonded_energy_sparse(sys0, x))
    assert abs((e_sparse - e0) - e_cmap) < 1e-4
    f = np.asarray(bonded_force_sparse(sys, x))
    f0 = np.asarray(bonded_force_sparse(sys0, x))
    np.testing.assert_allclose(f - f0, np.asarray(cmap_force(sys, x)),
                               rtol=1e-4, atol=1e-5)
