"""Isotropic long-range LJ dispersion correction (md/forces.py).

Reference counterpart: OpenMM's NonbondedForce.setUseDispersionCorrection
(default True), inherited by the reference through
``src/simulators/mopenmm.py`` createSystem; OpenMM implementation
NonbondedForceImpl::calcDispersionCorrection."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isokann_tpu as itk
from isokann_tpu.md import forces
from isokann_tpu.md.fixtures import alanine_dipeptide_pdb
from isokann_tpu.md.system import build_system, _dispersion_sums


@pytest.fixture(scope="module")
def solvated():
    return itk.MDSimulation(addwater=True, padding=0.62)


def test_sums_match_bruteforce(solvated):
    """Type-grouped O(T^2) sums == direct O(n^2) pair sums."""
    s = solvated.system
    rh = np.asarray(s.rmin_half, np.float64)
    ep = np.asarray(s.eps, np.float64)
    rmin = rh[:, None] + rh[None, :]
    epsij = np.sqrt(ep[:, None] * ep[None, :])
    s6_direct = float(np.sum(2.0 * epsij * rmin ** 6))
    s12_direct = float(np.sum(epsij * rmin ** 12))
    s6, s12 = _dispersion_sums(rh, ep)
    assert s6 == pytest.approx(s6_direct, rel=1e-10)
    assert s12 == pytest.approx(s12_direct, rel=1e-10)


def test_tail_matches_numeric_integral():
    """The closed form equals (4 pi/V) int_rc^inf r^2 U(r) dr summed over
    ordered pairs / 2, checked by quadrature on a tiny two-type system."""
    rh = np.array([0.17, 0.12])
    ep = np.array([0.5, 0.1])
    rc, V = 0.9, 30.0
    s6, s12 = _dispersion_sums(rh, ep)
    e_closed = (2.0 * np.pi / V) * (s12 / (9 * rc ** 9) - s6 / (3 * rc ** 3))

    r = np.linspace(rc, 60.0, 4_000_000)
    e_num = 0.0
    for i in range(2):
        for j in range(2):
            rmin = rh[i] + rh[j]
            eps = np.sqrt(ep[i] * ep[j])
            u = eps * ((rmin / r) ** 12 - 2.0 * (rmin / r) ** 6)
            e_num += 0.5 * (4.0 * np.pi / V) * np.trapezoid(r * r * u, r)
    assert e_closed == pytest.approx(e_num, rel=1e-5)


def test_enabled_by_default_periodic_only(solvated):
    s = solvated.system
    assert s.use_dispersion and s.disp_c6sum > 0
    ala = build_system(alanine_dipeptide_pdb(), method="NoCutoff")
    assert not ala.use_dispersion
    off = build_system(solvated.structure, dispersion_correction=False)
    assert not off.use_dispersion
    assert float(forces.dispersion_correction_energy(off)) == 0.0


def test_sign_and_volume_scaling(solvated):
    """Attractive tail => negative energy, scaling as 1/V."""
    s = solvated.system
    e1 = float(forces.dispersion_correction_energy(s))
    assert e1 < 0.0
    box2 = jnp.asarray(s.box) * 2.0
    e2 = float(forces.dispersion_correction_energy(s, box=box2))
    assert e2 == pytest.approx(e1 / 8.0, rel=1e-5)


@pytest.mark.slow
def test_total_energy_includes_term_both_paths(solvated):
    """potential_energy (dense) and the O(n) neighbor path both add the
    same scalar: with-vs-without difference == the closed form."""
    x = jnp.asarray(np.asarray(solvated.coords).reshape(-1, 3))
    s_on = solvated.system
    s_off = dataclasses.replace(s_on, use_dispersion=False)
    d_dense = float(forces.potential_energy(s_on, x)
                    - forces.potential_energy(s_off, x))
    e_corr = float(forces.dispersion_correction_energy(s_on))
    assert d_dense == pytest.approx(e_corr, abs=5e-2)

    from isokann_tpu.md.neighbor import potential_energy_neighbor
    sp_on = build_system(solvated.structure, dense_pairs=False)
    sp_off = dataclasses.replace(sp_on, use_dispersion=False)
    d_sparse = float(potential_energy_neighbor(sp_on, x)
                     - potential_energy_neighbor(sp_off, x))
    assert d_sparse == pytest.approx(
        float(forces.dispersion_correction_energy(sp_on)), abs=5e-2)


def test_forces_untouched(solvated):
    """Zero coordinate gradient: forces identical with the term on/off."""
    x = jnp.asarray(np.asarray(solvated.coords).reshape(-1), jnp.float32)
    s_on = solvated.system
    s_off = dataclasses.replace(s_on, use_dispersion=False)
    f_on = np.asarray(forces.force_flat(s_on, x))
    f_off = np.asarray(forces.force_flat(s_off, x))
    assert np.array_equal(f_on, f_off)


def test_magnitude_sane_for_water(solvated):
    """Tail correction for TIP3P-dominated boxes is around -40 to -60
    kJ/mol per nm^3 of water at 1 nm cutoff (literature ballpark for
    water's LJ tail) — catches unit slips of 10^3."""
    s = solvated.system
    e = float(forces.dispersion_correction_energy(s))
    V = float(np.prod(s.box))
    assert -200.0 < e / V < -5.0
