"""Ewald electrostatics (md/ewald.py): absolute correctness against the
NaCl Madelung constant, alpha/tolerance invariance, analytic-vs-autodiff
forces, dense-vs-neighbor parity, and end-to-end PME propagation.

Reference counterpart: OpenMM's Ewald/PME methods exposed through
``src/simulators/mopenmm.py:101-115``; this rebuild evaluates the
reciprocal sum from structure factors as dense matmuls (TPU-first; see
the module docstring of ``md/ewald.py``)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.special import erfc

import isokann_tpu as itk
from isokann_tpu.md import forces as Fd
from isokann_tpu.md.ewald import (
    erfc_approx, ewald_alpha, ewald_kvectors, ewald_recip_energy,
    ewald_recip_force, ewald_self_energy,
)
from isokann_tpu.md.system import COULOMB, build_system
from isokann_tpu.md.neighbor import (
    NeighborPlan, neighbor_nonbonded_energy, neighbor_nonbonded_force,
)

A_NACL = 0.564          # nm, NaCl conventional-cell lattice constant
MADELUNG = 1.7475646


def _nacl():
    fcc = np.array([[0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0]])
    pos = np.concatenate([fcc, fcc + [0.5, 0, 0]]) % 1.0 * A_NACL
    q = np.array([1.0] * 4 + [-1.0] * 4)
    return jnp.asarray(pos, jnp.float64), jnp.asarray(q, jnp.float64), \
        np.array([A_NACL] * 3)


def _ewald_total(x, q, box, rc, tol):
    al = ewald_alpha(rc, tol)
    kv, cf = ewald_kvectors(box, al, tol)
    n = x.shape[0]
    d = x[:, None, :] - x[None, :, :]
    d = d - box * jnp.round(d / box)
    r = jnp.sqrt((d ** 2).sum(-1) + jnp.eye(n))
    qq = COULOMB * q[:, None] * q[None, :]
    mask = (1 - jnp.eye(n)) * (r < rc)
    e_real = 0.5 * jnp.sum(qq * erfc(al * r) / r * mask)
    e_rec = ewald_recip_energy(jnp.asarray(kv), jnp.asarray(cf), q, x)
    return float(e_real + e_rec + ewald_self_energy(al, q))


def test_madelung():
    """Absolute anchor: the rocksalt lattice energy is -M C q^2/d per ion
    pair (4 pairs in the conventional cell)."""
    jax.config.update("jax_enable_x64", True)
    try:
        x, q, box = _nacl()
        target = -MADELUNG * COULOMB / (A_NACL / 2) * 4
        e = _ewald_total(x, q, box, rc=0.25, tol=1e-6)
        assert abs(e / target - 1) < 1e-6, (e, target)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_alpha_invariance():
    """The split between real and reciprocal space must not change the
    total (the classic Ewald implementation check)."""
    jax.config.update("jax_enable_x64", True)
    try:
        x, q, box = _nacl()
        e1 = _ewald_total(x, q, box, rc=0.27, tol=1e-7)
        e2 = _ewald_total(x, q, box, rc=0.22, tol=1e-7)
        assert abs(e1 / e2 - 1) < 1e-6
    finally:
        jax.config.update("jax_enable_x64", False)


def test_erfc_approx_accuracy():
    # A&S 7.1.26 is 1.5e-7 in exact arithmetic; f32 evaluation adds
    # rounding of the same order
    xs = jnp.linspace(0.0, 6.0, 2000)
    assert float(jnp.max(jnp.abs(erfc_approx(xs) - erfc(xs)))) < 1e-6


def test_recip_force_matches_autodiff():
    x, q, box = _nacl()
    x = jnp.asarray(np.asarray(x) + 0.02 * np.random.default_rng(0)
                    .normal(size=x.shape), jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    al = ewald_alpha(0.25, 1e-5)
    kv, cf = (jnp.asarray(v, jnp.float32)
              for v in ewald_kvectors(box, al, 1e-5))
    fa = ewald_recip_force(kv, cf, q, x)
    fg = -jax.grad(lambda z: ewald_recip_energy(kv, cf, q, z))(x)
    assert float(jnp.max(jnp.abs(fa - fg))) < 1e-3 * float(
        jnp.max(jnp.abs(fg)) + 1)


@pytest.fixture(scope="module")
def solvated_pme():
    return itk.MDSimulation(addwater=True, padding=0.9, steps=3,
                            method="PME")


@pytest.fixture(scope="module")
def xpme(solvated_pme):
    rng = np.random.default_rng(0)
    s = solvated_pme.system
    return jnp.asarray(np.asarray(solvated_pme.coords).reshape(-1, 3)
                       + rng.normal(scale=0.003, size=(s.natoms, 3)),
                       jnp.float32)


def test_pme_system_builds(solvated_pme):
    s = solvated_pme.system
    assert s.method == "PME"
    assert s.ewald_alpha > 0
    assert s.ewald_kvecs.shape[0] > 100
    assert s.ewald_kvecs.shape[0] == s.ewald_coefs.shape[0]


@pytest.mark.slow
def test_pme_neighbor_energy_matches_dense(solvated_pme, xpme):
    s = solvated_pme.system
    plan = NeighborPlan(s, x0=np.asarray(xpme))
    e_n = float(neighbor_nonbonded_energy(s, xpme, plan))
    e_d = float(Fd.nonbonded_energy(s, xpme))
    assert abs(e_n - e_d) < 2e-4 * abs(e_d) + 0.5, (e_n, e_d)


def test_pme_neighbor_force_matches_dense(solvated_pme, xpme):
    s = solvated_pme.system
    plan = NeighborPlan(s, x0=np.asarray(xpme))
    f_n = np.asarray(neighbor_nonbonded_force(s, xpme, plan))
    f_d = np.asarray(-jax.grad(
        lambda z: Fd.nonbonded_energy(s, z))(xpme))
    scale = np.abs(f_d).max()
    assert np.abs(f_n - f_d).max() < 2e-4 * scale + 0.5, (
        np.abs(f_n - f_d).max(), scale)


def test_pme_neighbor_force_matches_own_energy_grad(solvated_pme, xpme):
    """Analytic neighbor force == autodiff of the neighbor energy (checks
    every correction term's derivative, not just dense parity)."""
    s = solvated_pme.system
    plan = NeighborPlan(s, x0=np.asarray(xpme))
    f_a = np.asarray(neighbor_nonbonded_force(s, xpme, plan))
    f_g = np.asarray(-jax.grad(
        lambda z: neighbor_nonbonded_energy(s, z, plan))(xpme))
    scale = np.abs(f_g).max()
    assert np.abs(f_a - f_g).max() < 2e-4 * scale + 0.5


def test_pme_pallas_sweep_matches_xla(solvated_pme, xpme):
    from isokann_tpu.md.neighbor import neighbor_sweep_pallas, _sweep

    s = solvated_pme.system
    plan = NeighborPlan(s, x0=np.asarray(xpme))
    xb = jnp.asarray(np.asarray(xpme).reshape(1, -1))
    f_ker = np.asarray(neighbor_sweep_pallas(s, plan, xb, interpret=True))
    f_xla = np.asarray(_sweep(s, plan, xpme, True)).reshape(1, -1)
    assert np.abs(f_ker - f_xla).max() < 1e-3 * (np.abs(f_xla).max() + 1)


def test_pme_vs_rf_physics(solvated_pme):
    """PME and reaction-field describe the same neutral water box: forces
    agree to the level RF's boundary approximation allows (measured:
    correlation 0.988, rel diff 0.16 — RF distorts dipolar interactions
    near the cutoff, which is exactly why PME exists)."""
    rf = build_system(solvated_pme.structure, method="CutoffPeriodic")
    x = jnp.asarray(np.asarray(solvated_pme.coords).reshape(-1, 3))
    f_pme = np.asarray(-jax.grad(
        lambda z: Fd.nonbonded_energy(solvated_pme.system, z))(x))
    f_rf = np.asarray(-jax.grad(lambda z: Fd.nonbonded_energy(rf, z))(x))
    corr = np.corrcoef(f_pme.ravel(), f_rf.ravel())[0, 1]
    rel = np.linalg.norm(f_pme - f_rf) / np.linalg.norm(f_rf)
    assert corr > 0.97, corr
    assert rel < 0.3, rel


def test_pme_tolerance_convergence(solvated_pme):
    """Tightening ewaldErrorTolerance converges the energy toward a
    tight-tolerance reference at the expected rate.  The residual at
    fixed cutoff is the real-space tail ~ erfc(alpha rc) ~ tol (measured
    on this box: 24 kJ at 5e-4, 1.6 kJ at 5e-5 — the same truncation
    OpenMM's Ewald has at identical settings)."""
    x = jnp.asarray(np.asarray(solvated_pme.coords).reshape(-1, 3))
    tight = build_system(solvated_pme.structure, method="Ewald",
                         ewald_tol=1e-5)
    e_ref = float(Fd.nonbonded_energy(tight, x))
    for tol, bound in ((5e-4, 40.0), (5e-5, 6.0)):
        s = build_system(solvated_pme.structure, method="Ewald",
                         ewald_tol=tol)
        e = float(Fd.nonbonded_energy(s, x))
        assert abs(e - e_ref) < bound, (tol, e, e_ref)


def test_pme_simulation_propagates(solvated_pme):
    """End-to-end: solvated alanine under PME propagates with finite
    energies and a sane temperature."""
    sim = solvated_pme
    ys = sim.propagate(np.asarray(sim.coords)[None, :], 2,
                       key=jax.random.PRNGKey(0))
    y = np.asarray(ys).reshape(2, -1)
    assert np.isfinite(y).all()
    e = [float(sim.potential(y[i])) for i in range(2)]
    assert np.isfinite(e).all()
