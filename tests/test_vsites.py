"""Virtual sites (md/vsites.py) + TIP4P-Ew 4-site water.

The reference reaches 4-site waters through OpenMM's virtual-site
machinery whenever a user passes e.g. ``amber14/tip4pew.xml``
(``src/simulators/openmm.jl:130`` forcefields pass-through); here the
M extra point is an average3 site placed/redistributed by scatter-free
gather tables."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isokann_tpu as itk
from isokann_tpu.md import build_system
from isokann_tpu.md.forces import (force_flat, potential_energy_flat,
                                   _potential_raw)
from isokann_tpu.md.solvate import (M_WEIGHTS, R_OH, ANG_HOH, solvate,
                                    water_msites, water_triplets)
from isokann_tpu.md.vsites import (attach_vsites, has_vsites, place_vsites,
                                   place_vsites_flat, redistribute_forces)
from isokann_tpu.md.fixtures import alanine_dipeptide_pdb
from isokann_tpu.md.pdbio import read_pdb


def _toy_system():
    """4 atoms, the last a massless average3 site of the first three."""
    from isokann_tpu.md.system import system_from_tables
    sys = system_from_tables(
        masses=[16.0, 1.0, 1.0, 0.0],
        charges=[0.0, 0.5, 0.5, -1.0],
        rmin_half=[0.17, 0.0, 0.0, 0.0],
        eps=[0.6, 0.0, 0.0, 0.0],
        bond_idx=[(0, 1), (0, 2), (0, 3)],
        bond_k=[20000.0, 20000.0, 0.0],
        bond_r0=[0.1, 0.1, 0.0125],
        excl_idx=[(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],
        excl_qq=[0.0] * 6, excl_lj=[0.0] * 6,
        method="NoCutoff")
    return attach_vsites(sys, [3], [(0, 1, 2)], [M_WEIGHTS])


def test_placement():
    sys = _toy_system()
    assert has_vsites(sys)
    x = jnp.asarray([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0], [0.0, 0.1, 0.0],
                     [9.0, 9.0, 9.0]])          # stale site row
    xp = place_vsites(sys, x)
    want = (M_WEIGHTS[0] * x[0] + M_WEIGHTS[1] * x[1] + M_WEIGHTS[2] * x[2])
    np.testing.assert_allclose(np.asarray(xp[3]), np.asarray(want),
                               atol=1e-7)
    # real rows untouched
    np.testing.assert_array_equal(np.asarray(xp[:3]), np.asarray(x[:3]))
    # batched flat variant
    xf = jnp.stack([x.reshape(-1)] * 5)
    np.testing.assert_allclose(np.asarray(place_vsites_flat(sys, xf)),
                               np.tile(np.asarray(xp).reshape(-1), (5, 1)),
                               atol=1e-7)


def test_redistribution_is_exact_chain_rule():
    """redistribute(F(place(x))) must equal -d/dx E(place(x)) exactly:
    the transpose tables ARE the VJP of the linear placement."""
    sys = _toy_system()
    rng = np.random.default_rng(0)
    # two separated 'molecules' so the nonbonded term is active
    x = jnp.asarray(rng.normal(size=(4, 3)) * 0.05)
    f_auto = -jax.grad(
        lambda z: _potential_raw(sys, place_vsites(sys, z)))(x)
    f_engine = force_flat(sys, x.reshape(-1)).reshape(4, 3)
    np.testing.assert_allclose(np.asarray(f_engine[:3]),
                               np.asarray(f_auto[:3]), rtol=1e-4, atol=1e-4)
    # the site row carries no force (handed to parents)
    np.testing.assert_allclose(np.asarray(f_engine[3]), 0.0, atol=1e-7)
    # and the total force on real atoms is identical to the full-system
    # force sum (momentum conservation)
    np.testing.assert_allclose(np.asarray(f_engine.sum(0)),
                               np.asarray(f_auto.sum(0)), atol=1e-4)


def test_tip4pew_box_builds_and_runs():
    """Solvated alanine with TIP4P-Ew: template matches, M sites are
    virtual, charges sum to an integer, and short constrained dynamics
    stays finite with M exactly on its average3 position."""
    sim = itk.MDSimulation(addwater=True, padding=0.5,
                           water_model="tip4pew", steps=3,
                           features=[(0, 4)])
    sys = sim.system
    assert has_vsites(sys)
    nv = int(sys.vs_idx.shape[0])
    assert nv > 5
    # each M carries the TIP4P-Ew charge; its O carries none
    q = np.asarray(sys.charges)
    vs = np.asarray(sys.vs_idx)
    np.testing.assert_allclose(q[vs], -1.04844, atol=1e-6)
    par = np.asarray(sys.vs_gather)[vs]
    np.testing.assert_allclose(q[par[:, 0]], 0.0, atol=1e-6)
    assert abs(q.sum() - round(q.sum())) < 1e-4
    # masses: M is massless in the system, huge in the integrator masses
    m = np.asarray(sys.masses)
    np.testing.assert_allclose(m[vs], 0.0)
    assert float(np.asarray(sim.masses3).max()) > 1e20

    # the contiguous-water constraint fast path handles stride-4 blocks
    # (the M rows ride along untouched; generic Jacobi would be ~10x
    # slower at box scale)
    cs = sim.constraint_set
    assert cs is not None and cs.nwater == nv and cs.wstride == 4
    assert cs.ngeneric == 0
    ys = sim.propagate(jnp.asarray(sim.coords)[None, :], nk=2,
                       key=jax.random.PRNGKey(0))
    ys = np.asarray(ys).reshape(2, -1, 3)
    assert np.isfinite(ys).all()
    # output frames have the M sites exactly placed
    w = M_WEIGHTS
    for f in ys:
        want = w[0] * f[par[:, 0]] + w[1] * f[par[:, 1]] + w[2] * f[par[:, 2]]
        np.testing.assert_allclose(f[vs], want, atol=2e-6)
    # rigid-water constraints held on the real atoms
    trip = water_triplets(sim.structure)
    d = np.linalg.norm(ys[0][trip[:, 0]] - ys[0][trip[:, 1]], axis=-1)
    np.testing.assert_allclose(d, R_OH, atol=2e-3)


def test_tip4pew_energy_uses_m_charge():
    """Two fixed waters: the Coulomb energy must be computed at the M
    sites, not the O positions (the physical point of TIP4P)."""
    sim = itk.MDSimulation(addwater=True, padding=0.5,
                           water_model="tip4pew", steps=1,
                           features=[(0, 4)])
    sys = sim.system
    x = np.asarray(sim.coords, float).reshape(-1, 3)
    e1 = float(potential_energy_flat(sys, jnp.asarray(x.reshape(-1))))
    # corrupting a site row must NOT change the energy (it is re-placed)
    vs = np.asarray(sys.vs_idx)
    x2 = x.copy()
    x2[vs[0]] += 1.0
    e2 = float(potential_energy_flat(sys, jnp.asarray(x2.reshape(-1))))
    assert math.isclose(e1, e2, rel_tol=1e-6, abs_tol=1e-3)
    # but moving its parent O does
    x3 = x.copy()
    x3[int(np.asarray(sys.vs_gather)[vs[0], 0])] += 0.05
    e3 = float(potential_energy_flat(sys, jnp.asarray(x3.reshape(-1))))
    assert abs(e3 - e1) > 1.0


@pytest.mark.slow
def test_npt_with_tip4pew():
    """NPT composes with 4-site water: the volume move re-places stale M
    rows, molecules (incl. their M) translate rigidly, energies stay
    finite, and the returned frame is exactly placed."""
    from isokann_tpu.md.barostat import npt_langevin
    sim = itk.MDSimulation(addwater=True, padding=0.45,
                           water_model="tip4pew", steps=2,
                           rigidwater=False, features=[(0, 4)],
                           method="CutoffPeriodic")
    xf, box, info = npt_langevin(sim, key=jax.random.PRNGKey(4),
                                 steps=10, interval=5, pressure=1.0)
    assert np.isfinite(np.asarray(xf)).all()
    assert (np.asarray(box) > 0.5).all()
    x = np.asarray(xf).reshape(-1, 3)
    sys = sim.system
    vs = np.asarray(sys.vs_idx)
    par = np.asarray(sys.vs_gather)[vs]
    w = M_WEIGHTS
    want = w[0] * x[par[:, 0]] + w[1] * x[par[:, 1]] + w[2] * x[par[:, 2]]
    np.testing.assert_allclose(x[vs], want, atol=2e-6)
    e = float(potential_energy_flat(sys, jnp.asarray(xf)))
    assert np.isfinite(e)


def test_system_xml_vsite_roundtrip():
    from isokann_tpu.md import load_system_xml, save_system_xml
    sys = _toy_system()
    text = save_system_xml(sys)
    assert "VirtualSite" in text
    sys2, _, _ = load_system_xml(text)
    assert has_vsites(sys2)
    np.testing.assert_array_equal(np.asarray(sys2.vs_idx),
                                  np.asarray(sys.vs_idx))
    np.testing.assert_allclose(np.asarray(sys2.vs_w),
                               np.asarray(sys.vs_w), atol=1e-9)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(12,)) * 0.05)
    np.testing.assert_allclose(float(potential_energy_flat(sys2, x)),
                               float(potential_energy_flat(sys, x)),
                               rtol=1e-5, atol=1e-4)


def test_unsupported_vsite_type_raises():
    from isokann_tpu.md import load_system_xml
    xml = """<?xml version="1.0" ?>
<System openmmVersion="8.1" type="System" version="1">
 <PeriodicBoxVectors><A x="2" y="0" z="0"/><B x="0" y="2" z="0"/>
  <C x="0" y="0" z="2"/></PeriodicBoxVectors>
 <Particles>
  <Particle mass="16"/><Particle mass="1"/><Particle mass="1"/>
  <Particle mass="0">
   <VirtualSite type="localCoords" particle1="0" particle2="1"
    particle3="2"/>
  </Particle>
 </Particles>
 <Constraints/>
 <Forces/>
</System>"""
    with pytest.raises(ValueError, match="localCoords"):
        load_system_xml(xml)


def _oop_system():
    """TIP5P-style out-of-plane site: 4 atoms, the last placed off the
    0-1-2 plane via the cross term."""
    from isokann_tpu.md.system import system_from_tables
    w12, w13, wc = 0.4, 0.3, 5.0
    sys = system_from_tables(
        masses=[16.0, 1.0, 1.0, 0.0],
        charges=[0.2, 0.2, 0.2, -0.6],
        rmin_half=[0.17, 0.0, 0.0, 0.0],
        eps=[0.6, 0.0, 0.0, 0.0],
        bond_idx=[(0, 1), (0, 2)],
        bond_k=[20000.0, 20000.0], bond_r0=[0.1, 0.1],
        excl_idx=[(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],
        excl_qq=[0.0] * 6, excl_lj=[0.0] * 6,
        method="NoCutoff")
    return attach_vsites(sys, [3], [(0, 1, 2)],
                         [(1.0 - w12 - w13, w12, w13)],
                         vs_cross=[wc]), (w12, w13, wc)


def test_outofplane_placement():
    sys, (w12, w13, wc) = _oop_system()
    x = jnp.asarray([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0], [0.0, 0.1, 0.0],
                     [7.0, 7.0, 7.0]])
    xp = np.asarray(place_vsites(sys, x))
    d12 = np.asarray(x[1] - x[0])
    d13 = np.asarray(x[2] - x[0])
    want = (np.asarray(x[0]) + w12 * d12 + w13 * d13
            + wc * np.cross(d12, d13))
    np.testing.assert_allclose(xp[3], want, atol=1e-6)
    assert abs(want[2]) > 1e-3            # genuinely off-plane
    np.testing.assert_array_equal(xp[:3], np.asarray(x[:3]))


def test_outofplane_force_transpose_matches_autodiff():
    """The hand-derived cross-term transpose must equal autodiff of
    E(place(x)) exactly (the F1/F2/F3 formulas in redistribute_forces)."""
    from isokann_tpu.md.forces import _potential_raw
    sys, _ = _oop_system()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 3)) * 0.06)
    f_auto = -jax.grad(
        lambda z: _potential_raw(sys, place_vsites(sys, z)))(x)
    f_engine = force_flat(sys, x.reshape(-1)).reshape(4, 3)
    np.testing.assert_allclose(np.asarray(f_engine[:3]),
                               np.asarray(f_auto[:3]), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(f_engine[3]), 0.0, atol=1e-7)


def test_outofplane_xml_roundtrip():
    from isokann_tpu.md import load_system_xml, save_system_xml
    from isokann_tpu.md.forces import potential_energy_flat
    sys, _ = _oop_system()
    text = save_system_xml(sys)
    assert 'type="outOfPlane"' in text
    sys2, _, _ = load_system_xml(text)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(12,)) * 0.05)
    np.testing.assert_allclose(float(potential_energy_flat(sys2, x)),
                               float(potential_energy_flat(sys, x)),
                               rtol=1e-5, atol=1e-5)
