"""Exact-parameter interop: Amber prmtop/rst7 and serialized OpenMM System
XML (md/amberio.py, md/openmm_xml.py).

The reference gets authoritative parameters from OpenMM's
``ForceField(*xmls).createSystem`` (``src/simulators/mopenmm.py:55-76``);
these importers are the no-OpenMM equivalents: tleap prmtop output or an
``XmlSerializer.serialize(system)`` dump reproduce the exact force field
here.  Round-trip tests assert energy/force equality between a built
system and its exported+reimported twin, term by term."""

import numpy as np
import jax.numpy as jnp
import pytest

import isokann_tpu as itk
from isokann_tpu.md import (build_system, load_prmtop, load_system_xml,
                            read_rst7, save_prmtop, save_system_xml,
                            system_from_prmtop, write_rst7)
from isokann_tpu.md.fixtures import alanine_dipeptide_pdb
from isokann_tpu.md.forces import energy_terms, force_flat, \
    potential_energy_flat
from isokann_tpu.md.pdbio import read_pdb


@pytest.fixture(scope="module")
def ala():
    pdb = alanine_dipeptide_pdb()
    sys = build_system(pdb, method="NoCutoff")
    x = jnp.asarray(read_pdb(pdb).coords.reshape(-1), jnp.float32)
    return sys, x


def _compare_terms(sys_a, sys_b, x, rtol=2e-4, atol=2e-3):
    ta = energy_terms(sys_a, x.reshape(-1, 3))
    tb = energy_terms(sys_b, x.reshape(-1, 3))
    assert set(ta) == set(tb)
    for k in ta:
        np.testing.assert_allclose(float(ta[k]), float(tb[k]),
                                   rtol=rtol, atol=atol, err_msg=k)
    fa = np.asarray(force_flat(sys_a, x))
    fb = np.asarray(force_flat(sys_b, x))
    scale = max(1.0, float(np.abs(fa).max()))
    np.testing.assert_allclose(fb / scale, fa / scale, atol=5e-4)


# --------------------------------------------------------------------------
# prmtop
# --------------------------------------------------------------------------

def test_prmtop_roundtrip_vacuum(ala, tmp_path):
    sys, x = ala
    path = tmp_path / "ala.prmtop"
    save_prmtop(sys, str(path))
    sys2, coords, meta = system_from_prmtop(str(path), method="NoCutoff")
    assert sys2.natoms == sys.natoms
    # exceptions identical (index set and scales)
    np.testing.assert_array_equal(np.asarray(sys.excl_idx),
                                  np.asarray(sys2.excl_idx))
    np.testing.assert_allclose(np.asarray(sys.excl_qq),
                               np.asarray(sys2.excl_qq), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sys.excl_lj),
                               np.asarray(sys2.excl_lj), atol=1e-6)
    _compare_terms(sys, sys2, x)


@pytest.mark.slow
def test_prmtop_roundtrip_gb(tmp_path):
    pdb = alanine_dipeptide_pdb()
    sys = build_system(pdb, implicit="obc2")
    x = jnp.asarray(read_pdb(pdb).coords.reshape(-1), jnp.float32)
    path = tmp_path / "ala_gb.prmtop"
    save_prmtop(sys, str(path))
    sys2, _, _ = system_from_prmtop(str(path), implicit="obc2")
    np.testing.assert_allclose(np.asarray(sys2.gb_radii),
                               np.asarray(sys.gb_radii), atol=1e-7)
    np.testing.assert_allclose(np.asarray(sys2.gb_scales),
                               np.asarray(sys.gb_scales), atol=1e-7)
    _compare_terms(sys, sys2, x)


def test_rst7_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    coords = rng.normal(size=(17, 3)) * 0.5 + 2.0
    box = (2.5, 2.6, 2.7)
    path = tmp_path / "c.rst7"
    write_rst7(str(path), coords, box=box)
    c2, v2, b2 = read_rst7(str(path))
    np.testing.assert_allclose(c2, coords, atol=1e-7)
    assert v2 is None
    np.testing.assert_allclose(b2, box, atol=1e-7)


def test_prmtop_handwritten_fixture(tmp_path):
    """A minimal 4-atom chain exercising the format corners: D-exponents,
    multi-term dihedral with a negative 3rd index on the second term,
    missing SCEE/SCNB sections (defaults 1.2/2.0), and 1-4 exclusions."""
    text = """%VERSION  VERSION_STAMP = V0001.000
%FLAG TITLE
%FORMAT(20a4)
test
%FLAG POINTERS
%FORMAT(10I8)
       4       2       1       2       0       2       0       2       0       0
       5       1       2       0       2       2       2       2       2       0
       0       0       0       0       0       0       0       0       0       0
       0
%FLAG ATOM_NAME
%FORMAT(20a4)
C1  C2  C3  H1
%FLAG CHARGE
%FORMAT(5E16.8)
  1.82223000D+00 -1.82223000D+00  1.82223000D+00 -1.82223000D+00
%FLAG MASS
%FORMAT(5E16.8)
  1.20100000E+01  1.20100000E+01  1.20100000E+01  1.00800000E+00
%FLAG ATOM_TYPE_INDEX
%FORMAT(10I8)
       1       1       1       2
%FLAG NUMBER_EXCLUDED_ATOMS
%FORMAT(10I8)
       3       2       1       1
%FLAG NONBONDED_PARM_INDEX
%FORMAT(10I8)
       1       2       2       3
%FLAG RESIDUE_LABEL
%FORMAT(20a4)
LIG
%FLAG RESIDUE_POINTER
%FORMAT(10I8)
       1
%FLAG BOND_FORCE_CONSTANT
%FORMAT(5E16.8)
  3.00000000E+02  3.40000000E+02
%FLAG BOND_EQUIL_VALUE
%FORMAT(5E16.8)
  1.50000000E+00  1.09000000E+00
%FLAG ANGLE_FORCE_CONSTANT
%FORMAT(5E16.8)
  5.00000000E+01  4.00000000E+01
%FLAG ANGLE_EQUIL_VALUE
%FORMAT(5E16.8)
  1.91113553E+00  2.00000000E+00
%FLAG DIHEDRAL_FORCE_CONSTANT
%FORMAT(5E16.8)
  1.40000000E+00  2.00000000E-01
%FLAG DIHEDRAL_PERIODICITY
%FORMAT(5E16.8)
  3.00000000E+00  2.00000000E+00
%FLAG DIHEDRAL_PHASE
%FORMAT(5E16.8)
  0.00000000E+00  3.14159265E+00
%FLAG LENNARD_JONES_ACOEF
%FORMAT(5E16.8)
  1.04308023E+06  1.00000000E+04  1.00000000E+02
%FLAG LENNARD_JONES_BCOEF
%FORMAT(5E16.8)
  6.75612247E+02  2.00000000E+01  5.00000000E+00
%FLAG BONDS_INC_HYDROGEN
%FORMAT(10I8)
       6       9       2
%FLAG BONDS_WITHOUT_HYDROGEN
%FORMAT(10I8)
       0       3       1       3       6       1
%FLAG ANGLES_INC_HYDROGEN
%FORMAT(10I8)
%FLAG ANGLES_WITHOUT_HYDROGEN
%FORMAT(10I8)
       0       3       6       1       3       6       9       2
%FLAG DIHEDRALS_INC_HYDROGEN
%FORMAT(10I8)
%FLAG DIHEDRALS_WITHOUT_HYDROGEN
%FORMAT(10I8)
       0       3       6       9       1       0       3      -6       9       2
%FLAG EXCLUDED_ATOMS_LIST
%FORMAT(10I8)
       2       3       4       3       4       4
%FLAG AMBER_ATOM_TYPE
%FORMAT(20a4)
CT  CT  CT  HC
"""
    path = tmp_path / "tiny.prmtop"
    path.write_text(text)
    sys, coords, meta = system_from_prmtop(str(path), method="NoCutoff")
    assert sys.natoms == 4
    np.testing.assert_allclose(np.asarray(sys.charges),
                               [0.1, -0.1, 0.1, -0.1], atol=1e-6)
    assert meta["atom_names"] == ["C1", "C2", "C3", "H1"]
    # bonds: 2 heavy (param 1) + 1 H (param 2); kcal/A^2 -> kJ/nm^2
    assert sys.bond_idx.shape == (3, 2)
    np.testing.assert_allclose(
        sorted(float(k) for k in sys.bond_k),
        sorted([300 * 4.184 * 100] * 2 + [340 * 4.184 * 100]), rtol=1e-6)
    # both dihedral terms kept, same atoms
    assert sys.dih_idx.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(sys.dih_n), [3.0, 2.0])
    # exclusions: (0,1),(0,2),(1,2),(1,3),(2,3) full; (0,3) is 1-4 with
    # default 1/1.2, 1/2 (SCEE/SCNB sections absent)
    ex = {tuple(p): (float(q), float(l)) for p, q, l in
          zip(np.asarray(sys.excl_idx), np.asarray(sys.excl_qq),
              np.asarray(sys.excl_lj))}
    assert ex[(0, 3)] == pytest.approx((1 / 1.2, 0.5), abs=1e-6)
    assert ex[(0, 1)] == (0.0, 0.0)
    assert ex[(1, 2)] == (0.0, 0.0)
    # LJ diagonal from A/B: rmin = (2A/B)^(1/6), eps = B^2/4A
    rmin_t1 = (2 * 1.04308023e6 / 6.75612247e2) ** (1 / 6)
    np.testing.assert_allclose(float(sys.rmin_half[0]),
                               rmin_t1 / 2 / 10, rtol=1e-6)
    np.testing.assert_allclose(float(sys.eps[0]),
                               (6.75612247e2 ** 2 / (4 * 1.04308023e6))
                               * 4.184, rtol=1e-6)


# --------------------------------------------------------------------------
# OpenMM System XML
# --------------------------------------------------------------------------

def test_system_xml_roundtrip_vacuum(ala, tmp_path):
    sys, x = ala
    path = tmp_path / "ala_system.xml"
    save_system_xml(sys, str(path))
    sys2, cons, meta = load_system_xml(str(path))
    assert cons == []
    assert meta["skipped_forces"] == []
    assert sys2.method == sys.method
    np.testing.assert_array_equal(np.asarray(sys.excl_idx),
                                  np.asarray(sys2.excl_idx))
    _compare_terms(sys, sys2, x)


def test_system_xml_roundtrip_gb(tmp_path):
    pdb = alanine_dipeptide_pdb()
    sys = build_system(pdb, implicit="obc2")
    x = jnp.asarray(read_pdb(pdb).coords.reshape(-1), jnp.float32)
    text = save_system_xml(sys)
    sys2, _, _ = load_system_xml(text)
    assert sys2.implicit == "obc2"
    np.testing.assert_allclose(np.asarray(sys2.gb_radii),
                               np.asarray(sys.gb_radii), atol=1e-7)
    _compare_terms(sys, sys2, x)


def test_system_xml_constraints_roundtrip(ala):
    sys, _ = ala
    cons = [(0, 1, 0.109), (4, 5, 0.101)]
    text = save_system_xml(sys, constraints=cons)
    _, cons2, _ = load_system_xml(text)
    assert [(i, j) for i, j, _ in cons2] == [(0, 1), (4, 5)]
    np.testing.assert_allclose([d for _, _, d in cons2],
                               [d for _, _, d in cons], atol=1e-9)


def test_from_system_simulation(ala, tmp_path):
    """Imported system drives the full MDSimulation path: propagate +
    featurize, and distance constraints from explicit pairs hold."""
    sys, x = ala
    path = tmp_path / "ala.prmtop"
    save_prmtop(sys, str(path))
    write_rst7(str(tmp_path / "ala.rst7"), np.asarray(x).reshape(-1, 3))
    sys2, coords, meta = system_from_prmtop(
        str(path), str(tmp_path / "ala.rst7"), method="NoCutoff")
    cons = [(int(i), int(j), float(d)) for (i, j), d in
            zip(np.asarray(sys2.bond_idx)[:2], np.asarray(sys2.bond_r0)[:2])]
    sim = itk.MDSimulation.from_system(sys2, coords, steps=5,
                                       constraint_pairs=cons,
                                       source=str(path))
    import jax
    ys = sim.propagate(jnp.stack([jnp.asarray(coords.reshape(-1))] * 2),
                       nk=2, key=jax.random.PRNGKey(0))
    ys = np.asarray(ys)
    assert ys.shape == (2, 2, sys2.dim)
    assert np.isfinite(ys).all()
    for (i, j, d) in cons:
        y = ys.reshape(-1, sys2.natoms, 3)
        r = np.linalg.norm(y[:, i] - y[:, j], axis=-1)
        np.testing.assert_allclose(r, d, atol=1e-3)
    feats = sim.featurizer(jnp.asarray(ys.reshape(4, -1)))
    assert np.isfinite(np.asarray(feats)).all()


def test_state_xml_load():
    from isokann_tpu.md import load_state_xml
    xml = """<?xml version="1.0" ?>
<State openmmVersion="8.1" time="12.5" type="State" version="1">
 <PeriodicBoxVectors>
  <A x="2.5" y="0" z="0"/><B x="0" y="2.6" z="0"/><C x="0" y="0" z="2.7"/>
 </PeriodicBoxVectors>
 <Positions>
  <Position x="0.1" y="0.2" z="0.3"/>
  <Position x="0.4" y="0.5" z="0.6"/>
 </Positions>
 <Velocities>
  <Velocity x="1.0" y="-1.0" z="0.5"/>
  <Velocity x="0.0" y="0.25" z="0.0"/>
 </Velocities>
</State>"""
    coords, vel, box = load_state_xml(xml)
    np.testing.assert_allclose(coords, [[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]])
    np.testing.assert_allclose(vel, [[1.0, -1.0, 0.5], [0.0, 0.25, 0.0]])
    np.testing.assert_allclose(box, [2.5, 2.6, 2.7])
    with pytest.raises(ValueError, match="not a serialized State"):
        load_state_xml("<System/>")


def test_system_xml_roundtrip_pme(tmp_path):
    """Solvated periodic system: PME settings, box, rigid-water
    constraints and the dispersion correction survive the XML round trip."""
    sim = itk.MDSimulation(addwater=True, padding=0.55, steps=2,
                           method="PME", features=[(0, 4)])
    sys = sim.system
    x = jnp.asarray(np.asarray(sim.coords), jnp.float32)
    text = save_system_xml(sys)
    sys2, cons, meta = load_system_xml(text)
    assert sys2.method == "PME"
    assert sys2.box == pytest.approx(sys.box)
    assert sys2.use_dispersion == sys.use_dispersion
    np.testing.assert_allclose(sys2.ewald_alpha, sys.ewald_alpha, rtol=1e-6)
    _compare_terms(sys, sys2, x, rtol=5e-4, atol=5e-3)
