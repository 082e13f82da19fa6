"""Whole-force-field OpenMM ffxml registration (md/importers.py:
register_forcefield_ffxml) — the reference's exact input format
(``ForceField(*forcefields)``, ``src/simulators/mopenmm.py:54``).

The fixture ffxml is GENERATED from the embedded tables for the alanine
dipeptide residues, with deliberate perturbations (a charge split and a
doubled dihedral barrier).  Registration must (a) build with zero
fallbacks, (b) carry the XML's values verbatim into the system — proving
a user-supplied amber14/ff14SB file would override the embedded
ff99SB-class tables exactly."""

import copy
import math
import warnings

import jax.numpy as jnp
import numpy as np
import pytest

import isokann_tpu.md.amber as amber
from isokann_tpu.md import build_system
from isokann_tpu.md.fixtures import alanine_dipeptide_pdb
from isokann_tpu.md.forces import energy_terms
from isokann_tpu.md.importers import register_forcefield_ffxml
from isokann_tpu.md.pdbio import read_pdb

KCAL = 4.184
SIG = 2.0 ** (1.0 / 6.0)


@pytest.fixture
def restore_amber():
    snaps = {k: copy.deepcopy(getattr(amber, k)) for k in
             ("ATOM_TYPES", "BONDS", "ANGLES", "DIHEDRALS", "IMPROPERS",
              "RESIDUES")}
    yield
    for k, v in snaps.items():
        getattr(amber, k).clear()
        getattr(amber, k).update(v)


def _ffxml_from_builtin(resnames, charge_move=0.0, dihe_scale=None):
    """Render the embedded tables for ``resnames`` as an OpenMM ffxml.

    ``charge_move``: shift ALA CB charge by +d and HB1 by -d (sum kept);
    ``dihe_scale``: {(t1,t2,t3,t4): factor} barrier scaling."""
    classes = {}
    lines = ['<ForceField>', ' <AtomTypes>']
    for rn in resnames:
        for n, (t, q) in amber.RESIDUES[rn]["atoms"].items():
            classes[t] = amber.ATOM_TYPES[t]
    for t, (m, rh, eps) in sorted(classes.items()):
        lines.append(f'  <Type name="{t}" class="{t}" mass="{m}"/>')
    lines.append(' </AtomTypes>')
    lines.append(' <Residues>')
    for rn in resnames:
        tmpl = amber.RESIDUES[rn]
        lines.append(f'  <Residue name="{rn}">')
        for n, (t, q) in tmpl["atoms"].items():
            if rn == "ALA" and n == "CB":
                q = q + charge_move
            if rn == "ALA" and n == "HB1":
                q = q - charge_move
            lines.append(f'   <Atom name="{n}" type="{t}" charge="{q}"/>')
        for a, b in tmpl["bonds"]:
            lines.append(f'   <Bond atomName1="{a}" atomName2="{b}"/>')
        lines.append('  </Residue>')
    lines.append(' </Residues>')

    def in_classes(key):
        return all(t == "X" or t in classes for t in key)

    lines.append(' <HarmonicBondForce>')
    for (t1, t2), (k, r0) in amber.BONDS.items():
        if not isinstance(k, (int, float)) or not in_classes((t1, t2)):
            continue
        lines.append(f'  <Bond class1="{t1}" class2="{t2}" '
                     f'length="{r0 / 10.0}" k="{k * 2 * KCAL * 100}"/>')
    lines.append(' </HarmonicBondForce>')
    lines.append(' <HarmonicAngleForce>')
    for (t1, t2, t3), (k, t0) in amber.ANGLES.items():
        if not in_classes((t1, t2, t3)):
            continue
        lines.append(f'  <Angle class1="{t1}" class2="{t2}" class3="{t3}" '
                     f'angle="{math.radians(t0)}" k="{k * 2 * KCAL}"/>')
    lines.append(' </HarmonicAngleForce>')
    lines.append(' <PeriodicTorsionForce>')
    for key, terms in amber.DIHEDRALS.items():
        if not in_classes(key):
            continue
        scale = (dihe_scale or {}).get(key, 1.0)
        attrs = "".join(
            f' class{i + 1}="{"" if t == "X" else t}"'
            for i, t in enumerate(key))
        tattrs = "".join(
            f' periodicity{j + 1}="{int(n)}" phase{j + 1}='
            f'"{math.radians(ph)}" k{j + 1}="{pk * scale * KCAL}"'
            for j, (pk, ph, n) in enumerate(terms))
        lines.append(f'  <Proper{attrs}{tattrs}/>')
    for (i, j, c, l), (pk, ph, n) in amber.IMPROPERS.items():
        if not in_classes((i, j, c, l)):
            continue
        # OpenMM improper convention: central atom first
        attrs = (f' class1="{"" if c == "X" else c}"'
                 f' class2="{"" if i == "X" else i}"'
                 f' class3="{"" if j == "X" else j}"'
                 f' class4="{"" if l == "X" else l}"')
        lines.append(f'  <Improper{attrs} periodicity1="{int(n)}" '
                     f'phase1="{math.radians(ph)}" k1="{pk * KCAL}"/>')
    lines.append(' </PeriodicTorsionForce>')
    lines.append(' <NonbondedForce coulomb14scale="0.8333333" '
                 'lj14scale="0.5">')
    for t, (m, rh, eps) in sorted(classes.items()):
        sigma = (2.0 * rh) / SIG / 10.0
        lines.append(f'  <Atom type="{t}" sigma="{sigma}" '
                     f'epsilon="{eps * KCAL}"/>')
    lines.append(' </NonbondedForce>')
    lines.append('</ForceField>')
    return "\n".join(lines)


RES = ("ACE", "ALA", "NME")


def test_roundtrip_identity(restore_amber, tmp_path):
    """Registering an ffxml rendered from the embedded tables reproduces
    the embedded energies exactly (unit conversions cancel)."""
    pdb = alanine_dipeptide_pdb()
    x = jnp.asarray(read_pdb(pdb).coords)
    t0 = {k: float(v) for k, v in
          energy_terms(build_system(pdb, method="NoCutoff"), x).items()}
    path = tmp_path / "ff.xml"
    path.write_text(_ffxml_from_builtin(RES))
    with warnings.catch_warnings():
        warnings.simplefilter("error")       # zero fallbacks allowed
        done = register_forcefield_ffxml(str(path))
        sys2 = build_system(pdb, method="NoCutoff")
    assert set(done) == set(RES)
    t1 = energy_terms(sys2, x)
    for k in t0:
        assert abs(float(t1[k]) - t0[k]) < 2e-3, k


def test_xml_values_win(restore_amber, tmp_path):
    """Perturbed charges and a doubled backbone torsion barrier must land
    in the built system verbatim."""
    pdb = alanine_dipeptide_pdb()
    struct = read_pdb(pdb)
    x = jnp.asarray(struct.coords)
    base = {k: float(v) for k, v in
            energy_terms(build_system(pdb, method="NoCutoff"), x).items()}

    key = next(k for k in amber.DIHEDRALS
               if k in (("C", "N", "CT", "C"), ("C", "CT", "N", "C")))
    path = tmp_path / "ff.xml"
    path.write_text(_ffxml_from_builtin(RES, charge_move=0.05,
                                        dihe_scale={key: 2.0}))
    register_forcefield_ffxml(str(path))
    sys2 = build_system(pdb, method="NoCutoff")
    # the ALA CB charge is the XML's perturbed value
    ala_cb = [i for i, (rn, an) in
              enumerate(zip(struct.res_names, struct.atom_names))
              if rn == "ALA" and an == "CB"][0]
    got = float(sys2.charges[ala_cb])
    want = amber.RESIDUES["ALA"]["atoms"]["CB"][1]
    assert abs(got - want) < 1e-6 and abs(got - (0.0337 - 1.0)) > 1e-3
    t1 = energy_terms(sys2, x)
    assert abs(float(t1["dihedral"]) - base["dihedral"]) > 0.05
    assert abs(float(t1["nonbonded"]) - base["nonbonded"]) > 1e-4
    assert abs(float(t1["bond"]) - base["bond"]) < 2e-4


def test_terminal_fallback_generated(restore_amber, tmp_path):
    """A file without N*/C* templates still yields terminal variants for
    backbone residues (auto-generated), so terminal PDBs resolve."""
    path = tmp_path / "ff.xml"
    path.write_text(_ffxml_from_builtin(RES))
    register_forcefield_ffxml(str(path))
    assert "NALA" in amber.RESIDUES and "CALA" in amber.RESIDUES


def test_strict_lj_conflict(restore_amber, tmp_path):
    xml = """<ForceField>
 <AtomTypes>
  <Type name="t1" class="cc" mass="12.0"/>
  <Type name="t2" class="cc" mass="12.0"/>
 </AtomTypes>
 <Residues/>
 <NonbondedForce>
  <Atom type="t1" sigma="0.3" epsilon="0.5"/>
  <Atom type="t2" sigma="0.35" epsilon="0.5"/>
 </NonbondedForce>
</ForceField>"""
    path = tmp_path / "bad.xml"
    path.write_text(xml)
    with pytest.raises(ValueError, match="different LJ"):
        register_forcefield_ffxml(str(path))


def test_amber14_style_static_fixture(restore_amber):
    """A COMMITTED amber14-structured file (tests/data/
    amber14_style_fragment.xml): per-atom type names with name != class
    indirection, charges carried in NonbondedForce (not on residue
    atoms), and multi-term Proper elements — the exact layout of the
    real amber14-all.xml the reference loads
    (``src/simulators/mopenmm.py:54``).  Registration must build the
    alanine dipeptide with zero fallbacks and carry the file's values
    (incl. its deliberate perturbations) verbatim."""
    import os

    pdb = alanine_dipeptide_pdb()
    struct = read_pdb(pdb)
    x = jnp.asarray(struct.coords)
    base = {k: float(v) for k, v in
            energy_terms(build_system(pdb, method="NoCutoff"), x).items()}
    cb_q_builtin = amber.RESIDUES["ALA"]["atoms"]["CB"][1]

    path = os.path.join(os.path.dirname(__file__), "data",
                        "amber14_style_fragment.xml")
    with warnings.catch_warnings():
        warnings.simplefilter("error")       # zero fallbacks allowed
        done = register_forcefield_ffxml(path)
        sys2 = build_system(pdb, method="NoCutoff")
    assert set(done) == {"ACE", "ALA", "NME"}

    # charges resolved through NonbondedForce by *type name*, with the
    # file's CB/HB shifts, total charge still integral
    ala_cb = [i for i, (rn, an) in
              enumerate(zip(struct.res_names, struct.atom_names))
              if rn == "ALA" and an == "CB"][0]
    got = float(sys2.charges[ala_cb])
    assert got == pytest.approx(cb_q_builtin - 0.09, abs=1e-5)
    q = float(np.sum(np.asarray(sys2.charges)))
    assert abs(q - round(q)) < 1e-4

    t1 = energy_terms(sys2, x)
    # the 1.5x CT-CT-HC angle k moves the angle energy; bonds and
    # dihedrals (incl. the multi-term Propers) round-trip exactly
    assert abs(float(t1["angle"]) - base["angle"]) > 0.05
    assert abs(float(t1["bond"]) - base["bond"]) < 2e-4
    assert abs(float(t1["dihedral"]) - base["dihedral"]) < 2e-3
