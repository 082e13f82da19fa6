"""Ligand perception/parameterization (md/ligand.py) and the
authoritative parameter importers (md/importers.py).

Reference counterpart: openmmforcefields GAFF + charge generation
(``src/simulators/mopenmm.py:30-50``) for the 6O0K ligand systems."""

import math
import os
import textwrap

import numpy as np
import pytest

from isokann_tpu.md.ligand import (
    perceive, perceive_bonds, gasteiger_charges, add_hydrogens,
    parameterize_ligand)
from isokann_tpu.md.pdbio import PDBStructure


def _benzene():
    """Ideal benzene ring, heavy atoms only (Angstrom -> nm)."""
    r = 1.39
    coords = np.array([[r * math.cos(k * math.pi / 3),
                        r * math.sin(k * math.pi / 3), 0.0]
                       for k in range(6)]) / 10.0
    return ["C"] * 6, coords


def _acetone():
    """(CH3)2-C=O heavy atoms from standard geometry."""
    coords = np.array([
        [0.000, 0.000, 0.000],     # C (carbonyl)
        [0.000, 1.220, 0.000],     # O  (C=O 1.22)
        [1.310, -0.750, 0.000],    # C methyl
        [-1.310, -0.750, 0.000],   # C methyl
    ]) / 10.0
    return ["C", "O", "C", "C"], coords


def test_bond_perception_benzene():
    els, xyz = _benzene()
    bonds = perceive_bonds(els, xyz)
    assert len(bonds) == 6                      # the ring, no cross-bonds


def test_aromatic_perception():
    els, xyz = _benzene()
    p = perceive(els, xyz)
    assert all(p.aromatic)
    assert all(h == 2 for h in p.hybrid)
    assert all(o == 1.5 for o in p.order.values())
    assert p.implicit_h == [1] * 6              # C6H6


def test_carbonyl_perception():
    els, xyz = _acetone()
    p = perceive(els, xyz)
    key = (0, 1)
    assert p.order[key] == 2.0                  # C=O
    assert p.hybrid[0] == 2
    assert p.implicit_h[0] == 0
    assert p.implicit_h[1] == 0
    assert p.implicit_h[2] == 3                 # methyls
    assert p.implicit_h[3] == 3


def test_hydrogen_placement_geometry():
    els, xyz = _benzene()
    p = perceive(els, xyz)
    parents, hxyz = add_hydrogens(p, xyz)
    assert len(parents) == 6
    # aromatic H: in plane, pointing radially outward
    for par, h in zip(parents, hxyz):
        assert abs(h[2]) < 1e-6
        d = np.linalg.norm(h - xyz[par]) * 10.0
        assert 1.0 < d < 1.2
        # outward: farther from the centroid than its carbon
        assert np.linalg.norm(h) > np.linalg.norm(xyz[par])


def test_gasteiger_charges_ordering():
    """PEOE on acetone: O negative, carbonyl C most positive; methanol-
    style molecules sum to exactly zero."""
    els, xyz = _acetone()
    p = perceive(els, xyz)
    parents, hxyz = add_hydrogens(p, xyz)
    els_all = p.elements + ["H"] * len(parents)
    bonds_all = list(p.bonds) + [(int(a), len(p.elements) + k)
                                 for k, a in enumerate(parents)]
    hyb = p.hybrid + [0] * len(parents)
    formal = np.concatenate([p.formal, np.zeros(len(parents))])
    q = gasteiger_charges(els_all, bonds_all, hyb, formal)
    assert abs(q.sum()) < 1e-9
    assert q[1] < -0.2                           # carbonyl O
    assert q[0] > 0.1                            # carbonyl C
    assert q[0] == max(q[:4])


def test_parameterize_and_build_small_molecule(tmp_path):
    """A perceived ligand registers, builds, and minimizes downhill."""
    import jax.numpy as jnp
    from isokann_tpu.md.pdbio import write_pdb
    from isokann_tpu.md.system import build_system
    from isokann_tpu.md.forces import potential_energy_flat
    from isokann_tpu.md.minimize import minimize_energy

    els, xyz = _acetone()
    struct = PDBStructure(
        atom_names=["C1", "O1", "C2", "C3"], res_names=["ACT"] * 4,
        res_ids=[1] * 4, chain_ids=["A"] * 4, elements=els, coords=xyz)
    tmpl, full = parameterize_ligand("ACT", struct)
    assert full.natoms == 10                    # + 6 H
    path = str(tmp_path / "act.pdb")
    write_pdb(path, full)
    sys_ = build_system(path)
    x0 = jnp.asarray(full.coords.reshape(-1), jnp.float32)
    e0 = float(potential_energy_flat(sys_, x0))
    x1 = minimize_energy(lambda z: potential_energy_flat(sys_, z), x0,
                         maxiter=200)
    e1 = float(potential_energy_flat(sys_, x1))
    assert np.isfinite(e1) and e1 < e0


REF_LIGAND = "/root/reference/data/chris/6O0K_ligand-only.pdb"


@pytest.mark.skipif(not os.path.exists(REF_LIGAND),
                    reason="reference 6O0K data not present")
def test_6o0k_ligand_end_to_end(tmp_path):
    """The reference's LBM ligand (61 heavy atoms incl. nitro, sulfonyl,
    chloro, 5 rings) parameterizes, builds, and minimizes."""
    import jax.numpy as jnp
    from isokann_tpu.md.pdbio import write_pdb
    from isokann_tpu.md.system import build_system
    from isokann_tpu.md.forces import potential_energy_flat
    from isokann_tpu.md.minimize import minimize_energy

    tmpl, struct = parameterize_ligand("LBM", REF_LIGAND,
                                       residue_filter="LBM")
    assert struct.natoms > 100                  # 61 heavy + ~49 H
    q = sum(c for _, c in tmpl["atoms"].values())
    assert abs(q - round(q)) < 1e-6             # integer net charge
    path = str(tmp_path / "lbm.pdb")
    write_pdb(path, struct)
    sys_ = build_system(path)
    x0 = jnp.asarray(struct.coords.reshape(-1), jnp.float32)
    x1 = minimize_energy(lambda z: potential_energy_flat(sys_, z), x0,
                         maxiter=200)
    e1 = float(potential_energy_flat(sys_, x1))
    assert np.isfinite(e1)
    assert e1 < float(potential_energy_flat(sys_, x0))


# --------------------------------------------------------------------------
# importers
# --------------------------------------------------------------------------

_FRCMOD = textwrap.dedent("""\
    generic methanol-like fragment
    MASS
    c3 12.010   0.878
    oh 16.000   0.465
    ho 1.008    0.135
    h1 1.008    0.135

    BOND
    c3-oh  316.70  1.423
    c3-h1  330.60  1.097
    oh-ho  371.40  0.973

    ANGLE
    h1-c3-h1  39.24  108.46
    h1-c3-oh  50.97  110.26
    c3-oh-ho  47.09  107.26

    DIHE
    h1-c3-oh-ho  3  0.50  0.0  3.

    IMPROPER

    NONBON
      c3  1.9080  0.1094
      oh  1.7210  0.2104
      ho  0.0000  0.0000
      h1  1.3870  0.0157
    """)

_MOL2 = textwrap.dedent("""\
    @<TRIPOS>MOLECULE
    MOH
     6 5 1 0 0
    SMALL
    USER_CHARGES
    @<TRIPOS>ATOM
      1 C1   0.000  0.000  0.000 c3 1 MOH  0.0900
      2 O1   1.410  0.000  0.000 oh 1 MOH -0.5988
      3 H1  -0.360  1.030  0.000 h1 1 MOH  0.0372
      4 H2  -0.360 -0.520  0.890 h1 1 MOH  0.0372
      5 H3  -0.360 -0.520 -0.890 h1 1 MOH  0.0372
      6 H4   1.730  0.890  0.000 ho 1 MOH  0.3972
    @<TRIPOS>BOND
      1 1 2 1
      2 1 3 1
      3 1 4 1
      4 1 5 1
      5 2 6 1
    """)


def test_frcmod_mol2_import(tmp_path):
    import jax.numpy as jnp
    from isokann_tpu.md.importers import (load_frcmod, load_mol2,
                                          register_ligand_frcmod)
    from isokann_tpu.md.pdbio import write_pdb
    from isokann_tpu.md.system import build_system
    from isokann_tpu.md.forces import potential_energy_flat
    from isokann_tpu.md import amber

    fp = tmp_path / "moh.frcmod"
    fp.write_text(_FRCMOD)
    mp = tmp_path / "moh.mol2"
    mp.write_text(_MOL2)

    prm = load_frcmod(str(fp))
    assert prm["bonds"][("c3", "oh")] == (316.70, 1.423)
    assert prm["angles"][("c3", "oh", "ho")] == (47.09, 107.26)
    assert prm["dihedrals"][("h1", "c3", "oh", "ho")] == [
        (0.50 / 3, 0.0, 3.0)]
    assert prm["types"]["oh"] == (16.0, 1.7210, 0.2104)

    mol2 = load_mol2(str(mp))
    assert mol2["names"][0] == "C1"
    assert mol2["bonds"][0] == (0, 1)
    assert abs(sum(mol2["charges"])) < 1e-9

    tmpl, mol2b = register_ligand_frcmod("MOH", str(mp), str(fp))
    assert tmpl["atoms"]["O1"] == ("oh", -0.5988)
    struct = PDBStructure(
        atom_names=mol2b["names"], res_names=["MOH"] * 6,
        res_ids=[1] * 6, chain_ids=["A"] * 6,
        elements=mol2b["elements"], coords=mol2b["coords_nm"])
    path = str(tmp_path / "moh.pdb")
    write_pdb(path, struct)
    sys_ = build_system(path)
    e = float(potential_energy_flat(
        sys_, jnp.asarray(struct.coords.reshape(-1), jnp.float32)))
    assert np.isfinite(e)
    # exact imported charges survive into the built system
    assert np.allclose(sorted(np.asarray(sys_.charges)),
                       sorted(mol2["charges"]), atol=1e-6)


def test_ffxml_import(tmp_path):
    from isokann_tpu.md.importers import load_ffxml

    xml = textwrap.dedent("""\
        <ForceField>
         <AtomTypes>
          <Type name="gaff-c3" class="c3" element="C" mass="12.01"/>
          <Type name="gaff-hc" class="hc" element="H" mass="1.008"/>
         </AtomTypes>
         <Residues>
          <Residue name="LIG">
           <Atom name="C1" type="gaff-c3" charge="-0.4"/>
           <Atom name="H1" type="gaff-hc" charge="0.1"/>
           <Bond atomName1="C1" atomName2="H1"/>
          </Residue>
         </Residues>
         <HarmonicBondForce>
          <Bond class1="c3" class2="hc" length="0.1092" k="282252.8"/>
         </HarmonicBondForce>
         <HarmonicAngleForce>
          <Angle class1="hc" class2="c3" class3="hc" angle="1.8919"
                 k="329.95"/>
         </HarmonicAngleForce>
         <PeriodicTorsionForce>
          <Proper class1="" class2="c3" class3="c3" class4=""
                  periodicity1="3" phase1="0.0" k1="0.6508"/>
         </PeriodicTorsionForce>
         <NonbondedForce coulomb14scale="0.8333" lj14scale="0.5">
          <Atom type="gaff-c3" charge="-0.4" sigma="0.3398" epsilon="0.4577"/>
          <Atom type="gaff-hc" charge="0.1" sigma="0.2600" epsilon="0.0870"/>
         </NonbondedForce>
        </ForceField>
        """)
    p = tmp_path / "lig.xml"
    p.write_text(xml)
    ff = load_ffxml(str(p))
    K, r0 = ff["bonds"][("c3", "hc")]
    assert abs(r0 - 1.092) < 1e-9
    assert abs(K - 282252.8 / (2 * 4.184 * 100)) < 1e-6     # ~337 kcal/A^2
    Ka, t0 = ff["angles"][("hc", "c3", "hc")]
    assert abs(t0 - math.degrees(1.8919)) < 1e-9
    terms = ff["dihedrals"][("X", "c3", "c3", "X")]
    assert terms == [(0.6508 / 4.184, 0.0, 3)]
    m, rmin_half, eps = ff["types"]["gaff-c3"]
    assert abs(rmin_half - 0.3398 * 10 * 2 ** (1 / 6) / 2) < 1e-6
    assert abs(eps - 0.4577 / 4.184) < 1e-6
    assert ff["residues"]["LIG"]["atoms"]["C1"] == ("gaff-c3", -0.4)
