"""DNA/RNA force-field support: template matching, parameter coverage,
phosphodiester linking, base impropers, and end-to-end build/minimize.

Reference counterpart: nucleic acids enter the reference through OpenMM's
amber14-all.xml (``src/simulators/mopenmm.py:55-76``); this rebuild embeds
the parm94/parm99-class nucleic parameter set (``isokann_tpu/md/amber.py``)
next to the protein tables.
"""

import os
import sys
import warnings

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
import parm_fixture as fx                                  # noqa: E402

from isokann_tpu.md import amber                           # noqa: E402
from isokann_tpu.md.fixtures import build_nucleic          # noqa: E402
from isokann_tpu.md.topology import build_topology         # noqa: E402
from isokann_tpu.md.system import build_system             # noqa: E402


# --------------------------------------------------------------------------
# templates & charges
# --------------------------------------------------------------------------

def test_templates_registered():
    for n in ("DA", "DC", "DG", "DT", "RA", "RC", "RG", "RU"):
        for suffix in ("", "5", "3", "N"):
            assert n + suffix in amber.RESIDUES, n + suffix


def test_interior_charge_sums_exact():
    """ff94 nucleic RESP sets sum exactly to -1 (phosphate); machine-
    precision closure is evidence the transcription is self-consistent."""
    for n in sorted(amber.NUCLEIC_RESIDUES):
        t = amber.RESIDUES[n]
        s = sum(q for _, q in t["atoms"].values())
        assert abs(s - t["formal_charge"]) < 1e-9, (n, s)


def test_spot_charges_survive_normalization():
    """High-confidence ff94 values must be bit-exact after import-time
    normalization -- proves the normalizer did not touch the interior
    nucleotide templates (i.e. the raw sums closed by themselves)."""
    for (res, atom), q in fx.NUCLEIC_CHARGE_SPOTS.items():
        t, got = amber.RESIDUES[res]["atoms"][atom]
        assert abs(got - q) < 1e-9, (res, atom, got, q)


def test_terminal_variants_close_and_keep_base_charges():
    for n in sorted(amber.NUCLEIC_RESIDUES):
        base = amber.RESIDUES[n]["atoms"]
        for suffix, formal in (("5", 0), ("3", -1), ("N", 0)):
            t = amber.RESIDUES[n + suffix]
            s = sum(q for _, q in t["atoms"].values())
            assert abs(s - formal) < 1e-9, (n + suffix, s)
            assert t["formal_charge"] == formal
            # the terminal residual is closed over the sugar only: base
            # (unprimed) atom charges match the interior template exactly
            for a, (ty, q) in t["atoms"].items():
                if "'" in a or a in ("P", "OP1", "OP2"):
                    continue
                assert abs(q - base[a][1]) < 1e-9, (n + suffix, a)


# --------------------------------------------------------------------------
# topology: matching, linking, impropers
# --------------------------------------------------------------------------

def test_strand_matching_and_linkage():
    s = build_nucleic("ACGT")
    top = build_topology(s)
    assert [r.name for r in top.residues] == ["DA5", "DC", "DG", "DT3"]
    assert abs(top.charges.sum() + 3.0) < 1e-6
    # exactly one O3'-P bond per junction
    links = 0
    for (i, j) in top.bonds:
        pair = {top.atom_names[i], top.atom_names[j]}
        ri, rj = None, None
        for r in top.residues:
            if i in r.atom_indices:
                ri = r.resid
            if j in r.atom_indices:
                rj = r.resid
        if pair == {"O3'", "P"} and ri != rj:
            links += 1
    assert links == 3


def test_rna_single_letter_names_and_nucleoside():
    s = build_nucleic("A", rna=True)
    assert s.res_names[0] == "A"
    top = build_topology(s)
    assert top.residues[0].name == "RAN"
    assert "HO2'" in top.atom_names and "HO5'" in top.atom_names
    assert abs(top.charges.sum()) < 1e-6


def test_v2_atom_name_aliases():
    """PDB v2 naming (stars, O1P/O2P, H5'1, thymine C5M) resolves onto the
    v3 templates."""
    s = build_nucleic("TA")
    v3_to_v2 = {"OP1": "O1P", "OP2": "O2P", "H5'": "H5'1", "H5''": "H5'2",
                "H2'": "H2'1", "H2''": "H2'2", "C7": "C5M",
                "H71": "H51", "H72": "H52", "H73": "H53",
                "HO5'": "H5T", "HO3'": "H3T",
                "O5'": "O5*", "C5'": "C5*", "C4'": "C4*", "O4'": "O4*",
                "C1'": "C1*", "C2'": "C2*", "C3'": "C3*", "O3'": "O3*",
                "H1'": "H1*", "H3'": "H3*", "H4'": "H4*"}
    s.atom_names = [v3_to_v2.get(a, a) for a in s.atom_names]
    top = build_topology(s)
    assert [r.name for r in top.residues] == ["DT5", "DA3"]


def _improper_types(top):
    out = []
    t = top.atom_types
    for (i, j, c, l) in top.impropers:
        out.append(((t[i], t[j], t[c], t[l]),
                    amber.lookup_improper(t[i], t[j], t[c], t[l])))
    return out

def test_base_impropers_generated():
    top = build_topology(build_nucleic("ACGT"))
    imps = _improper_types(top)
    # glycosidic planarity at every base
    glyc = [k for k, p in imps if k[2] == "N*" and k[3] == "CT"
            and p == (1.0, 180.0, 2)]
    assert len(glyc) == 4
    # exocyclic amine attachment (A, C, G) with the N2 in the 4th slot
    amine = [k for k, p in imps if k[2] == "CA" and k[3] == "N2"
             and p == (1.1, 180.0, 2)]
    assert len(amine) == 3
    # thymine C5 methyl attachment
    thy = [k for k, p in imps if k[2] == "CM" and k[3] == "CT"
           and p == (1.1, 180.0, 2)]
    assert len(thy) == 1
    # carbonyl planarity at each base C=O (C:1, G:1, T:2)
    carb = [k for k, p in imps if k[2] == "C" and p == (10.5, 180.0, 2)]
    assert len(carb) == 4


# --------------------------------------------------------------------------
# parameter coverage: zero lookup fallbacks for every residue class
# --------------------------------------------------------------------------

def _build_no_warn(seq, rna):
    struct = build_nucleic(seq, rna=rna)
    amber._warned.clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sys_ = build_system(struct, method="NoCutoff")
    msgs = [str(x.message) for x in w
            if "parameters for" in str(x.message)
            or "fallback" in str(x.message)]
    return sys_, msgs


@pytest.mark.parametrize("seq,rna", [
    ("AAA", False), ("CCC", False), ("GGG", False), ("TTT", False),
    ("AAA", True), ("CCC", True), ("GGG", True), ("UUU", True),
])
def test_no_fallback_trinucleotide(seq, rna):
    """5'-terminal, interior, and 3'-terminal templates of every base build
    with zero parameter-lookup fallbacks."""
    sys_, msgs = _build_no_warn(seq, rna)
    assert not msgs, f"fallback parameters hit for {seq}: {msgs}"
    q = float(np.sum(np.asarray(sys_.charges)))
    assert abs(q + 2.0) < 1e-4     # two phosphates


# --------------------------------------------------------------------------
# end to end: minimization closes the NeRF ring seams; dynamics-grade
# geometry comes out
# --------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("seq,rna", [("AT", False), ("GC", True)])
def test_minimize_dinucleotide(seq, rna):
    import jax.numpy as jnp
    from isokann_tpu.md.forces import potential_energy_flat
    from isokann_tpu.md.minimize import minimize_energy

    struct = build_nucleic(seq, rna=rna)
    sysm = build_system(struct, method="NoCutoff")
    x0 = jnp.asarray(struct.coords.reshape(-1), jnp.float32)
    x = minimize_energy(lambda z: potential_energy_flat(sysm, z), x0,
                        maxiter=1500)
    e = float(potential_energy_flat(sysm, x))
    assert np.isfinite(e) and e < 0.0
    top = build_topology(struct)
    xyz = np.asarray(x).reshape(-1, 3)
    devs = []
    for (i, j) in top.bonds:
        r = np.linalg.norm(xyz[i] - xyz[j])
        _, r0 = amber.lookup_bond(top.atom_types[i], top.atom_types[j])
        devs.append(abs(r - r0 * 0.1))
    assert max(devs) < 0.01, f"max bond deviation {max(devs)*10:.3f} A"


@pytest.mark.slow
def test_solvated_dna_pme_neutralized():
    """solvate() neutralizes the phosphate charge with Na+ and the PME
    system builds with finite energy -- the explicit-solvent production
    path works for nucleic solutes unchanged."""
    import jax.numpy as jnp
    from isokann_tpu.md.solvate import solvate
    from isokann_tpu.md.forces import potential_energy_flat

    solv = solvate(build_nucleic("AT"), padding=0.7)
    assert sum(1 for r in solv.res_names if r == "NA") == 1
    sysm = build_system(solv, method="PME")
    q = float(np.sum(np.asarray(sysm.charges)))
    assert abs(q) < 1e-4
    e = float(potential_energy_flat(
        sysm, jnp.asarray(solv.coords.reshape(-1), jnp.float32)))
    assert np.isfinite(e)


def test_pdb_roundtrip(tmp_path):
    from isokann_tpu.md.pdbio import write_pdb, read_pdb

    struct = build_nucleic("ACGU", rna=True)
    path = str(tmp_path / "rna.pdb")
    write_pdb(path, struct)
    back = read_pdb(path)
    top = build_topology(back)
    assert [r.name for r in top.residues] == ["RA5", "RC", "RG", "RU3"]
    assert np.allclose(back.coords, struct.coords, atol=1e-3)
