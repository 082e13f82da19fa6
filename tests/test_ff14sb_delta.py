"""ff14SB delta enumeration (VERDICT r2: builtin-FF exactness).

The embedded tables are ff99SB-class; exact ff14SB differs ONLY in
(a) the refit side-chain torsions of the 17 residues with side-chain
dihedrals and (b) the phi'/psi' backbone-coupling torsions (see
``tests/data/parm_fixture.py`` FF14SB_*).  This module makes that claim
machine-checkable by enumerating, for every refit residue, the exact
torsion-table entries (type quadruples + implemented barrier/phase/
periodicity) that an exact ff14SB import would override, and pinning
them in ``tests/data/ff14sb_refit_torsions.json``.

The exact frcmod.ff14SB values are unavailable in this environment (no
Amber/OpenMM install, no network); users needing them run tleap/OpenMM
artifacts through ``MDSimulation.from_system`` / prmtop import /
``register_forcefield_ffxml`` — paths tested to carry external values
verbatim (tests/test_ffxml_forcefield.py, tests/test_amber_import.py).

Regenerate the pin after intentional table changes:
    python tests/test_ff14sb_delta.py --regen

Reference counterpart: ``/root/reference/src/simulators/mopenmm.py:54``
(default ``amber14-all``).
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
import parm_fixture as fx                                  # noqa: E402

from isokann_tpu.md import amber                           # noqa: E402
from isokann_tpu.md.fixtures import build_peptide          # noqa: E402
from isokann_tpu.md.topology import build_topology         # noqa: E402

PIN = os.path.join(os.path.dirname(__file__), "data",
                   "ff14sb_refit_torsions.json")

THREE2ONE = {"ARG": "R", "ASN": "N", "ASP": "D", "CYS": "C", "GLN": "Q",
             "GLU": "E", "HIS": "H", "ILE": "I", "LEU": "L", "LYS": "K",
             "MET": "M", "PHE": "F", "SER": "S", "THR": "T", "TRP": "W",
             "TYR": "Y", "VAL": "V"}

# backbone + terminal-cap atom names; everything else in the central
# residue is side chain
BACKBONE = {"N", "CA", "C", "O", "H", "HA", "H1", "H2", "H3", "OXT",
            "HA2", "HA3"}


def refit_torsions(resname):
    """{canonical type quadruple: [(pk_total, phase_deg, n), ...]} for
    every proper whose middle bond touches the residue's side chain."""
    one = THREE2ONE[resname]
    seq = "HID" if resname == "HIS" else one
    struct = build_peptide([seq] if resname == "HIS" else seq, capped=True)
    top = build_topology(struct)
    names, types = top.atom_names, top.atom_types
    res = [r for r in (struct.res_names[i] for i in range(len(names)))]

    def sidechain(a):
        return res[a] not in ("ACE", "NME") and names[a] not in BACKBONE

    out = {}
    for (i, j, k, l) in top.propers:
        if not (sidechain(j) or sidechain(k)):
            continue
        quad = (types[i], types[j], types[k], types[l])
        quad = min(quad, quad[::-1])
        params = amber.lookup_dihedral(*quad)
        out["-".join(quad)] = sorted(
            [float(pk), float(ph), int(n)] for (pk, ph, n) in params)
    return out


def build_delta():
    return {rn: refit_torsions(rn) for rn in fx.FF14SB_REFIT_RESIDUES}


def test_refit_residue_list_is_all_minus_ala_gly_pro():
    standard = {"ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY",
                "HIS", "ILE", "LEU", "LYS", "MET", "PHE", "PRO", "SER",
                "THR", "TRP", "TYR", "VAL"}
    assert set(fx.FF14SB_REFIT_RESIDUES) == standard - {"ALA", "GLY", "PRO"}


def test_inherited_term_classes_are_confidence_tracked():
    # the claim "bonds/angles/LJ/charges/impropers are ff14SB-exact"
    # reduces to the parm99/ff94 provenance tests: assert those fixture
    # tables exist and cover the refit residues' charges exactly
    assert set(fx.FF14SB_INHERITED_EXACT) == {
        "bonds", "angles", "lj", "masses", "charges", "impropers"}
    for rn in fx.FF14SB_REFIT_RESIDUES:
        key = "HID" if rn == "HIS" else rn
        assert key in fx.CHARGES_HIGH or key in amber.RESIDUES


def test_new_type_aliases_map_to_known_lj():
    for alias, base in fx.FF14SB_NEW_TYPES.items():
        assert base in amber.ATOM_TYPES
        assert alias not in amber.ATOM_TYPES  # embedded tables are parm99


@pytest.mark.parametrize("resname", fx.FF14SB_REFIT_RESIDUES)
def test_refit_torsions_resolve_without_fallback(resname):
    tors = refit_torsions(resname)
    assert tors, f"{resname}: no side-chain torsions found"
    for quad, params in tors.items():
        assert params, f"{resname} {quad}: empty parameter list"


def test_delta_pinned():
    """The full per-residue enumeration matches the committed pin: these
    are precisely the constants exact ff14SB would override."""
    delta = build_delta()
    with open(PIN) as f:
        pinned = json.load(f)
    assert delta == pinned, (
        "ff14SB-overridable torsion set changed; regenerate with "
        "`python tests/test_ff14sb_delta.py --regen` if intentional")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        delta = build_delta()
        with open(PIN, "w") as f:
            json.dump(delta, f, indent=1, sort_keys=True)
        n = sum(len(v) for v in delta.values())
        print(f"pinned {n} type-quadruples over {len(delta)} residues "
              f"to {PIN}")
