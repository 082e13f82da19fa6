"""Topology construction: PDB structure + residue templates -> bond graph,
atom types, charges, and the derived angle/dihedral/improper lists.

Replaces the OpenMM ForceField template matcher used by the reference
(``src/simulators/mopenmm.py:54-76``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from . import amber
from .pdbio import PDBStructure


@dataclass
class Residue:
    name: str
    resid: int
    atom_indices: List[int]


@dataclass
class Topology:
    atom_names: List[str]
    atom_types: List[str]
    charges: np.ndarray           # (n,) elementary charges
    masses: np.ndarray            # (n,) amu
    residues: List[Residue]
    bonds: List[Tuple[int, int]]
    angles: List[Tuple[int, int, int]] = field(default_factory=list)
    propers: List[Tuple[int, int, int, int]] = field(default_factory=list)
    impropers: List[Tuple[int, int, int, int]] = field(default_factory=list)

    @property
    def natoms(self):
        return len(self.atom_names)

    def neighbors(self):
        adj: Dict[int, set] = {i: set() for i in range(self.natoms)}
        for a, b in self.bonds:
            adj[a].add(b)
            adj[b].add(a)
        return adj


# Alternate atom names seen in PDB files -> template names
_ALIASES = {
    ("NME", "C"): "CH3",
    ("NME", "CA"): "CH3",
    ("ACE", "CA"): "CH3",
    ("ACE", "H1"): "HH31", ("ACE", "H2"): "HH32", ("ACE", "H3"): "HH33",
    ("NME", "H1"): "HH31", ("NME", "H2"): "HH32", ("NME", "H3"): "HH33",
}

_TERMINAL_EQUIV = {"HB1": "HB3", "HA1": "HA3", "HG1": "HG3", "HD1": "HD3",
                   "HE1": "HE3", "1H": "H1"}


def _template_atom_name(resname: str, atom: str, template_atoms) -> str:
    if atom in template_atoms:
        return atom
    if (resname, atom) in _ALIASES:
        return _ALIASES[(resname, atom)]
    # old PDB H naming: 1HB2 -> HB21 etc.
    if atom and atom[0].isdigit():
        rot = atom[1:] + atom[0]
        if rot in template_atoms:
            return rot
    if atom in _TERMINAL_EQUIV and _TERMINAL_EQUIV[atom] in template_atoms:
        return _TERMINAL_EQUIV[atom]
    raise KeyError(f"atom {atom} not found in template {resname} "
                   f"(has {sorted(template_atoms)})")


def build_topology(struct: PDBStructure) -> Topology:
    """Match each residue against the Amber templates and derive the full
    bonded topology (bonds, angles, propers, impropers)."""
    # group atoms into residues by (chain, resid)
    residues: List[Residue] = []
    current = None
    for i in range(struct.natoms):
        tag = (struct.chain_ids[i], struct.res_ids[i], struct.res_names[i])
        if current is None or tag != current:
            residues.append(Residue(struct.res_names[i], struct.res_ids[i], []))
            current = tag
        residues[-1].atom_indices.append(i)

    n = struct.natoms
    atom_types = [""] * n
    charges = np.zeros(n)
    masses = np.zeros(n)
    bonds: List[Tuple[int, int]] = []

    for ri, res in enumerate(residues):
        if res.name not in amber.RESIDUES:
            raise KeyError(f"no residue template for {res.name}; add it to "
                           f"isokann_tpu.md.amber.RESIDUES")
        tmpl = amber.RESIDUES[res.name]
        name_to_idx = {}
        for idx in res.atom_indices:
            tname = _template_atom_name(res.name, struct.atom_names[idx],
                                        tmpl["atoms"])
            if tname in name_to_idx:
                raise ValueError(f"duplicate atom {tname} in residue {res.name}")
            name_to_idx[tname] = idx
            t, q = tmpl["atoms"][tname]
            atom_types[idx] = t
            charges[idx] = q
            masses[idx] = amber.mass(t)
        missing = set(tmpl["atoms"]) - set(name_to_idx)
        if missing:
            raise ValueError(f"residue {res.name} missing atoms {sorted(missing)}")
        for a, b in tmpl["bonds"]:
            bonds.append((name_to_idx[a], name_to_idx[b]))
        # peptide bond to previous residue: prev C -- this N
        if ri > 0:
            prev = residues[ri - 1]
            prev_tmpl_atoms = {
                _template_atom_name(prev.name, struct.atom_names[idx],
                                    amber.RESIDUES[prev.name]["atoms"]): idx
                for idx in prev.atom_indices}
            if "C" in prev_tmpl_atoms and "N" in name_to_idx:
                bonds.append((prev_tmpl_atoms["C"], name_to_idx["N"]))

    top = Topology(
        atom_names=list(struct.atom_names),
        atom_types=atom_types,
        charges=charges,
        masses=masses,
        residues=residues,
        bonds=bonds,
    )
    _derive_bonded_terms(top)
    return top


def _derive_bonded_terms(top: Topology):
    """Enumerate angles, proper dihedrals, impropers from the bond graph."""
    adj = top.neighbors()

    angles = []
    for j in range(top.natoms):
        nb = sorted(adj[j])
        for ai in range(len(nb)):
            for ci in range(ai + 1, len(nb)):
                angles.append((nb[ai], j, nb[ci]))
    top.angles = angles

    propers = []
    for (j, k) in top.bonds:
        for i in sorted(adj[j]):
            if i == k:
                continue
            for l in sorted(adj[k]):
                if l == j or l == i:
                    continue
                propers.append((i, j, k, l))
    top.propers = propers

    # impropers: each trigonal center (C with O, peptide N with H)
    impropers = []
    types = top.atom_types
    for c in range(top.natoms):
        nb = sorted(adj[c])
        if len(nb) != 3:
            continue
        tc = types[c]
        if tc == "C":
            # carbonyl / carboxyl: improper keeps O in the plane (X-X-C-O)
            os_ = [a for a in nb if types[a] in ("O", "O2")]
            rest = [a for a in nb if types[a] not in ("O", "O2")]
            if len(os_) == 1:
                impropers.append((rest[0], rest[1], c, os_[0]))
            elif len(os_) == 2:  # carboxylate X-O2-C-O2
                impropers.append((rest[0], os_[0], c, os_[1]))
        elif tc in ("N", "N2", "NA"):
            hs = [a for a in nb if types[a].startswith("H")]
            rest = [a for a in nb if not types[a].startswith("H")]
            if len(hs) == 1 and len(rest) == 2:
                impropers.append((rest[0], rest[1], c, hs[0]))
    top.impropers = impropers
