"""Molecular utilities: dihedral convenience, RMSD reaction coordinates,
standard form.

Rebuild of parts of ``src/utils/molutils.jl``: ``phi``/``psi``
(``:27-35``), ``standardform``, ``ReactionCoordsRMSD``/``ca_rmsd``
(``:248-284``), ``getpdb`` RCSB download (``src/utils/plots.jl:325-330``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops.align import aligned_rmsd, centered, align
from ..ops.dihedrals import dihedrals_from_indices, phi_psi_indices


def phi_psi(coords, pdb):
    """(phi, psi) arrays for frames ``coords`` (..., 3N) given a topology
    PDB (replaces the reference's hardcoded dipeptide index sets,
    ``src/utils/molutils.jl:27-35``)."""
    from ..md.pdbio import read_pdb
    from ..md.topology import build_topology

    top = build_topology(read_pdb(pdb))
    phis, psis = phi_psi_indices(top)
    return (np.asarray(dihedrals_from_indices(coords, phis)),
            np.asarray(dihedrals_from_indices(coords, psis)))


def standardform(xs, pdb=None):
    """Align all frames to the first centered frame — canonical orientation
    (reference ``standardform``, ``src/utils/molutils.jl``)."""
    xs = jnp.atleast_2d(jnp.asarray(xs))
    ref = centered(xs[0].reshape(-1, 3)).reshape(-1)
    return align(ref, xs)


def aligned_rmsd_to(ref, xs, atoms=None):
    """Aligned RMSD of each frame in xs to ref, optionally on a subset of
    atoms."""
    ref = np.asarray(ref).reshape(-1, 3)
    xs = np.asarray(xs).reshape(len(np.atleast_2d(xs)), -1, 3)
    if atoms is not None:
        ref = ref[atoms]
        xs = xs[:, atoms]
    return np.asarray(aligned_rmsd(jnp.asarray(ref),
                                   jnp.asarray(xs), flat=False))


@dataclass
class ReactionCoordsRMSD:
    """RMSD-to-reference reaction coordinates
    (reference ``ReactionCoordsRMSD``, ``src/utils/molutils.jl:248-264``)."""

    refs: Any                  # (k, 3N) reference structures
    atoms: Any = None          # optional atom subset

    def __call__(self, coords):
        coords = np.atleast_2d(np.asarray(coords))
        out = np.stack([aligned_rmsd_to(r, coords, self.atoms)
                        for r in np.atleast_2d(self.refs)], axis=-1)
        return out


def ca_rmsd(xs, ref_xs, pdb_x, pdb_ref, residues=None):
    """Cross-topology C-alpha RMSD (reference ``ca_rmsd``,
    ``src/utils/molutils.jl:266-284``): match CA atoms of two different
    topologies (optionally restricted to shared residue ids) and compute
    the aligned RMSD of each frame in xs to ref_xs."""
    from ..md.pdbio import read_pdb

    sx = read_pdb(pdb_x)
    sr = read_pdb(pdb_ref)

    def ca_map(s):
        return {s.res_ids[i]: i for i in range(s.natoms)
                if s.atom_names[i] == "CA"}

    mx, mr = ca_map(sx), ca_map(sr)
    shared = sorted(set(mx) & set(mr))
    if residues is not None:
        shared = [r for r in shared if r in set(residues)]
    ix = [mx[r] for r in shared]
    ir = [mr[r] for r in shared]

    xs = np.atleast_2d(np.asarray(xs)).reshape(-1, sx.natoms, 3)[:, ix]
    ref = np.asarray(ref_xs).reshape(sr.natoms, 3)[ir]
    return np.asarray(aligned_rmsd(jnp.asarray(ref), jnp.asarray(xs),
                                   flat=False))


def getpdb(pdbid: str, path=None):
    """Download a PDB from RCSB (reference ``getpdb``,
    ``src/utils/plots.jl:325-330``).  Requires network access."""
    import urllib.request
    path = path or f"{pdbid}.pdb"
    url = f"https://files.rcsb.org/download/{pdbid}.pdb"
    try:
        urllib.request.urlretrieve(url, path)
    except Exception as e:
        raise RuntimeError(
            f"could not download {pdbid} from RCSB ({e}); this environment "
            f"may have no network access — provide a local PDB instead") from e
    return path
