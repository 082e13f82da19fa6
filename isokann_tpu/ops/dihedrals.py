"""Dihedral angles (phi/psi/omega) — batched on device.

TPU-native rebuild of the dihedral utilities in ``src/utils/molutils.jl:16-35``
(vector-algebra dihedral) and the BioStructures-based ``FeaturesAngles``
(``src/utils/features.jl:83-102``): phi/psi index quadruplets are derived
from the topology (see ``isokann_tpu.md.topology``) instead of hardcoding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def dihedral(p, eps=1e-12):
    """Dihedral angle from 4 points; ``p``: (..., 4, 3) -> (...,) radians.

    Uses the atan2 formulation (numerically stable version of the
    reference's acos form, ``src/utils/molutils.jl:16-24``)."""
    p = jnp.asarray(p)
    b1 = p[..., 1, :] - p[..., 0, :]
    b2 = p[..., 2, :] - p[..., 1, :]
    b3 = p[..., 3, :] - p[..., 2, :]
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    m1 = jnp.cross(n1, b2 / (jnp.linalg.norm(b2, axis=-1, keepdims=True) + eps))
    x = jnp.sum(n1 * n2, axis=-1)
    y = jnp.sum(m1 * n2, axis=-1)
    return jnp.arctan2(y, x)


def dihedrals_from_indices(coords, quads):
    """Dihedrals for index quadruplets.

    ``coords``: (..., 3N) flat; ``quads``: (m, 4) int -> (..., m)."""
    coords = jnp.asarray(coords)
    quads = np.asarray(quads)
    batch = coords.shape[:-1]
    xyz = coords.reshape(batch + (-1, 3))
    p = xyz[..., quads.reshape(-1), :].reshape(batch + (len(quads), 4, 3))
    return dihedral(p)


def phi_psi_indices(topology):
    """(phi_quads, psi_quads) for a protein topology.

    phi: C(i-1)-N(i)-CA(i)-C(i); psi: N(i)-CA(i)-C(i)-N(i+1).
    ``topology`` is an ``isokann_tpu.md.topology.Topology``."""
    residues = topology.residues
    phis, psis = [], []

    def find(res, name):
        for idx in res.atom_indices:
            if topology.atom_names[idx] == name:
                return idx
        return None

    for i, res in enumerate(residues):
        N, CA, C = find(res, "N"), find(res, "CA"), find(res, "C")
        prevC = find(residues[i - 1], "C") if i > 0 else None
        nextN = find(residues[i + 1], "N") if i + 1 < len(residues) else None
        if None not in (prevC, N, CA, C):
            phis.append((prevC, N, CA, C))
        if None not in (N, CA, C, nextN):
            psis.append((N, CA, C, nextN))
    return np.asarray(phis, dtype=int), np.asarray(psis, dtype=int)
