"""Coordinate/trajectory saving helpers.

Rebuild of ``savecoords``/``saveextrema`` (``src/iso.jl:379-399``) and the
trajectory I/O surface of ``src/utils/molutils.jl:75-128`` without
mdtraj/Chemfiles: multi-model PDB and .npy trajectories.
"""

from __future__ import annotations

import os

import numpy as np


def save_trajectory(path, traj, top=None, box=None, dt_ps=0.002):
    """Save (frames, 3N) coordinates: .pdb (needs ``top``), .npy, or
    .dcd (CHARMM/NAMD binary via the native library — readable by VMD,
    mdtraj, MDAnalysis; optional orthorhombic ``box`` (3,) [nm])."""
    traj = np.atleast_2d(np.asarray(traj))
    ext = os.path.splitext(path)[1].lower()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if ext == ".npy":
        np.save(path, traj)
    elif ext == ".pdb":
        if top is None:
            raise ValueError("PDB output needs a topology (top=pdbfile)")
        from ..md.pdbio import write_pdb_traj
        write_pdb_traj(path, top, traj)
    elif ext == ".dcd":
        from ..native import dcd_write_native
        dcd_write_native(path, traj.reshape(traj.shape[0], -1, 3),
                         box=box, dt_ps=dt_ps)
    else:
        raise ValueError(f"unsupported trajectory format {ext}")
    return path


def load_trajectory(path, stride=1):
    """Load a trajectory as (frames, 3N): .npy, .pdb (multi-model), .dcd."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        return np.load(path)[::stride]
    if ext == ".pdb":
        from ..md.pdbio import read_pdb_traj
        return read_pdb_traj(path)[::stride]
    if ext == ".dcd":
        from ..native import dcd_read_native
        xyz, _ = dcd_read_native(path)
        return xyz.reshape(xyz.shape[0], -1)[::stride]
    raise ValueError(f"unsupported trajectory format {ext}")


def savecoords(path, iso, coords=None, sorted=True, aligned=True):
    """Save coordinates using the iso's molecule as template; optionally
    sorted by chi and successively aligned
    (reference ``savecoords``, ``src/iso.jl:379-391``)."""
    from ..ops.align import aligntrajectory

    coords = np.asarray(iso.data.coords if coords is None else coords)
    if sorted:
        chi = np.asarray(iso.chicoords(coords)).ravel()
        coords = coords[np.argsort(chi)]
    if aligned:
        coords = np.asarray(aligntrajectory(coords))
    return save_trajectory(path, coords, top=iso.data.pdbfile)


def saveextrema(path, iso):
    """Save the two chi-extremal configurations
    (reference ``saveextrema``, ``src/iso.jl:393-399``)."""
    chi = np.asarray(iso.chis()).ravel()
    coords = np.asarray(iso.data.coords)
    sel = coords[[int(np.argmin(chi)), int(np.argmax(chi))]]
    return save_trajectory(path, sel, top=iso.data.pdbfile)
