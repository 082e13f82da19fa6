"""Protein-ligand system (6O0K + LBM inhibitor): ligand auto-
parameterization end to end.

The reference builds these systems with openmmforcefields (GAFF-2.11 +
MMFF94 charges, ``src/simulators/mopenmm.py:30-50``) from
``data/chris/6O0K_*.pdb``.  This rebuild ships two equivalent paths:

- ``md.importers.register_ligand_frcmod`` / ``register_ligand_ffxml``:
  exact parameters when antechamber/openmmforcefields output files exist;
- ``md.ligand.parameterize_ligand`` (used here): offline perception —
  CONECT/distance bonds, ring + aromaticity detection, bond orders from
  crystal geometry, hydrogen addition, GAFF-class generic parameters and
  Gasteiger (PEOE) charges.

Usage: python examples/protein_ligand.py [path/to/complex.pdb] [LIGRES]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REF = "/root/reference/data/chris/6O0K_ligand-only.pdb"


def main(pdb=None, ligres="LBM", steps=100, out="out/protein_ligand"):
    import jax
    import jax.numpy as jnp
    import isokann_tpu as itk
    from isokann_tpu.md.ligand import parameterize_ligand
    from isokann_tpu.md.pdbio import read_pdb, write_pdb, PDBStructure
    from isokann_tpu.md.system import build_system
    from isokann_tpu.md.forces import potential_energy_flat
    from isokann_tpu.md.minimize import minimize_energy

    pdb = pdb or REF
    if not os.path.exists(pdb):
        print(f"no input PDB at {pdb} (pass one explicitly)")
        return
    os.makedirs(out, exist_ok=True)

    # 1) perceive + register the ligand (adds hydrogens)
    tmpl, lig = parameterize_ligand(ligres, pdb, residue_filter=ligres)
    print(f"{ligres}: {lig.natoms} atoms after H addition, net charge "
          f"{sum(q for _, q in tmpl['atoms'].values()):+.3f}")

    # 2) splice the protonated ligand back into the complex
    s = read_pdb(pdb)
    keep = [i for i in range(s.natoms) if s.res_names[i] != ligres]
    full = PDBStructure(
        atom_names=[s.atom_names[i] for i in keep] + lig.atom_names,
        res_names=[s.res_names[i] for i in keep] + [ligres] * lig.natoms,
        res_ids=[s.res_ids[i] for i in keep] + [9999] * lig.natoms,
        chain_ids=[s.chain_ids[i] for i in keep] + ["L"] * lig.natoms,
        elements=[s.elements[i] for i in keep] + lig.elements,
        coords=np.concatenate([s.coords[keep], lig.coords]))
    print(f"complex: {full.natoms} atoms")

    # 3) build + minimize
    sysb = build_system(full)
    x0 = jnp.asarray(full.coords.reshape(-1), jnp.float32)
    e0 = float(potential_energy_flat(sysb, x0))
    x1 = minimize_energy(lambda z: potential_energy_flat(sysb, z), x0,
                         maxiter=300)
    e1 = float(potential_energy_flat(sysb, x1))
    print(f"minimized: {e0:.0f} -> {e1:.0f} kJ/mol")

    # 4) propagate through the standard MDSimulation entry
    cpath = os.path.join(out, "complex_min.pdb")
    write_pdb(cpath, full, coords=np.asarray(x1).reshape(-1, 3))
    sim = itk.MDSimulation(pdb=cpath, steps=steps)
    ys = sim.propagate(np.asarray(x1)[None, :], 2,
                       key=jax.random.PRNGKey(0))
    print(f"propagated {steps} steps x 2 walkers: "
          f"finite={np.isfinite(np.asarray(ys)).all()}")
    write_pdb(os.path.join(out, "complex_end.pdb"), full,
              coords=np.asarray(ys)[0, 0].reshape(-1, 3))
    print("wrote", out)


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
