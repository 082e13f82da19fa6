"""Large explicit-solvent system through the O(n) cell-list neighbor
engine: an 11-residue peptide in a TIP3P box (~7700 atoms).

Beyond ~4000 atoms ``build_system`` drops the dense (n, n) pair matrices
and every force/energy call routes through ``md/neighbor.py`` — the
scatter-free cell-list sweep (Pallas VMEM pair-block kernel on TPU),
analytic forces, rigid-water constraints.  This extends the reference,
whose practical explicit-solvent sizes end where OpenMM's all-pairs
CutoffPeriodic becomes the bottleneck (``src/simulators/mopenmm.py:59-66``).

Measured on 1x TPU v5e (round 2, column-plan auto geometry): 250
walker-steps/s at 16 walkers (43 ns/day aggregate at 2 fs; 2.5-2.7x the
round-1 plan on the same runtime).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np

import isokann_tpu as itk
from isokann_tpu.md.fixtures import peptide_pdb


def main(sequence="AQGSAELAKVM", small=True, out="out/solvated_peptide"):
    os.makedirs(out, exist_ok=True)
    if small:                   # smoke variant: smaller box, engine forced on
        sequence = sequence[:4]
    pdb = peptide_pdb(sequence, f"{out}/peptide.pdb", minimize=True,
                      maxiter=150 if small else 300)
    sim = itk.MDSimulation(pdb=pdb, addwater=True,
                           padding=0.7 if small else 1.0,
                           steps=10 if small else 100,
                           dense_pairs=False)
    print(f"{sim.natoms} atoms, box {sim.system.box}, "
          f"dense_pairs={sim.system.dense_pairs}")
    assert not sim.system.dense_pairs          # neighbor engine active

    # equilibrate briefly (the lattice water relaxes within a few ps)
    t0 = time.time()
    x0 = sim.coords[None, :]
    xs = sim.propagate(np.tile(x0, (4, 1)), 1, steps=40 if small else 200)
    print(f"equilibration: {time.time() - t0:.1f}s, "
          f"finite={np.isfinite(np.asarray(xs)).all()}")

    nx, nk = (8, 2) if small else (50, 4)
    iso = itk.Iso(sim=sim, nx=nx, nk=nk, key=0)
    iso.run(5 if small else 200)
    print(f"loss {iso.losses[0]:.3f} -> {iso.losses[-1]:.4f}")
    iso.save(f"{out}/iso.pkl")
    return iso


if __name__ == "__main__":
    main(small="--full" not in sys.argv)
