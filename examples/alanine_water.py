"""Alanine dipeptide in explicit TIP3P water — the reference's
``OpenMMSimulation(addwater=true)`` configuration
(``src/simulators/openmm.jl:106``, ``src/simulators/mopenmm.py:59-66``):
solvated box with counterions, rigid water, CutoffPeriodic reaction
field, ISOKANN on solute pair features.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import numpy as np

import isokann_tpu as itk


def main(small=True, out="out/alanine_water"):
    os.makedirs(out, exist_ok=True)
    sim = itk.MDSimulation(addwater=True, padding=0.8, steps=100,
                           minimize=True)
    nwat = sum(1 for r in sim.structure.res_names if r == "HOH") // 3
    print(f"solvated: {sim.natoms} atoms, {nwat} waters, box {sim.system.box}")

    nx, nk = (20, 2) if small else (100, 5)
    iso = itk.Iso(sim=sim, nx=nx, nk=nk, key=0)
    iso.run(20 if small else 100)
    print(f"loss {iso.losses[0]:.3f} -> {iso.losses[-1]:.4f}")

    chi = np.asarray(iso.chis()).ravel()
    print(f"chi range [{chi.min():.3f}, {chi.max():.3f}]")
    iso.save(f"{out}/iso.pkl")
    return iso


if __name__ == "__main__":
    main(small="--full" not in sys.argv)
