"""VGVAPG hexapeptide with extrapolation-adaptive sampling — the
reference's ``scripts/vgvapg.jl`` config (500-step lag, nx=100 x nk=10,
100 + 10x100 adaptive iterations with chi-extrapolation).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import isokann_tpu as itk
from isokann_tpu.md.fixtures import peptide_pdb


def main(small=False):
    pdb = peptide_pdb("VGVAPG", "out/vgvapg.pdb", minimize=True)
    steps = 100 if small else 500
    nx, nk = (20, 2) if small else (100, 10)
    sim = itk.MDSimulation(pdb=pdb, steps=steps)
    iso = itk.Iso(sim=sim, nx=nx, nk=nk, key=0, opt=itk.AdamRegularized())
    iso.run(20 if small else 100)

    generations = 2 if small else 10
    for g in range(generations):
        itk.addextrapolates(iso, 1 if small else 5, stepsize=0.01, steps=10,
                            minimize=not small)
        iso.run(20 if small else 100)
        print(f"gen {g}: n={len(iso.data)} loss={iso.losses[-1]:.4f}")

    itk.plot_training(iso, out="out/vgvapg_training.png")
    iso.save("out/vgvapg_iso.pkl")
    return iso


if __name__ == "__main__":
    main()
