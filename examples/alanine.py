"""Alanine dipeptide quickstart — the reference README workflow
(``README.md:27-37``): default MD config, 100 points x 5 Koopman samples,
100 training episodes, Ramachandran-colored chi, rates, reactive path.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import numpy as np

import isokann_tpu as itk


def main(small=False):
    sim = itk.OpenMMSimulation()        # bundled alanine dipeptide, 0.2 ps lag
    nx, nk = (16, 2) if small else (100, 5)
    iso = itk.Iso(sim=sim, nx=nx, nk=nk, key=0, opt=itk.AdamRegularized())
    iso.run(20 if small else 100)
    print(f"loss {iso.losses[0]:.4f} -> {iso.losses[-1]:.4f}")

    itk.scatter_ramachandran(iso, out="out/alanine_rama.png")
    itk.plot_training(iso, out="out/alanine_training.png")
    print("rates:\n", iso.rates())
    print("chi exit rate:", iso.chi_exit_rate())

    ids = itk.save_reactive_path(iso, sigma=1.0, maxjump=1.0,
                                 out="out/alanine_reactive_path.pdb")
    print(f"reactive path: {len(ids)} frames")

    # adaptive refinement
    iso.run_kde(generations=2 if small else 5, iter=10 if small else 50,
                kde=5)
    print(f"after adaptive: n={len(iso.data)} loss={iso.losses[-1]:.4f}")
    iso.save("out/alanine_iso.pkl")
    return iso


if __name__ == "__main__":
    main()
