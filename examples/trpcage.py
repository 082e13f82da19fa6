"""Trp-cage miniprotein with multidimensional chi — the reference's
``scripts/trpcage.jl`` config (implicit solvent, 100-step lag, nx=100 x
nk=8, adaptive generations with stratified resampling, data cutoff 2000).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import isokann_tpu as itk
from isokann_tpu.md.fixtures import peptide_pdb

TC5B = "NLYIQWLKDGGPSSGRPPPS"


def main(small=False, nout=2):
    pdb = peptide_pdb(TC5B, "out/trpcage.pdb", minimize=True,
                      maxiter=1500, implicit="obc2")
    sim = itk.MDSimulation(pdb=pdb, steps=20 if small else 100,
                           implicit="obc2")
    nx, nk = (12, 2) if small else (100, 8)
    iso = itk.Iso(sim=sim, nx=nx, nk=nk, nout=nout, key=0,
                  opt=itk.AdamRegularized())

    generations = 2 if small else 1000
    iters = 20 if small else 500
    cutoff = 200 if small else 2000
    for g in range(generations):
        try:
            iso.run(iters)
        except itk.DomainError:
            print(f"gen {g}: degenerate target, resampling")
        iso.resample_strat(3)
        if len(iso.data) > cutoff:
            iso.data = iso.data[len(iso.data) - cutoff:]
        print(f"gen {g}: n={len(iso.data)} loss={iso.losses[-1]:.4f}")

    iso.save("out/trpcage_iso.pkl")
    return iso


if __name__ == "__main__":
    main()
