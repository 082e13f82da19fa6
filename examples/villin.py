"""Villin headpiece folding — the reference's production config
(``scripts/villin.jl``): implicit solvent, long lag, 1000 initial points,
per generation 30 stratified + 30 KDE resamples, 300 train iterations,
data cutoff 10000, checkpoint every 10 generations.

Pass a villin PDB path (e.g. the reference's ``villin nowater.pdb``); with
``pdb=None`` the HP36 subdomain is built from sequence with the bundled
peptide builder.  ``small=True`` runs a scaled-down smoke version.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import os

import isokann_tpu as itk


HP36 = "MLSDEDFKAVFGMTRSAFANLPLWKQQNLKKEKGLF"


def main(pdb=None, small=False, out="out/villin"):
    os.makedirs(out, exist_ok=True)
    if pdb is None:
        from isokann_tpu.md.fixtures import peptide_pdb
        pdb = peptide_pdb(HP36, f"{out}/hp36.pdb", minimize=True,
                          maxiter=200 if small else 800, implicit="obc2")
    steps = 50 if small else 10_000       # reference lagtime: 20 ns = 1e4 x 2fs
    sim = itk.MDSimulation(pdb=pdb, steps=steps, implicit="obc2",
                           minimize=True,
                           # H-bond SHAKE keeps 2 fs stable at this size
                           # (unconstrained 2 fs heats; see ROADMAP item 6)
                           constraints="HBonds",
                           features=0.5)  # pair features within 0.5 nm
    nx, nk = (8, 1) if small else (1000, 1)
    iso = itk.Iso(sim=sim, nx=nx, nk=nk, key=0, opt=itk.NesterovRegularized())

    generations = 2 if small else 2500
    iters = 10 if small else 300
    cutoff = 100 if small else 10_000
    nresample = 2 if small else 30
    for g in range(generations):
        iso.resample_strat(nresample)
        iso.resample_kde(nresample)
        if len(iso.data) > cutoff:
            iso.data = iso.data[len(iso.data) - cutoff:]
        iso.run(iters)
        print(f"gen {g}: n={len(iso.data)} loss={iso.losses[-1]:.4f} "
              f"simtime={iso.simulationtime():.1f} ps")
        if g % 10 == 0:
            iso.save(f"{out}/iso_gen{g}.pkl")
    iso.save(f"{out}/iso_final.pkl")
    return iso


if __name__ == "__main__":
    import sys
    main(sys.argv[1] if len(sys.argv) > 1 else None, small=True)
