"""DNA dinucleotide (ApT) ISOKANN run — beyond-reference capability.

The reference reaches nucleic acids only implicitly through OpenMM's
amber14-all.xml (``src/simulators/mopenmm.py:55-76``) and ships no DNA
config; this example exercises the embedded parm94/99 nucleic force field
(``isokann_tpu/md/amber.py``) end to end: NeRF strand build -> minimize ->
implicit-solvent MD bursts -> chi training -> adaptive sampling.

The slow coordinate of a flexible single-stranded dinucleotide is the
base-stacking/unstacking transition; chi separates stacked from extended
conformers.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import isokann_tpu as itk
from isokann_tpu.md.fixtures import build_nucleic
from isokann_tpu.md.pdbio import write_pdb


def main(small=False):
    os.makedirs("out", exist_ok=True)
    pdb = "out/dna_at.pdb"
    write_pdb(pdb, build_nucleic("AT"))

    steps = 100 if small else 500          # 0.2 / 1 ps lag at 2 fs
    nx, nk = (16, 2) if small else (100, 5)
    sim = itk.MDSimulation(pdb=pdb, steps=steps, step=0.002,
                           implicit="obc2", minimize=True,
                           constraints="HBonds")
    iso = itk.Iso(sim=sim, nx=nx, nk=nk, key=0, opt=itk.AdamRegularized())
    iso.run(20 if small else 200)

    generations = 2 if small else 10
    for g in range(generations):
        iso.resample_kde(5 if small else 20)
        iso.run(20 if small else 100)
        print(f"gen {g}: n={len(iso.data)} loss={iso.losses[-1]:.4f}")

    chi = np.asarray(iso.chis())[:, 0]
    print(f"chi range [{chi.min():.3f}, {chi.max():.3f}]  "
          f"rates {np.asarray(iso.rates()).round(4).tolist()}")
    itk.plot_training(iso, out="out/dna_training.png")
    iso.save("out/dna_iso.pkl")
    return iso


if __name__ == "__main__":
    main(small="--small" in sys.argv)
