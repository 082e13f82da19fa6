"""Exact-parameter import workflow: run a tleap prmtop (or a serialized
OpenMM System XML) verbatim, no force-field lookups.

The reference builds its systems with OpenMM's
``ForceField(*xmls).createSystem`` (``src/simulators/mopenmm.py:55-76``).
To move such a system here with bit-authoritative parameters, either:

  1. AmberTools:   tleap -> system.prmtop + system.rst7
  2. OpenMM:       open("system.xml", "w").write(
                       XmlSerializer.serialize(simulation.system))

and load it below.  Both paths carry everything resolved per term —
ff14SB/ff19SB (incl. CMAP), GAFF ligands, TIP3P/TIP4P-Ew waters (M sites
become virtual sites), PME settings, GB radii, constraints.

Without external input files this example demonstrates the round trip on
the bundled alanine dipeptide: build -> export prmtop + XML -> reimport
-> verify per-term energy equality -> train ISOKANN on the imported
system.  The exports under out/ also serve as cross-validation fixtures
for any environment that has OpenMM/pmemd.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import isokann_tpu as itk
from isokann_tpu.md import (build_system, load_system_xml, save_prmtop,
                            save_system_xml, system_from_prmtop, write_rst7)
from isokann_tpu.md.fixtures import alanine_dipeptide_pdb
from isokann_tpu.md.forces import energy_terms
from isokann_tpu.md.pdbio import read_pdb


def main(small=False):
    os.makedirs("out", exist_ok=True)
    pdb = alanine_dipeptide_pdb()
    built = build_system(pdb, method="NoCutoff")
    x0 = read_pdb(pdb).coords

    # ---- export: the files any Amber/OpenMM installation can check ----
    save_prmtop(built, "out/alanine.prmtop")
    write_rst7("out/alanine.rst7", x0)
    save_system_xml(built, "out/alanine_system.xml")
    print("wrote out/alanine.prmtop, out/alanine.rst7,",
          "out/alanine_system.xml")

    # ---- import both ways and diff per term ----
    sys_prm, coords, meta = system_from_prmtop(
        "out/alanine.prmtop", "out/alanine.rst7", method="NoCutoff")
    sys_xml, constraints, _ = load_system_xml("out/alanine_system.xml")
    t0 = energy_terms(built, x0)
    for name, s in (("prmtop", sys_prm), ("xml", sys_xml)):
        t = energy_terms(s, x0)
        diffs = {k: abs(float(t[k]) - float(t0[k])) for k in t0}
        print(f"{name:7s} max per-term |dE| = {max(diffs.values()):.2e} "
              f"kJ/mol  {diffs}")

    # ---- train ISOKANN on the imported system ----
    sim = itk.MDSimulation.from_system(sys_prm, coords,
                                       source="out/alanine.prmtop")
    nx, nk = (12, 2) if small else (100, 5)
    iso = itk.Iso(sim=sim, nx=nx, nk=nk, key=0, opt=itk.AdamRegularized())
    iso.run(20 if small else 100)
    print(f"loss {iso.losses[0]:.4f} -> {iso.losses[-1]:.4f}")
    print("rates:\n", iso.rates())


if __name__ == "__main__":
    main(small="--small" in sys.argv)
