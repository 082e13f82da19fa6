"""Enhanced sampling on alanine dipeptide: chi-derived optimal-control
bias with Girsanov reweighting, and chi-based well-tempered
metadynamics — the reference's ``optcontrol`` (``src/simulators/
openmm.jl:640-667``) and ``run_metadynamics!`` (``src/workflows.jl``)
workflows.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax
import numpy as np

import isokann_tpu as itk
from isokann_tpu.md.integrators import optcontrol
from isokann_tpu.workflows import adaptive_metadynamics


def main(small=True):
    # 1. train a chi on plain sampling
    sim = itk.MDSimulation(steps=50 if small else 100)
    iso = itk.Iso(sim=sim, nx=20 if small else 100, nk=2 if small else 5,
                  key=0)
    iso.run(20 if small else 100)
    print(f"plain training: loss {iso.losses[-1]:.4f}")

    # 2. optimal-control importance sampling: bias pushes walkers along
    # grad(log psi); Girsanov weights keep the Koopman estimate unbiased
    bias = optcontrol(iso, forcescale=0.5 if small else 1.0)
    bsim = itk.MDSimulation(steps=50 if small else 100, bias=bias)
    x0 = np.asarray(iso.data.coords)[: (4 if small else 32)]
    ws = bsim.propagate(jax.numpy.asarray(x0), 2, key=jax.random.PRNGKey(1))
    w = np.asarray(ws.weights)
    print(f"optcontrol: weights [{w.min():.3f}, {w.max():.3f}] "
          f"(ESS {w.sum()**2 / (w**2).sum():.1f}/{w.size})")
    kchi_w = np.asarray(itk.expectation(iso.chicoords, ws))
    print(f"weighted Kchi range [{kchi_w.min():.3f}, {kchi_w.max():.3f}]")

    # 3. one generation of chi-guided WT-metadynamics deposition
    n0 = len(iso.data)
    adaptive_metadynamics(iso, deposit=5 if small else 30, height=0.5,
                          sigma=0.1, key=jax.random.PRNGKey(2))
    print(f"metadynamics deposited {len(iso.data) - n0} new points")
    iso.run(10 if small else 100)
    print(f"after metadynamics generation: loss {iso.losses[-1]:.4f}")
    return iso


if __name__ == "__main__":
    main(small="--full" not in sys.argv)
