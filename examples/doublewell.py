"""Minimal end-to-end ISOKANN on the 1-D doublewell (BASELINE config 1).

Equivalent of the reference quickstart on an analytic potential
(``test/runtests.jl:43-56``).  Runs in seconds on any backend.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import numpy as np
import jax.numpy as jnp

import isokann_tpu as itk


def main():
    sim = itk.Doublewell(sigma=1.0)
    iso = itk.Iso(sim=sim, nx=128, nk=8, key=0, minibatch=64,
                  opt=itk.AdamRegularized())
    iso.run(300)
    print(f"loss {iso.losses[0]:.4f} -> {iso.losses[-1]:.4f}")

    xs = jnp.linspace(-1.3, 1.3, 101)[:, None]
    chi = np.asarray(iso.chicoords(xs))[:, 0]
    chi = (chi - chi.min()) / (chi.max() - chi.min())
    if chi[0] > 0.5:
        chi = 1 - chi
    print(f"chi(-1.3)={chi[0]:.3f} chi(0)={chi[50]:.3f} chi(1.3)={chi[-1]:.3f}")
    print("rates:\n", iso.rates())

    # optimal-control importance sampling: in this low-dimensional,
    # well-trained regime the chi-derived bias genuinely reduces the
    # Koopman estimator variance (up to ~14x at forcescale 1; measured
    # in tools/optcontrol_analytic.py) — the progress line shows the
    # per-generation effective sample size of the Girsanov weights
    itk.run_girsanov(iso, generations=3, iter=50, kde=8, forcescale=0.75,
                     showprogress=True)
    print(f"after optimal-control generations: loss {iso.losses[-1]:.4f} "
          f"n={len(iso.data)}")

    itk.plot_training(iso, out="out/doublewell_training.png")
    return iso


if __name__ == "__main__":
    main()
