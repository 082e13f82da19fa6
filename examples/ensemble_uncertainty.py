"""Deep-ensemble chi uncertainty and uncertainty-targeted sampling.

Beyond the reference (its adaptive family ``src/iso.jl:229-276`` is
density/stratification-driven): train E chi replicas in one vmapped
device program, read their disagreement as pointwise epistemic
uncertainty, and seed new Koopman bursts where the model family is
unsure.  Runs in under a minute on any backend.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

import isokann_tpu as itk


def main():
    iso = itk.Iso(sim=itk.Doublewell(sigma=1.0), nx=96, nk=5, key=0,
                  opt=itk.AdamRegularized())
    iso.run(100)

    ens = itk.ChiEnsemble(iso, n_members=8, key=1)
    ens.run(200)                      # all 8 members, one lax.scan program

    xs = jnp.linspace(-1.3, 1.3, 101)[:, None]
    mean = ens.chi_mean(xs)[:, 0]
    std = ens.chi_std(xs)[:, 0]
    print(f"ensemble mean chi corr with x: "
          f"{abs(np.corrcoef(mean, np.asarray(xs)[:, 0])[0, 1]):.4f}")
    print(f"uncertainty: max {std.max():.4f} at x="
          f"{float(xs[np.argmax(std), 0]):+.2f}, "
          f"min {std.min():.4f}")

    # adaptive round driven by disagreement instead of density
    n0 = len(iso.data)
    itk.resample_uncertainty(iso, ens, ny=8, explore=0.25, key=2)
    ens.run(50)
    print(f"data {n0} -> {len(iso.data)}; retrained ensemble, "
          f"final member losses "
          f"{np.round(np.asarray(ens.losses)[-1], 4).tolist()}")


if __name__ == "__main__":
    main()
