"""ISOKANN from plain trajectory data + an MSM cross-check.

The burst workflow (propagate nk replicas from every start point) is
ISOKANN's native data layout, but the reference equally supports
learning from PRE-EXISTING trajectories: ``data_from_trajectory``
converts a time series into lagged (x, y) pairs, with the time-reversed
augmentation turning every interior frame into a k=2 Koopman sample
(reference ``src/data.jl:88-100``, used by ``test/workflow.jl``).

This example runs the full loop on the doublewell:

1. simulate a small ensemble of equilibrium trajectories,
2. train chi on their sliding-window pairs,
3. independently estimate the dominant Koopman eigenfunction with a
   detailed-balance-symmetrized Ulam MSM (``analysis/msm``) on the SAME
   pairs, and
4. check the two agree (|corr| > 0.95) — the same method-equivalence
   anchor the trp-cage campaign uses at scale
   (``tools/trpcage_traj_iso.py``).

Run: python examples/trajectory_data.py   (~1 min CPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("ISOKANN_EXAMPLE_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import isokann_tpu as itk
from isokann_tpu.analysis.msm import (eigenfunction_on_samples,
                                      implied_timescale,
                                      koopman_eigenfunctions,
                                      trajectory_pairs,
                                      ulam_transition_matrix)
from isokann_tpu.data import SimulationData, data_from_trajectories


def main():
    sim = itk.Doublewell(sigma=1.0)

    # 1. an ensemble of equilibrium trajectories (any external source
    #    works the same way — load_trajectory/LazyTrajectory for MD files)
    W, F, save_stride = 8, 400, 10
    trajs = []
    for w in range(W):
        t = sim.trajectory(T=F * sim.dt * save_stride,
                           x0=jnp.linspace(-1.2, 1.2, W)[w, None],
                           saveat=sim.dt * save_stride,
                           key=jax.random.PRNGKey(w + 1))
        trajs.append(np.asarray(t).reshape(-1, 1)[:F])
    cv = np.stack(trajs)                              # (W, F, 1)

    # 2. lagged pairs -> SimulationData -> train
    lag = 10
    xs, ys = data_from_trajectories([jnp.asarray(t) for t in trajs],
                                    reverse=True, lag=lag)
    data = SimulationData.from_coords(sim, xs, ys)
    iso = itk.Iso(data=data, key=0, opt=itk.AdamRegularized())
    iso.run(300)
    print(f"trained on {len(xs)} trajectory pairs, "
          f"loss {float(iso.losses[-1]):.4f}")

    # 3. independent grid estimate of the same operator
    x, y = trajectory_pairs(cv, lag)
    P, cells, _ = ulam_transition_matrix(x, y, -1.6, 1.6, 12,
                                         periodic=False, symmetrize=True)
    vals, vecs = koopman_eigenfunctions(P, k=3)
    tau = lag * save_stride * sim.dt
    print(f"MSM eigenvalues {np.round(vals, 4).tolist()}, implied "
          f"timescale {implied_timescale(vals[1], tau):.2f}")

    # 4. method equivalence
    ref = eigenfunction_on_samples(x, cells, vecs[:, 1], -1.6, 1.6, 12,
                                   periodic=False)
    chi = np.asarray(iso.chicoords(jnp.asarray(x))).ravel()
    fin = np.isfinite(ref)
    corr = abs(np.corrcoef(chi[fin], ref[fin])[0, 1])
    print(f"corr(chi, MSM eigenfunction) = {corr:.4f}")
    assert corr > 0.95, corr
    print("OK")


if __name__ == "__main__":
    main()
