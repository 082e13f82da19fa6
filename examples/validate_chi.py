"""Validating a trained chi against an independent golden anchor.

The reference ships no validation machinery beyond "did it throw"
(``test/runtests.jl``); this framework treats anchor-building as a
first-class workflow (``analysis/msm``).  The recipe, demonstrated on
the doublewell in seconds and used verbatim by the MD-scale anchors
(tools/trpcage_golden_eq.py, tools/golden_anchor_probe.py):

1. simulate an UNBIASED equilibrium ensemble (walkers x frames),
2. estimate the slowest Koopman eigenfunction psi_2 with a grid/Ulam
   MSM on the same frames — an estimator that shares no code with the
   neural learner,
3. before quoting corr(chi, psi_2), qualify the instrument itself:
   - ``anchor_identifiability``: do the anchor's own walker-bootstrap
     replicas agree about psi_2?  With a near-degenerate spectrum they
     don't, and any 1-D comparison is noise (the trp-cage honest
     negative, docs/evidence_round4.md row 4),
   - ``grid_ceiling``: no cell-constant reference can correlate with
     chi beyond corr(chi, E[chi|cell]) — report the deconvolved ratio,
   - the variational check: autocorr(chi at the lag) >= lambda_2 means
     chi resolves a coordinate at least as slow as the anchor's best.

Runs on any backend.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import numpy as np
import jax.numpy as jnp

import isokann_tpu as itk
from isokann_tpu.analysis.msm import (anchor_identifiability,
                                      grid_ceiling, implied_timescale,
                                      trajectory_pairs)


def main():
    # 1. train chi the usual way (burst data, shift-scale target)
    sim = itk.Doublewell(sigma=1.0)
    iso = itk.Iso(sim=sim, nx=128, nk=8, key=0, minibatch=64,
                  opt=itk.AdamRegularized())
    iso.run(300)
    print(f"train loss {iso.losses[0]:.4f} -> {iso.losses[-1]:.4f}")

    # 2. independent equilibrium ensemble: 16 walkers x 30k steps,
    #    saved every 0.1 time units (well-hopping is abundant)
    W, T, saveat = 16, 300.0, 0.1
    frames = np.stack([
        np.asarray(sim.trajectory(T=T, x0=jnp.zeros((1,)), saveat=saveat,
                                  key=100 + w))
        for w in range(W)])                       # (W, F, 1)
    lag_t = 2.0                                   # anchor lag
    lag = int(round(lag_t / saveat))

    # 3. anchor + instrument qualification in one call
    chi = np.asarray(iso.chicoords(
        jnp.asarray(frames.reshape(-1, 1)))).reshape(W, -1)
    res = anchor_identifiability(frames, lag, -2.0, 2.0, nbins=12,
                                 n_boot=30, min_count=2, chi=chi)
    ceil, _ = grid_ceiling(chi.ravel(), frames.reshape(-1, 1),
                           -2.0, 2.0, 12, periodic=False)

    cx, cy = trajectory_pairs(chi[..., None], lag)
    a = np.concatenate([cx.ravel(), cy.ravel()])
    auto = float(((cx.ravel() - a.mean()) * (cy.ravel() - a.mean())).mean()
                 / a.var())

    lam2 = res["eigvals"][1]
    print(f"anchor: lambda_2={lam2:.4f} "
          f"(implied timescale {implied_timescale(lam2, lag_t):.1f}), "
          f"identifiability={res['identifiability']:.3f}, "
          f"coverage={res['coverage']:.3f}")
    print(f"corr(chi, psi_2) = {res['chi_corr']:.4f} "
          f"(95% CI {np.round(res['chi_corr_ci95'], 3).tolist()}), "
          f"grid ceiling {ceil:.4f} -> deconvolved "
          f"{res['chi_corr'] / ceil:.4f}")
    print(f"variational: autocorr(chi at lag)={auto:.4f} >= "
          f"lambda_2={lam2:.4f}: {auto >= lam2 - 0.02}")

    assert res["identifiability"] > 0.95, "anchor not identifiable"
    assert res["chi_corr"] > 0.95, "chi disagrees with the golden anchor"
    print("VALIDATED")
    return iso


if __name__ == "__main__":
    main()
