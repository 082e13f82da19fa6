"""Quantitative Girsanov variance-reduction study (ROADMAP item 9).

Measures what the chi-derived optimal-control bias actually buys: the
variance of the Koopman estimator Kchi(x) = E[chi(X_tau) | X_0 = x],
estimated unbiased vs. importance-sampled (``optcontrol`` bias +
Girsanov weights, integrated inside the fused Pallas kernel on TPU).

For each start point (spread across the chi range), R independent
replicates of nk-walker bursts estimate Kchi; the report compares the
empirical across-replicate variance of the two estimators, overall and
in the transition region (0.2 < chi < 0.8) where the optimal-control
theory predicts the gain.

Usage: python -u tools/girsanov_variance.py [--quick]
Writes out/girsanov_variance.json.
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(quick=False, smoke=False):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import isokann_tpu as itk
    from isokann_tpu.md.integrators import optcontrol
    from isokann_tpu.data import WeightedSamples

    n_starts = 8 if smoke else 24 if quick else 48
    nk = 4 if smoke else 16
    reps = 2 if smoke else 8 if quick else 16
    train_iters = 80 if smoke else 400 if quick else 1500

    sim = itk.MDSimulation(steps=50 if smoke else 500)   # vacuum ala2
    iso = itk.Iso(sim=sim, nx=256, nk=8, key=0, opt=itk.AdamRegularized())
    t0 = time.time()
    iso.run(train_iters)
    # chi-stratified starts spanning the transition region
    iso.resample_strat(n_starts)
    xs = np.asarray(iso.data.coords)[-n_starts:]
    chi_x = np.asarray(iso.chicoords(xs)).ravel()
    print(f"trained {train_iters} iters (loss {iso.losses[-1]:.4g}) in "
          f"{time.time() - t0:.0f}s; starts chi in "
          f"[{chi_x.min():.2f}, {chi_x.max():.2f}]", flush=True)

    def estimates(bias):
        sim.bias = bias
        out = np.zeros((reps, n_starts))
        for r in range(reps):
            ys = sim.propagate(xs, nk, key=jax.random.PRNGKey(100 + r))
            if isinstance(ys, WeightedSamples):
                w = np.asarray(ys.weights).reshape(n_starts, nk)
                chi_y = np.asarray(iso.chicoords(
                    np.asarray(ys.values).reshape(-1, sim.dim))
                ).reshape(n_starts, nk)
                out[r] = (w * chi_y).mean(axis=1)
            else:
                chi_y = np.asarray(iso.chicoords(
                    np.asarray(ys).reshape(-1, sim.dim))
                ).reshape(n_starts, nk)
                out[r] = chi_y.mean(axis=1)
        return out

    t0 = time.time()
    est_plain = estimates(None)
    t_plain = time.time() - t0
    bias = optcontrol(iso)
    t0 = time.time()
    est_bias = estimates(bias)
    t_bias = time.time() - t0
    sim.bias = None

    var_plain = est_plain.var(axis=0, ddof=1)
    var_bias = est_bias.var(axis=0, ddof=1)
    trans = (chi_x > 0.2) & (chi_x < 0.8)
    eps = 1e-12

    def ratio(sel):
        return float(var_plain[sel].mean() / (var_bias[sel].mean() + eps))

    res = dict(
        n_starts=int(n_starts), nk=nk, reps=reps,
        lag_ps=float(sim.lagtime),
        mean_bias_shift=float(np.abs(est_plain.mean(0)
                                     - est_bias.mean(0)).mean()),
        var_ratio_overall=ratio(slice(None)),
        var_ratio_transition=ratio(trans) if trans.any() else None,
        n_transition=int(trans.sum()),
        mean_var_plain=float(var_plain.mean()),
        mean_var_biased=float(var_bias.mean()),
        t_plain_s=t_plain, t_biased_s=t_bias,
        kernel_girsanov=bool(sim._pallas_girsanov_eligible(
            n_starts * nk)) if hasattr(sim, "_pallas_girsanov_eligible")
        else None,
    )
    os.makedirs(os.path.join(ROOT, "out"), exist_ok=True)
    json.dump(res, open(os.path.join(ROOT, "out",
                                     "girsanov_variance.json"), "w"),
              indent=1)
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        import jax
        jax.config.update("jax_platforms", "cpu")
    main(quick=args.quick, smoke=args.smoke)
