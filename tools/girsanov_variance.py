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
        """Per-start estimates: raw weighted mean, self-normalized mean,
        plus weight diagnostics (E[w], effective sample size)."""
        sim.bias = bias
        raw = np.zeros((reps, n_starts))
        norm = np.zeros((reps, n_starts))
        wmeans, esss = [], []
        for r in range(reps):
            ys = sim.propagate(xs, nk, key=jax.random.PRNGKey(100 + r))
            if isinstance(ys, WeightedSamples):
                w = np.asarray(ys.weights).reshape(n_starts, nk)
                chi_y = np.asarray(iso.chicoords(
                    np.asarray(ys.values).reshape(-1, sim.dim))
                ).reshape(n_starts, nk)
                raw[r] = (w * chi_y).mean(axis=1)
                norm[r] = (w * chi_y).sum(axis=1) / w.sum(axis=1)
                wmeans.append(float(w.mean()))
                esss.append(float((w.sum(axis=1) ** 2
                                   / (w ** 2).sum(axis=1)).mean()))
            else:
                chi_y = np.asarray(iso.chicoords(
                    np.asarray(ys).reshape(-1, sim.dim))
                ).reshape(n_starts, nk)
                raw[r] = norm[r] = chi_y.mean(axis=1)
                wmeans.append(1.0)
                esss.append(float(nk))
        return raw, norm, float(np.mean(wmeans)), float(np.mean(esss))

    t0 = time.time()
    plain_raw, plain_norm, _, _ = estimates(None)
    t_plain = time.time() - t0
    var_plain = plain_raw.var(axis=0, ddof=1)
    trans = (chi_x > 0.2) & (chi_x < 0.8)
    eps = 1e-12

    def ratio(vb, sel):
        return float(var_plain[sel].mean() / (vb[sel].mean() + eps))

    res = dict(
        n_starts=int(n_starts), nk=nk, reps=reps,
        lag_ps=float(sim.lagtime),
        n_transition=int(trans.sum()),
        mean_var_plain=float(var_plain.mean()),
        t_plain_s=t_plain,
        kernel_girsanov=bool(sim._pallas_girsanov_eligible(
            n_starts * nk)) if hasattr(sim, "_pallas_girsanov_eligible")
        else None,
        by_forcescale={},
    )
    for fs in (0.25, 0.5, 1.0):
        bias = optcontrol(iso, forcescale=fs)
        t0 = time.time()
        b_raw, b_norm, ew, ess = estimates(bias)
        t_b = time.time() - t0
        vb_raw = b_raw.var(axis=0, ddof=1)
        vb_norm = b_norm.var(axis=0, ddof=1)
        res["by_forcescale"][str(fs)] = dict(
            mean_weight=ew, ess_of_nk=ess,
            shift_raw=float(np.abs(plain_raw.mean(0)
                                   - b_raw.mean(0)).mean()),
            shift_selfnorm=float(np.abs(plain_norm.mean(0)
                                        - b_norm.mean(0)).mean()),
            var_ratio_raw_overall=ratio(vb_raw, slice(None)),
            var_ratio_selfnorm_overall=ratio(vb_norm, slice(None)),
            var_ratio_raw_transition=(ratio(vb_raw, trans)
                                      if trans.any() else None),
            var_ratio_selfnorm_transition=(ratio(vb_norm, trans)
                                           if trans.any() else None),
            t_s=t_b)
    sim.bias = None
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
