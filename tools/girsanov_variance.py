"""Quantitative Girsanov variance-reduction study, v2 (VERDICT r2 weak #3).

Measures what the chi-derived optimal-control bias actually buys: the
variance of the Koopman estimator Kchi(x) = E[chi(X_tau) | X_0 = x],
estimated unbiased vs. importance-sampled (``optcontrol`` bias +
Girsanov weights, integrated inside the fused Pallas kernel on TPU).

v2 upgrades over the round-2 study (which ran reps=8 and was
statistically inconclusive):

- reps >= 64, all replicates of a configuration batched into ONE device
  call (walkers are independent; the lag is the only serial axis)
- three estimators per start: raw weighted mean, self-normalized, and
  truncated importance sampling (Ionides 2008: clip w at
  sqrt(nk) * mean(w), then self-normalize)
- bootstrap CIs (over replicates) on every variance ratio
- matched wall-clock accounting: biased and unbiased per-replicate cost
  is measured and the work-normalized ratio (variance x time) reported
- denser forcescale ladder for a monotonicity-sane picture

Reference context: the optimal-control bias math is
``src/simulators/openmm.jl:640-667`` (optcontrol) and the Girsanov
integrator ``:569-637``; the reference provides the machinery but never
quantifies the variance reduction.

Usage: python -u tools/girsanov_variance.py [--quick|--smoke]
Writes out/girsanov_variance.json.
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FORCESCALES = (0.125, 0.25, 0.5, 0.75, 1.0)


def main(quick=False, smoke=False, reps=None, n_starts=None, out=None):
    import numpy as np
    import jax
    import isokann_tpu as itk
    from isokann_tpu.md.integrators import optcontrol
    from isokann_tpu.data import WeightedSamples

    n_starts = n_starts or (8 if smoke else 32 if quick else 48)
    nk = 4 if smoke else 16
    reps = reps or (4 if smoke else 16 if quick else 64)
    train_iters = 80 if smoke else 400 if quick else 1500
    n_boot = 200 if smoke else 1000

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

    rng = np.random.default_rng(0)
    trans = (chi_x > 0.2) & (chi_x < 0.8)
    eps = 1e-12

    def estimates(bias, key):
        """(reps, n_starts) estimator arrays: raw weighted mean,
        self-normalized, truncated+self-normalized; plus weight
        diagnostics and wall time.  All replicates ride one propagate."""
        sim.bias = bias
        xs_rep = np.tile(xs, (reps, 1))                   # (reps*n_starts, d)
        t0 = time.time()
        ys = sim.propagate(xs_rep, nk, key=key)
        if isinstance(ys, WeightedSamples):
            w = np.asarray(ys.weights, dtype=np.float64)
            vals = np.asarray(ys.values)
        else:
            vals = np.asarray(ys)
            w = np.ones(vals.shape[:2])
        chi_y = np.asarray(iso.chicoords(
            vals.reshape(-1, sim.dim))).reshape(reps, n_starts, nk)
        t_wall = time.time() - t0
        w = w.reshape(reps, n_starts, nk)
        # residual nonfinite walkers (diverged even with the psi floor):
        # zero them out of every estimator and report the fraction —
        # one NaN walker must not poison the whole study
        finite = np.isfinite(w) & np.isfinite(chi_y)
        frac_bad = float(1.0 - finite.mean())
        if frac_bad:
            w = np.where(finite, w, 0.0)
            chi_y = np.where(finite, chi_y, 0.0)
        raw = (w * chi_y).mean(axis=2)
        norm = (w * chi_y).sum(axis=2) / (w.sum(axis=2) + eps)
        # truncated IS: clip at sqrt(nk) * per-burst mean weight
        cap = np.sqrt(nk) * w.mean(axis=2, keepdims=True)
        wt = np.minimum(w, cap)
        trunc = (wt * chi_y).sum(axis=2) / (wt.sum(axis=2) + eps)
        ess = float((w.sum(axis=2) ** 2 / ((w ** 2).sum(axis=2) + eps)).mean())
        return (dict(raw=raw, selfnorm=norm, trunc=trunc),
                float(w.mean()), ess, t_wall, frac_bad)

    def var_ratios(est_plain, est_bias, t_plain, t_bias):
        """Mean variance ratios (plain/biased: >1 = bias wins) with
        bootstrap CIs over replicates, overall and transition-region,
        plus the work-normalized (variance x wall-clock) ratio."""
        out = {}
        for name in ("raw", "selfnorm", "trunc"):
            vp = est_plain["raw"]          # unbiased baseline: plain mean
            vb = est_bias[name]
            for label, sel in (("overall", slice(None)),
                               ("transition", trans)):
                if label == "transition" and not trans.any():
                    continue
                num = vp[:, sel].var(axis=0, ddof=1).mean()
                den = vb[:, sel].var(axis=0, ddof=1).mean() + eps
                boots = []
                for _ in range(n_boot):
                    bp = rng.integers(0, reps, reps)
                    bb = rng.integers(0, reps, reps)
                    n_ = vp[bp][:, sel].var(axis=0, ddof=1).mean()
                    d_ = vb[bb][:, sel].var(axis=0, ddof=1).mean() + eps
                    boots.append(n_ / d_)
                lo, hi = np.percentile(boots, [2.5, 97.5])
                out[f"var_ratio_{name}_{label}"] = dict(
                    ratio=float(num / den), ci95=[float(lo), float(hi)])
            out[f"work_ratio_{name}_overall"] = float(
                (est_plain["raw"].var(axis=0, ddof=1).mean() * t_plain)
                / (vb.var(axis=0, ddof=1).mean() * t_bias + eps))
            out[f"bias_shift_{name}"] = float(np.abs(
                est_plain["raw"].mean(0) - vb.mean(0)).mean())
        return out

    est_plain, _, _, t_plain, _ = estimates(None, jax.random.PRNGKey(100))
    print(f"unbiased: {reps} reps x {n_starts} starts x {nk} walkers in "
          f"{t_plain:.1f}s", flush=True)

    res = dict(
        n_starts=int(n_starts), nk=nk, reps=reps,
        lag_ps=float(sim.lagtime),
        n_transition=int(trans.sum()),
        mean_var_plain=float(est_plain["raw"].var(axis=0, ddof=1).mean()),
        t_plain_s=t_plain,
        kernel_girsanov=None,  # filled below with the bias installed
        by_forcescale={},
    )
    for i, fs in enumerate(FORCESCALES):
        bias = optcontrol(iso, forcescale=fs)
        est_b, ew, ess, t_b, bad = estimates(bias, jax.random.PRNGKey(200 + i))
        # eligibility must be probed while sim.bias is live (estimates
        # leaves it installed): the check inspects bias.optcontrol_spec,
        # so probing with bias=None always reported False
        if res["kernel_girsanov"] is None and hasattr(
                sim, "_pallas_girsanov_eligible"):
            res["kernel_girsanov"] = bool(
                sim._pallas_girsanov_eligible(reps * n_starts * nk))
        row = dict(mean_weight=ew, ess_of_nk=ess, t_s=t_b,
                   frac_nonfinite=bad)
        row.update(var_ratios(est_plain, est_b, t_plain, t_b))
        res["by_forcescale"][str(fs)] = row
        r = row.get("var_ratio_selfnorm_transition",
                    row["var_ratio_selfnorm_overall"])
        print(f"forcescale {fs}: E[w]={ew:.3f} ESS={ess:.1f}/{nk} "
              f"selfnorm ratio {r['ratio']:.2f} "
              f"CI {np.round(r['ci95'], 2).tolist()}", flush=True)
    sim.bias = None
    os.makedirs(os.path.join(ROOT, "out"), exist_ok=True)
    if out is None:
        # the bare name is reserved for the authoritative full-rep CPU
        # study (also kept as girsanov_variance_cpu{reps}.json); quick
        # runs and TPU kernel-path reruns are always tagged so they can
        # never clobber it
        backend = jax.default_backend()
        if backend == "cpu" and reps >= 64:
            tag = ""
        elif backend == "cpu":
            tag = f"_quick{reps}"
        else:
            tag = f"_{backend}{reps}"
        out = os.path.join(ROOT, "out", f"girsanov_variance{tag}.json")
    path = out
    json.dump(res, open(path, "w"), indent=1)
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (outage hedge runs)")
    ap.add_argument("--reps", type=int, default=None)
    ap.add_argument("--n-starts", type=int, default=None)
    ap.add_argument("--out", default=None,
                    help="output path (hedge runs must not race the "
                         "queued TPU stage's default path)")
    args = ap.parse_args()
    if args.smoke or args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    main(quick=args.quick, smoke=args.smoke, reps=args.reps,
         n_starts=args.n_starts, out=args.out)
