"""Analytic validation of the optimal-control Girsanov machinery.

The round-3 MD-scale study (tools/girsanov_variance.py) found the
chi-derived bias to be a net variance LOSS on vacuum ala2 at a 1 ps lag
(weights degenerate: E[w_sample] ~ 0.33, ESS ~ 3/16).  Before that
negative result can be trusted as physics rather than a bug, the
machinery must be shown to deliver the textbook behavior where theory
guarantees it: a LOW-dimensional system with a NEAR-EXACT chi.

This tool runs the package's own `optcontrol` bias + `brownian_girsanov`
integrator (isokann_tpu/md/integrators.py) on the 1-D doublewell and
checks three facts:

1. **Martingale**: E[w] = 1 for the raw Girsanov weight at every
   forcescale (the weight is a likelihood ratio; its sample mean must be
   statistically compatible with 1).
2. **chi accuracy**: the trained chi correlates with the exact
   second Koopman eigenfunction from a dense 1-D grid discretization of
   the generator (so the optimal-control premise holds).
3. **Variance reduction**: with a near-exact chi, the importance-sampled
   Koopman estimator Kchi(x) = E[w chi(X_tau) | X_0 = x] has LOWER
   variance than the unbiased estimator (ratio plain/biased > 1),
   approaching the zero-variance limit as forcescale -> 1.

Together with the MD study this gives the honest picture: the machinery
is correct and wins in low dimension with good chi; at MD scale the
per-atom bias accumulates O(sum |deta|^2) log-weight variance over the
lag and importance sampling degenerates — matching the known
dimensionality curse of Girsanov reweighting, not an implementation bug.

Reference context: `optcontrol` math at src/simulators/openmm.jl:640-667,
Girsanov EM at :510-541.  The reference never quantifies either regime.

Usage: python -u tools/optcontrol_analytic.py [--quick]
Writes out/optcontrol_analytic.json.
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FORCESCALES = (0.25, 0.5, 0.75, 1.0)


def exact_chi_grid(sigma=1.0, lo=-2.5, hi=2.5, n=801, lag=1.0):
    """Exact Koopman eigenfunction of the 1-D doublewell by dense FD.

    Generator L = (sigma^2/2) d2/dx2 - V'(x) d/dx on a grid with
    reflecting ends; K = expm(lag L); chi = affine-rescaled second
    eigenvector of K (the slow mode), plus the eigenvalue lambda."""
    import numpy as np
    import scipy.linalg

    x = np.linspace(lo, hi, n)
    h = x[1] - x[0]
    vp = 4.0 * x * (x * x - 1.0)          # V'(x) of (x^2-1)^2
    D = sigma * sigma / 2.0
    L = np.zeros((n, n))
    idx = np.arange(1, n - 1)
    L[idx, idx - 1] = D / h**2 + vp[idx] / (2 * h)
    L[idx, idx + 1] = D / h**2 - vp[idx] / (2 * h)
    L[idx, idx] = -2 * D / h**2
    # reflecting boundaries (zero-flux)
    L[0, 0], L[0, 1] = -(D / h**2 - vp[0] / (2 * h)), D / h**2 - vp[0] / (2 * h)
    L[-1, -1], L[-1, -2] = -(D / h**2 + vp[-1] / (2 * h)), D / h**2 + vp[-1] / (2 * h)
    K = scipy.linalg.expm(lag * L)
    evals, evecs = np.linalg.eig(K)
    order = np.argsort(-evals.real)
    lam = float(evals[order[1]].real)
    v = evecs[:, order[1]].real
    v = (v - v.min()) / (v.max() - v.min())
    if v[0] > 0.5:
        v = 1.0 - v
    return x, v, lam


def main(quick=False):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import isokann_tpu as itk
    from isokann_tpu.md import integrators as I

    n_starts = 13 if quick else 25
    nk = 16
    reps = 64 if quick else 256
    train_iters = 600 if quick else 3000
    n_boot = 300 if quick else 1000

    sim = itk.Doublewell()          # sigma=1, dt=0.01, lagtime=1 -> 100 steps
    iso = itk.Iso(sim=sim, nx=128, nk=8, key=1, opt=itk.AdamRegularized())
    t0 = time.time()
    iso.run(train_iters)
    print(f"trained {train_iters} iters (loss {iso.losses[-1]:.3g}) "
          f"in {time.time() - t0:.0f}s", flush=True)

    # exact chi from the grid generator; correlation with the trained net
    gx, gchi, glam = exact_chi_grid(sigma=float(sim.sigma), lag=sim.lagtime)
    net_chi = np.asarray(iso.chicoords(gx[:, None])).ravel()
    # compare on the support box where training data lives
    m = (gx >= -1.5) & (gx <= 1.5)
    # chi's orientation (chi vs 1-chi) is arbitrary: report |corr|
    corr = float(abs(np.corrcoef(net_chi[m], gchi[m])[0, 1]))
    print(f"exact lambda={glam:.4f}; corr(chi_net, chi_exact)={corr:.5f}",
          flush=True)

    # Girsanov EM wiring that reproduces the Diffusion dynamics exactly:
    # brownian_girsanov drifts F/(gamma m) dt and diffuses
    # sqrt(2 kB T/(gamma m)) dB, so gamma = m = 1 and T = sigma^2/(2 kB)
    # give  dX = F dt + sigma dB  — the analytic sim's EM step.
    masses3 = jnp.ones((1,), jnp.float32)
    Tnoise = float(sim.sigma) ** 2 / (2.0 * I.KB)
    nsteps = sim.steps
    force_fn = sim.force

    starts = np.linspace(-1.2, 1.2, n_starts)
    # flat layout (reps, nk, n_starts): tile the start grid over
    # replicate x walker so a single reshape recovers the axes below
    xs = jnp.asarray(np.tile(starts, reps * nk)[:, None], jnp.float32)

    zero_bias = lambda x, t, sigma, F: jnp.zeros_like(x)

    def run_bias(bias_fn, key):
        t0 = time.time()
        xT, logw = I.brownian_girsanov(force_fn, bias_fn, xs, masses3,
                                       Tnoise, 1.0, sim.dt, nsteps, key)
        chiy = np.asarray(iso.chicoords(np.asarray(xT))).ravel()
        w = np.exp(np.asarray(logw, np.float64)).ravel()
        t_wall = time.time() - t0
        chiy = chiy.reshape(reps, nk, n_starts)
        w = w.reshape(reps, nk, n_starts)
        raw = (w * chiy).mean(axis=1)              # (reps, n_starts)
        norm = (w * chiy).sum(axis=1) / (w.sum(axis=1) + 1e-300)
        return dict(raw=raw, selfnorm=norm), w, t_wall

    est_plain, w_plain, t_plain = run_bias(zero_bias, jax.random.PRNGKey(7))
    assert np.allclose(w_plain, 1.0), "zero bias must give unit weights"
    print(f"plain: {reps} reps x {nk} walkers x {n_starts} starts "
          f"in {t_plain:.1f}s", flush=True)

    rng = np.random.default_rng(0)

    def ratios(est_b, w):
        out = {}
        nw = w.size
        ew = float(w.mean())
        se = float(w.std(ddof=1) / np.sqrt(nw))
        out["mean_weight"] = ew
        out["mean_weight_se"] = se
        out["martingale_z"] = float((ew - 1.0) / max(se, 1e-300))
        out["ess_of_nk"] = float(
            (w.sum(axis=1) ** 2 / ((w ** 2).sum(axis=1) + 1e-300)).mean())
        for name in ("raw", "selfnorm"):
            vp = est_plain["raw"].var(axis=0, ddof=1)
            vb = est_b[name].var(axis=0, ddof=1)
            out[f"var_ratio_{name}"] = float(vp.mean() / (vb.mean() + 1e-300))
            boots = []
            for _ in range(n_boot):
                bp = rng.integers(0, reps, reps)
                bb = rng.integers(0, reps, reps)
                boots.append(
                    est_plain["raw"][bp].var(axis=0, ddof=1).mean()
                    / (est_b[name][bb].var(axis=0, ddof=1).mean() + 1e-300))
            lo, hi = np.percentile(boots, [2.5, 97.5])
            out[f"var_ratio_{name}_ci95"] = [float(lo), float(hi)]
            out[f"bias_shift_{name}"] = float(np.abs(
                est_plain["raw"].mean(0) - est_b[name].mean(0)).mean())
        return out

    from isokann_tpu.md.integrators import optcontrol
    res = dict(system="doublewell", sigma=float(sim.sigma), dt=sim.dt,
               lag=sim.lagtime, nsteps=nsteps, n_starts=n_starts, nk=nk,
               reps=reps, train_iters=train_iters,
               exact_lambda=glam, chi_corr_exact=corr,
               mean_var_plain=float(est_plain["raw"].var(0, ddof=1).mean()),
               by_forcescale={})
    for i, fs in enumerate(FORCESCALES):
        bias = optcontrol(iso, forcescale=fs)
        est_b, w, t_b = run_bias(bias, jax.random.PRNGKey(100 + i))
        row = ratios(est_b, w)
        row["t_s"] = t_b
        res["by_forcescale"][str(fs)] = row
        print(f"forcescale {fs}: E[w]={row['mean_weight']:.4f}"
              f"+-{row['mean_weight_se']:.4f} (z={row['martingale_z']:+.2f}) "
              f"ESS={row['ess_of_nk']:.1f}/{nk} "
              f"var_ratio raw {row['var_ratio_raw']:.2f} "
              f"selfnorm {row['var_ratio_selfnorm']:.2f}", flush=True)

    os.makedirs(os.path.join(ROOT, "out"), exist_ok=True)
    with open(os.path.join(ROOT, "out", "optcontrol_analytic.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "by_forcescale"},
                     indent=1), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")
    main(quick=args.quick)
