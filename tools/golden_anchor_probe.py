"""Anchor-hyperparameter probe for the equilibrium golden ground truth.

The mid-scale golden anchors (tools/trpcage_golden_eq.py) compare the
trained chi against the slowest nontrivial eigenfunction of a
TICA-projected Ulam MSM.  On systems with a near-degenerate slow
spectrum (deca-alanine helix-coil: lambda3/lambda2 = 0.92 at the 25 ps
lag despite 600+ observed transitions), the 1-D comparison is limited
by the ANCHOR, not by chi: with a closed spectral gap the individual
eigenvectors of the estimated transition matrix are not statistically
identifiable, and a 2-D CV projection may not even separate the modes.

This tool quantifies that instrument error and picks the anchor
configuration on the anchor's OWN terms.  For a grid of
(MSM lag, TICA dimension, bins per dimension) it reports:

- the spectrum and gap of the symmetrized Ulam matrix,
- **eigenvector identifiability**: median |corr| between the slowest
  eigenfunction of walker-bootstrap re-estimates and the full-data
  estimate, evaluated on the frames — the probe's selection criterion.
  An anchor whose own bootstrap replicas disagree about psi_2 cannot
  certify or refute anything at the 0.95 level;
- chi agreement (1-D corr and affine subspace R over the top
  (dim+1) eigenfunctions) with a walker-bootstrap CI,
- the variational check: the autocorrelation of chi at the MSM lag
  vs lambda_2 — by the variational principle of conformation dynamics
  a 1-D observable cannot beat the true lambda_2(tau), so
  autocorr(chi) >= lambda_2^MSM certifies chi resolves a coordinate at
  least as slow as the anchor's best.

Selection is by identifiability (never by chi agreement): the promoted
configuration is the one whose ground truth is best determined; chi's
correlation at that configuration is then reported as THE anchor
number, whatever it turns out to be.

Usage:
  python -u tools/golden_anchor_probe.py out/deca_production \
      [--lags 25,125,250] [--dims 2,3] [--bins 12,8,6] [--bootstrap 30]
"""

import argparse
import itertools
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?",
                    default=os.path.join(ROOT, "out", "deca_production"))
    ap.add_argument("--walkers", type=int, default=32)
    ap.add_argument("--ns", type=float, default=20.0)
    ap.add_argument("--stride-ps", type=float, default=12.5)
    ap.add_argument("--burnin-ps", type=float, default=250.0)
    ap.add_argument("--lags", type=str, default="25,62.5,125,250")
    ap.add_argument("--dims", type=str, default="2,3")
    ap.add_argument("--bins", type=str, default="12,8,6")
    ap.add_argument("--n-pca", type=int, default=10)
    ap.add_argument("--min-count", type=int, default=2)
    ap.add_argument("--bootstrap", type=int, default=30)
    ap.add_argument("--tpu", action="store_true",
                    help="use the accelerator (default CPU: the frames "
                         "are checkpointed, only chi eval runs on device)")
    args = ap.parse_args()

    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from trpcage_golden import ca_pairdists, subspace_R
    from trpcage_golden_eq import generate

    t0 = time.time()
    iso, sim, F, stride_ps, walker_ok = generate(
        args.out, args.walkers, args.ns, args.stride_ps,
        checkpoint_every=40, budget_s=0, resume=True)
    from isokann_tpu.analysis.msm import (
        anchor_identifiability, grid_ceiling, implied_timescale, tica,
        trajectory_pairs)
    from isokann_tpu.md.pdbio import read_pdb

    burn = int(round(args.burnin_ps / stride_ps))
    F = F[:, burn:]
    W, nF = F.shape[:2]
    ok_idx = np.where(walker_ok)[0]
    print(f"ensemble: {W} x {nF} frames @ {stride_ps} ps "
          f"({int(walker_ok.sum())} finite)", flush=True)

    pdb = getattr(sim, "pdbfile", None)
    p = read_pdb(pdb)
    ca_idx = np.asarray([i for i, nm in enumerate(p.atom_names)
                         if nm == "CA"], np.int64)
    feats = ca_pairdists(F.reshape(W * nF, -1),
                         ca_idx).reshape(W, nF, -1).astype(np.float64)

    import jax.numpy as jnp
    flat = F.reshape(W * nF, -1)
    chi = np.concatenate(
        [np.asarray(iso.chicoords(jnp.asarray(flat[i:i + 8192])))
         for i in range(0, len(flat), 8192)]).reshape(W, nF, -1)[..., 0]
    chi = chi.astype(np.float64)
    chi_flat = chi[walker_ok].ravel()
    print(f"features + chi in {time.time() - t0:.0f}s", flush=True)

    lags = [float(x) for x in args.lags.split(",")]
    dims = [int(x) for x in args.dims.split(",")]
    bins = [int(x) for x in args.bins.split(",")]

    rows = []
    for lag_ps, dim, nb in itertools.product(lags, dims, bins):
        lag_frames = max(1, int(round(lag_ps / stride_ps)))
        lag_ps_eff = lag_frames * stride_ps
        n_cells_max = nb ** dim
        if n_cells_max > 4000:
            continue
        f_x, f_y = trajectory_pairs(feats, lag_frames, ok_idx)
        lam_t, V, mu = tica(f_x, f_y, dim=dim, n_pca=args.n_pca)
        cv = ((feats.reshape(W * nF, -1) - mu) @ V).reshape(W, nF, dim)
        cv_ok = cv[walker_ok].reshape(-1, dim)
        lo, hi = cv_ok.min(axis=0), cv_ok.max(axis=0)
        pad = 1e-9 + 0.02 * (hi - lo)
        lo, hi = lo - pad, hi + pad

        try:
            res = anchor_identifiability(
                cv, lag_frames, lo, hi, nb, walkers=ok_idx,
                n_boot=args.bootstrap, min_count=args.min_count,
                periodic=False, chi=chi)
        except Exception as e:
            rows.append(dict(lag_ps=lag_ps_eff, dim=dim, nbins=nb,
                             error=repr(e)))
            continue
        cells, vals, vecs = res["cells"], res["eigvals"], res["vecs"]
        coverage = res["coverage"]
        corr, ci = res["chi_corr"], res["chi_corr_ci95"]
        ident_med = res["identifiability"]
        Rj = subspace_R(chi_flat, cv_ok, cells, vecs, lo, hi, nb,
                        j=dim + 1)

        # instrument ceiling / deconvolved agreement (see
        # analysis.msm.grid_ceiling for the cell-constant argument)
        ceiling, _ = grid_ceiling(chi_flat, cv_ok, lo, hi, nb,
                                  periodic=False)
        corr_deconv = float(corr / ceiling) if ceiling > 0 else None

        # chi autocorrelation at this lag (variational check)
        cxc, cyc = trajectory_pairs(chi[..., None], lag_frames, ok_idx)
        a = np.concatenate([cxc.ravel(), cyc.ravel()])
        am = a.mean()
        num = ((cxc.ravel() - am) * (cyc.ravel() - am)).mean()
        chi_auto = float(num / a.var())

        row = dict(
            lag_ps=lag_ps_eff, dim=dim, nbins=nb,
            n_cells=int(len(cells)), coverage=coverage,
            tica_autocorr=np.round(lam_t, 4).tolist(),
            eigvals=np.round(vals, 4).tolist(),
            gap_l3_over_l2=float(vals[2] / vals[1]),
            t2_ps=float(implied_timescale(vals[1], lag_ps_eff)),
            identifiability=round(ident_med, 4),
            chi_corr=round(corr, 4), chi_corr_ci95=ci,
            chi_grid_ceiling=round(ceiling, 4),
            chi_corr_deconv=(round(corr_deconv, 4)
                             if corr_deconv is not None else None),
            chi_subspace_R=round(Rj, 4),
            chi_autocorr_at_lag=round(chi_auto, 4),
            chi_variational_ok=bool(chi_auto >= vals[1] - 0.02))
        rows.append(row)
        print(f"lag={lag_ps_eff:6.1f} dim={dim} bins={nb:2d} "
              f"cells={len(cells):4d} gap={row['gap_l3_over_l2']:.3f} "
              f"ident={ident_med:.3f} corr={corr:.3f} "
              f"ceil={ceiling:.3f} deconv={corr_deconv:.3f} R={Rj:.3f} "
              f"auto(chi)={chi_auto:.3f} vs l2={vals[1]:.3f}", flush=True)

    ok_rows = [r for r in rows if "error" not in r
               and r["coverage"] >= 0.99]
    best = max(ok_rows, key=lambda r: r["identifiability"],
               default=None)
    doc = dict(artifact=os.path.relpath(args.out, ROOT),
               selection="max bootstrap eigenvector identifiability, "
                         "coverage >= 0.99 (chi-blind)",
               best=best, rows=rows, wall_s=time.time() - t0)
    path = os.path.join(args.out, "anchor_probe.json")
    json.dump(doc, open(path, "w"), indent=1)
    print(f"\nbest (by identifiability): {json.dumps(best, indent=1)}",
          flush=True)
    print(f"wrote {path} ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
