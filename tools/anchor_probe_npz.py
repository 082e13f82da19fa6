"""Lag/bin anchor probe from a committed golden-analysis checkpoint.

``tools/golden_anchor_probe.py`` needs the full frame checkpoint
(``golden_eq_frames.npz``) and the trained ``iso_final.pkl`` — both of
which are too large to commit and are lost whenever the host restarts.
The committed analysis npz (``trpcage_golden_eq.npz``) however stores
the projected CVs (W, F, dim) and chi (W, F) on every frame, which is
all the lag- and bin-scan needs as long as the TICA basis stays frozen
at its original estimate (the basis is a preprocessing choice, not a
fit to the anchor: eigenvector identifiability is still judged on the
anchor's own bootstrap).

For a grid of (MSM lag, bins/dim) this reports the same columns as the
full probe: spectrum + gap, bootstrap eigenvector identifiability, chi
correlation (+ CI), the grid-discretization ceiling corr(chi,
E[chi|cell]), the deconvolved ratio, affine subspace R, and the
variational check autocorr(chi at lag) >= lambda_2.

Usage:
  python -u tools/anchor_probe_npz.py out/deca_production/trpcage_golden_eq.npz \
      [--lags 25,50,125,250] [--bins 12,8,6] [--bootstrap 30]
"""

import argparse
import itertools
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npz", nargs="?", default=os.path.join(
        ROOT, "out", "deca_production", "trpcage_golden_eq.npz"))
    ap.add_argument("--lags", type=str, default="25,50,125,250")
    ap.add_argument("--bins", type=str, default="12,8,6")
    ap.add_argument("--min-count", type=int, default=2)
    ap.add_argument("--bootstrap", type=int, default=30)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import numpy as np

    t0 = time.time()
    with np.load(args.npz) as z:
        cv = np.asarray(z["cv"], np.float64)          # (W, F, dim)
        chi = np.asarray(z["chi"], np.float64)        # (W, F)
        walker_ok = np.asarray(z["walker_ok"], bool)
        stride_ps = float(z["stride_ps"])
    W, nF, dim = cv.shape
    ok_idx = np.where(walker_ok)[0]
    cv_ok = cv[walker_ok].reshape(-1, dim)
    chi_flat = chi[walker_ok].ravel()
    lo = cv_ok.min(axis=0)
    hi = cv_ok.max(axis=0)
    pad = 1e-9 + 0.02 * (hi - lo)
    lo, hi = lo - pad, hi + pad
    print(f"loaded {args.npz}: {W} x {nF} frames @ {stride_ps} ps, "
          f"dim={dim}, {int(walker_ok.sum())} finite", flush=True)

    from isokann_tpu.analysis.msm import (
        anchor_identifiability, eigenfunction_on_samples, grid_ceiling,
        implied_timescale, trajectory_pairs)

    def subspace_R(chi_s, cv_s, cells, vecs, j):
        """Affine R of chi onto span{1, psi_2..psi_j} on the samples."""
        cols = [np.ones_like(chi_s)]
        for c in range(1, min(j, vecs.shape[1])):
            f = eigenfunction_on_samples(cv_s, cells, vecs[:, c], lo, hi,
                                         nb, periodic=False)
            cols.append(np.where(np.isfinite(f), f, 0.0))
        A = np.stack(cols, axis=1)
        coef, *_ = np.linalg.lstsq(A, chi_s, rcond=None)
        fit = A @ coef
        ssr = ((chi_s - fit) ** 2).sum()
        sst = ((chi_s - chi_s.mean()) ** 2).sum()
        return float(np.sqrt(max(0.0, 1.0 - ssr / sst)))

    lags = [float(x) for x in args.lags.split(",")]
    binss = [int(x) for x in args.bins.split(",")]

    rows = []
    for lag_ps, nb in itertools.product(lags, binss):
        lag_frames = max(1, int(round(lag_ps / stride_ps)))
        lag_ps_eff = lag_frames * stride_ps

        try:
            res = anchor_identifiability(
                cv, lag_frames, lo, hi, nb, walkers=ok_idx,
                n_boot=args.bootstrap, min_count=args.min_count,
                periodic=False, chi=chi)
        except Exception as e:
            rows.append(dict(lag_ps=lag_ps_eff, nbins=nb, error=repr(e)))
            continue
        cells, vals, vecs = res["cells"], res["eigvals"], res["vecs"]
        ref, fin = res["ref"], np.isfinite(res["ref"])
        coverage = res["coverage"]
        corr, ci = res["chi_corr"], res["chi_corr_ci95"]
        ident_med = res["identifiability"]
        Rj = subspace_R(chi_flat[fin], cv_ok[fin], cells, vecs, dim + 1)

        ceiling, _ = grid_ceiling(chi_flat, cv_ok, lo, hi, nb,
                                  periodic=False)
        corr_deconv = float(corr / ceiling) if ceiling > 0 else None

        cxc, cyc = trajectory_pairs(chi[..., None], lag_frames, ok_idx)
        a = np.concatenate([cxc.ravel(), cyc.ravel()])
        am = a.mean()
        num = ((cxc.ravel() - am) * (cyc.ravel() - am)).mean()
        chi_auto = float(num / a.var())

        row = dict(
            lag_ps=lag_ps_eff, nbins=nb, n_cells=int(len(cells)),
            coverage=coverage, eigvals=np.round(vals, 4).tolist(),
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
        print(f"lag={lag_ps_eff:6.1f} bins={nb:2d} "
              f"cells={len(cells):4d} gap={row['gap_l3_over_l2']:.3f} "
              f"ident={ident_med:.3f} corr={corr:.3f} "
              f"ceil={ceiling:.3f} deconv={corr_deconv:.3f} R={Rj:.3f} "
              f"auto(chi)={chi_auto:.3f} vs l2={vals[1]:.3f}", flush=True)

    ok_rows = [r for r in rows if "error" not in r
               and r["coverage"] >= 0.99]
    best = max(ok_rows, key=lambda r: r["identifiability"], default=None)
    doc = dict(npz=os.path.relpath(args.npz, ROOT),
               selection="max bootstrap eigenvector identifiability, "
                         "coverage >= 0.99 (chi-blind); frozen TICA basis",
               best=best, rows=rows, wall_s=time.time() - t0)
    path = args.out or os.path.join(os.path.dirname(args.npz),
                                    "anchor_probe_npz.json")
    json.dump(doc, open(path, "w"), indent=1)
    print(f"\nbest (by identifiability): {json.dumps(best, indent=1)}",
          flush=True)
    print(f"wrote {path} ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
