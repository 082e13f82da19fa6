"""Golden-anchor the trp-cage campaign chi against an Ulam/MSM ground
truth (VERDICT round-3 item 4).

The ala2 anchors (``tools/make_golden_md.py``) are what make the ala2
chi claims trustworthy; this builds the same style of independent
cross-check for a finished trp-cage campaign artifact — WITHOUT new
simulation: the campaign dataset already holds raw lagged coordinate
pairs ``(coords, propcoords)`` at the campaign lag, and the Ulam
row-stochastic estimate of the transfer operator is unbiased for any
start-point distribution (``analysis/msm.ulam_transition_matrix``), so
adaptive sampling does not bias it.

Choosing the CV grid: ala2 has known slow coordinates (phi/psi);
trp-cage does not, and hand-picked folding CVs fail to resolve the
process chi learns (measured: CA-RMSD-to-start x radius-of-gyration
gives corr(chi, golden) = 0.08 on the round-3 artifact while the same
estimator on TICA coordinates gives 0.68 — the slow dynamics simply
does not live on those axes).  This tool therefore projects onto the
top-2 TICA components of the CA pair distances (``analysis/msm.tica``,
PCA-regularized) — an INDEPENDENT linear estimator of the slow
subspace, computed from the same lagged pairs — and grids there.

Reported metrics:

- ``chi_corr``: |Pearson corr| between chi and the slowest nontrivial
  Ulam eigenfunction (the reference-style acceptance metric,
  quickstart ``README.md:27-37``; threshold 0.95);
- ``chi_subspace_R``: multiple correlation of chi against the span of
  the top-3 nontrivial eigenfunctions — the honest metric when the
  spectrum is dense (no gap => "the" slow mode is ill-conditioned but
  the slow SUBSPACE is well-defined);
- ``msm_eigvals`` / gap structure, coverage, and corr(chi, tic1).

Outputs (into the artifact dir and the shared evidence files):
  <out>/trpcage_golden.npz     grid eigenfunction + CVs + chi samples
  data/golden/trpcage_msm.npz  committed copy for the regression test
  out/golden_md.json           gains a "trpcage" row
  <out>/results.json           gains golden_* keys

Usage: python -u tools/trpcage_golden.py [artifact_dir] [--nbins N]
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def ca_pairdists(flat_coords, ca_idx):
    """(n, n_ca*(n_ca-1)/2) CA pair distances from flat (n, 3N) coords."""
    import numpy as np

    x = np.asarray(flat_coords, np.float64).reshape(len(flat_coords), -1, 3)
    ca = x[:, ca_idx]
    d = np.linalg.norm(ca[:, :, None, :] - ca[:, None, :, :], axis=-1)
    iu = np.triu_indices(len(ca_idx), 1)
    return d[:, iu[0], iu[1]]


def subspace_R(chi, cv, cells, vecs, lo, hi, nbins, j=3):
    """Multiple correlation of chi against the affine span of the top-j
    nontrivial grid eigenfunctions evaluated at the samples."""
    import numpy as np

    from isokann_tpu.analysis.msm import eigenfunction_on_samples

    cols = [np.ones(len(chi))]
    for jj in range(1, min(j, vecs.shape[1] - 1) + 1):
        cols.append(eigenfunction_on_samples(
            cv, cells, vecs[:, jj], lo, hi, nbins, periodic=False))
    A = np.stack(cols, axis=1)
    ok = np.all(np.isfinite(A), axis=1)
    coef, *_ = np.linalg.lstsq(A[ok], np.asarray(chi)[ok], rcond=None)
    pred = A[ok] @ coef
    return float(abs(np.corrcoef(pred, np.asarray(chi)[ok])[0, 1]))


def main(out=None, nbins=10, min_count=2, n_pca=10, accept=0.95):
    import numpy as np

    import jax
    if os.environ.get("ISOKANN_GOLDEN_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")
    import isokann_tpu as itk
    from isokann_tpu.analysis.msm import (
        ulam_transition_matrix, koopman_eigenfunctions,
        chi_msm_correlation, implied_timescale, tica)
    from isokann_tpu.data import values as _values
    from isokann_tpu.md.pdbio import read_pdb

    out = out or os.path.join(ROOT, "out", "trpcage_cpu")
    t0 = time.time()
    iso = itk.load(os.path.join(out, "iso_final.pkl"))
    sim = iso.data.sim
    xs = np.asarray(iso.data.coords, np.float64)          # (n, 3N)
    ys = np.asarray(_values(iso.data.propcoords), np.float64)  # (n, k, 3N)
    n, k = ys.shape[:2]
    print(f"artifact {out}: n={n} pairs x nk={k} at lag "
          f"{sim.lagtime} ps", flush=True)

    pdb = getattr(sim, "pdbfile", None) or os.path.join(ROOT, "out",
                                                        "trpcage.pdb")
    p = read_pdb(pdb)
    ca_idx = np.asarray([i for i, nm in enumerate(p.atom_names)
                         if nm == "CA"], np.int64)

    f_x = ca_pairdists(xs, ca_idx)
    f_y = ca_pairdists(ys.reshape(n * k, -1), ca_idx).reshape(n, k, -1)

    lam_t, V, mu = tica(f_x, f_y, dim=2, n_pca=n_pca)
    cv_x = (f_x - mu) @ V
    cv_y = ((f_y.reshape(n * k, -1) - mu) @ V).reshape(n, k, 2)

    lo = cv_x.min(axis=0)
    hi = cv_x.max(axis=0)
    pad = 1e-9 + 0.02 * (hi - lo)
    lo, hi = lo - pad, hi + pad

    P, cells, counts = ulam_transition_matrix(
        cv_x, cv_y, lo, hi, nbins, periodic=False, min_count=min_count)
    vals, vecs = koopman_eigenfunctions(P, k=4)
    ts = implied_timescale(vals[1], sim.lagtime)
    golden = dict(cells=cells, vec=vecs[:, 1], lo=lo, hi=hi,
                  nbins=nbins, periodic=False)

    chi = np.asarray(iso.chis(), np.float64).ravel()
    corr, coverage = chi_msm_correlation(chi, cv_x, golden)
    R3 = subspace_R(chi, cv_x, cells, vecs, lo, hi, nbins, j=3)
    corr_tic1 = float(abs(np.corrcoef(chi, cv_x[:, 0])[0, 1]))
    gap = float(vals[2] / vals[1]) if vals[1] > 0 else float("nan")
    print(f"TICA autocorrs {np.round(lam_t, 4).tolist()}; Ulam "
          f"cells={len(cells)} eigvals={np.round(vals, 4).tolist()} "
          f"(gap l3/l2={gap:.3f}) implied timescale={ts:.2f} ps",
          flush=True)
    print(f"corr(chi, golden)={corr:.4f} subspace_R3={R3:.4f} "
          f"corr(chi, tic1)={corr_tic1:.4f} coverage={coverage:.3f}",
          flush=True)

    row = dict(
        system="trp-cage TC5B + OBC2 (campaign artifact)",
        artifact=os.path.relpath(out, ROOT),
        cvs="top-2 TICA of CA pair distances (n_pca=%d)" % n_pca,
        n_pairs=int(n * k), lag_ps=float(sim.lagtime),
        nbins=int(nbins), n_cells=int(len(cells)),
        tica_autocorr=lam_t.tolist(),
        msm_eigvals=vals.tolist(), msm_gap_l3_over_l2=gap,
        msm_implied_timescale_ps=float(ts),
        chi_corr=corr, chi_subspace_R3=R3, chi_corr_tic1=corr_tic1,
        coverage=coverage,
        accept_threshold=accept, accepted=bool(corr >= accept),
        wall_s=time.time() - t0)

    np.savez(os.path.join(out, "trpcage_golden.npz"),
             cells=cells, vec=vecs[:, 1], vecs=vecs, lo=lo, hi=hi,
             nbins=nbins, eigvals=vals, cv_x=cv_x, cv_y=cv_y, chi=chi,
             tica_components=V, tica_mean=mu, lag_ps=sim.lagtime)
    os.makedirs(os.path.join(ROOT, "data", "golden"), exist_ok=True)
    np.savez(os.path.join(ROOT, "data", "golden", "trpcage_msm.npz"),
             cells=cells, vec=vecs[:, 1], vecs=vecs, lo=lo, hi=hi,
             nbins=nbins, eigvals=vals, cv_x=cv_x, cv_y=cv_y, chi=chi,
             lag_ps=sim.lagtime)

    # evidence rows (out/golden_md.json is a LIST of anchor rows)
    gpath = os.path.join(ROOT, "out", "golden_md.json")
    gdoc = json.load(open(gpath)) if os.path.exists(gpath) else []
    if isinstance(gdoc, list):
        gdoc = [r for r in gdoc
                if not (isinstance(r, dict)
                        and r.get("system", "").startswith("trp-cage"))]
        gdoc.append(row)
    else:
        gdoc["trpcage"] = row
    json.dump(gdoc, open(gpath, "w"), indent=1)
    rpath = os.path.join(out, "results.json")
    if os.path.exists(rpath):
        doc = json.load(open(rpath))
        doc.setdefault("results", {}).update(
            golden_chi_corr=corr, golden_subspace_R3=R3,
            golden_coverage=coverage,
            golden_msm_eigvals=vals.tolist(),
            golden_accepted=bool(corr >= accept))
        json.dump(doc, open(rpath, "w"), indent=1)
    print(json.dumps(row, indent=1), flush=True)
    return corr


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default=None)
    ap.add_argument("--nbins", type=int, default=10)
    ap.add_argument("--min-count", type=int, default=2)
    ap.add_argument("--n-pca", type=int, default=10)
    args = ap.parse_args()
    main(args.out, nbins=args.nbins, min_count=args.min_count,
         n_pca=args.n_pca)
