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

Collective variables (deliberately independent of the training
featurization): CA-RMSD to the minimized native structure and the CA
radius of gyration — the classic folding order parameters.  The slow
nontrivial right eigenvector of the Ulam matrix on that 2-D grid is the
committor-like function chi must match (up to an affine map).

Outputs (into the artifact dir and the shared evidence files):
  <out>/trpcage_golden.npz     grid eigenfunction + CVs + chi samples
  data/golden/trpcage_msm.npz  committed copy for the regression test
  out/golden_md.json           gains a "trpcage" row (corr, eigenvalues,
                               implied timescale, coverage)
  <out>/results.json           gains golden_* keys

Acceptance: |corr(chi, golden eigenfunction)| >= 0.95 on the campaign
samples (the acceptance philosophy of BASELINE.md; reference quickstart
``README.md:27-37`` uses the same chi-correlation metric on ala2).

Usage: python -u tools/trpcage_golden.py [artifact_dir] [--nbins N]
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def ca_indices(pdb_path):
    from isokann_tpu.md.pdbio import read_pdb

    import numpy as np
    p = read_pdb(pdb_path)
    idx = np.asarray([i for i, n in enumerate(p.atom_names) if n == "CA"],
                     np.int64)
    return idx, np.asarray(p.coords, np.float64)


def folding_cvs(flat_coords, ca_idx, native_ca):
    """(n, 2) CVs from flat (n, 3N) coordinates: CA-RMSD to native and
    CA radius of gyration (both in nm)."""
    import numpy as np

    from isokann_tpu.ops.align import aligned_rmsd_one_to_many

    x = np.asarray(flat_coords, np.float64).reshape(len(flat_coords), -1, 3)
    ca = x[:, ca_idx]
    rmsd = np.asarray(aligned_rmsd_one_to_many(
        native_ca.reshape(-1), ca.reshape(len(ca), -1)))
    cen = ca - ca.mean(axis=1, keepdims=True)
    rg = np.sqrt((cen ** 2).sum(axis=(1, 2)) / ca.shape[1])
    return np.stack([rmsd, rg], axis=1)


def main(out=None, nbins=12, min_count=2, accept=0.95):
    import numpy as np

    import jax
    if os.environ.get("ISOKANN_GOLDEN_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")
    import isokann_tpu as itk
    from isokann_tpu.analysis.msm import (
        ulam_transition_matrix, koopman_eigenfunctions,
        chi_msm_correlation, implied_timescale)
    from isokann_tpu.data import values as _values

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
    ca_idx, native = ca_indices(pdb)
    native_ca = native[ca_idx]

    cv_x = folding_cvs(xs, ca_idx, native_ca)
    cv_y = folding_cvs(ys.reshape(n * k, -1), ca_idx,
                       native_ca).reshape(n, k, 2)

    lo = cv_x.reshape(-1, 2).min(axis=0)
    hi = cv_x.reshape(-1, 2).max(axis=0)
    pad = 1e-6 + 0.02 * (hi - lo)
    lo, hi = lo - pad, hi + pad

    P, cells, counts = ulam_transition_matrix(
        cv_x, cv_y, lo, hi, nbins, periodic=False, min_count=min_count)
    vals, vecs = koopman_eigenfunctions(P, k=3)
    ts = implied_timescale(vals[1], sim.lagtime)
    golden = dict(cells=cells, vec=vecs[:, 1], lo=lo, hi=hi,
                  nbins=nbins, periodic=False)

    chi = np.asarray(iso.chis(), np.float64).ravel()
    corr, coverage = chi_msm_correlation(chi, cv_x, golden)
    print(f"Ulam cells={len(cells)} eigvals={np.round(vals, 4).tolist()} "
          f"implied timescale={ts:.2f} ps", flush=True)
    print(f"corr(chi, golden)={corr:.4f} coverage={coverage:.3f}",
          flush=True)

    row = dict(
        system="trp-cage TC5B + OBC2 (campaign artifact)",
        artifact=os.path.relpath(out, ROOT),
        cvs="CA-RMSD to native, CA radius of gyration",
        n_pairs=int(n * k), lag_ps=float(sim.lagtime),
        nbins=int(nbins), n_cells=int(len(cells)),
        msm_eigvals=vals.tolist(),
        msm_implied_timescale_ps=float(ts),
        chi_corr=corr, coverage=coverage,
        accept_threshold=accept, accepted=bool(corr >= accept),
        wall_s=time.time() - t0)

    np.savez(os.path.join(out, "trpcage_golden.npz"),
             cells=cells, vec=vecs[:, 1], vec2=vecs[:, 2], lo=lo, hi=hi,
             nbins=nbins, eigvals=vals, cv_x=cv_x, cv_y=cv_y, chi=chi,
             lag_ps=sim.lagtime)
    os.makedirs(os.path.join(ROOT, "data", "golden"), exist_ok=True)
    np.savez(os.path.join(ROOT, "data", "golden", "trpcage_msm.npz"),
             cells=cells, vec=vecs[:, 1], lo=lo, hi=hi, nbins=nbins,
             eigvals=vals, cv_x=cv_x, cv_y=cv_y, chi=chi,
             lag_ps=sim.lagtime)

    # evidence rows
    gpath = os.path.join(ROOT, "out", "golden_md.json")
    gdoc = json.load(open(gpath)) if os.path.exists(gpath) else {}
    gdoc["trpcage"] = row
    json.dump(gdoc, open(gpath, "w"), indent=1)
    rpath = os.path.join(out, "results.json")
    if os.path.exists(rpath):
        doc = json.load(open(rpath))
        doc.setdefault("results", {}).update(
            golden_chi_corr=corr, golden_coverage=coverage,
            golden_msm_eigvals=vals.tolist(),
            golden_accepted=bool(corr >= accept))
        json.dump(doc, open(rpath, "w"), indent=1)
    print(json.dumps(row, indent=1), flush=True)
    return corr


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default=None)
    ap.add_argument("--nbins", type=int, default=12)
    ap.add_argument("--min-count", type=int, default=2)
    args = ap.parse_args()
    main(args.out, nbins=args.nbins, min_count=args.min_count)
