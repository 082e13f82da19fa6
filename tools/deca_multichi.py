"""Multi-dimensional trajectory ISOKANN on the deca equilibrium
ensemble: resolve the full slow-mode hierarchy.

The 1-D full-feature trajectory chi (tools/trpcage_traj_iso.py) locks
onto the SLOWEST mode of the sampled process — for deca-alanine a rare
compact state (~1.4% of frames, multi-ns persistence) — so its 1-D
correlation with the grid MSM's psi_2 (helix-coil) is a projection
artifact, not an error (autocorr 0.814 > lambda_2 0.734, see
docs/evidence_round4.md).  The principled reconciliation is
multi-dimensional chi (reference default for N-D output,
``src/isotarget.jl:74-107``): with nout > 1 the ISA target spans the
leading invariant subspace, so BOTH the rare mode and helix-coil get a
membership function.

Acceptance logic of this demonstration:
- the anchor's psi_2 must be (affinely) contained in span{1, chi_*}:
  multiple correlation R >= threshold,
- some column must track the rare state (corr with the 1-D trajectory
  chi from iso_traj.pkl),
- per-column autocorrelations bracket the MSM spectrum from above
  (variational).

Usage: python -u tools/deca_multichi.py [out/deca_production]
           [--nout 3] [--lag-ps 250] [--iters 3000]
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trpcage_golden import ca_pairdists  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?",
                    default=os.path.join(ROOT, "out", "deca_production"))
    ap.add_argument("--name", type=str, default="deca")
    ap.add_argument("--nout", type=int, default=3)
    ap.add_argument("--lag-ps", type=float, default=250.0)
    ap.add_argument("--stride-ps", type=float, default=12.5)
    ap.add_argument("--burnin-ps", type=float, default=250.0)
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--nbins", type=int, default=12)
    ap.add_argument("--min-count", type=int, default=2)
    ap.add_argument("--n-pca", type=int, default=10)
    ap.add_argument("--max-pairs", type=int, default=20000)
    ap.add_argument("--accept", type=float, default=0.95)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import isokann_tpu as itk
    from isokann_tpu.analysis.msm import (
        eigenfunction_on_samples, koopman_eigenfunctions, tica,
        trajectory_pairs, ulam_transition_matrix)
    from isokann_tpu.data import SimulationData, data_from_trajectories
    from isokann_tpu.md.pdbio import read_pdb

    t0 = time.time()
    with np.load(os.path.join(args.out, "golden_eq_frames.npz")) as z:
        F = z["frames"]
    iso0 = itk.load(os.path.join(args.out, "iso_final.pkl"))
    sim = iso0.data.sim
    stride_ps = float(args.stride_ps)
    burn = int(round(args.burnin_ps / stride_ps))
    F = F[:, burn:]
    F = F[np.isfinite(F).all(axis=(1, 2))]
    W, nF = F.shape[:2]
    lag = max(1, int(round(args.lag_ps / stride_ps)))
    lag_ps = lag * stride_ps
    print(f"ensemble {W} x {nF} frames; lag {lag_ps} ps; nout={args.nout}",
          flush=True)

    # ---- multi-dim ISOKANN on trajectory pairs ---------------------------
    stride_pairs = max(1, (W * (nF - 2 * lag)) // args.max_pairs)
    xs, ys = data_from_trajectories(
        [jnp.asarray(F[w]) for w in range(W)], reverse=True, lag=lag,
        stride=stride_pairs)
    data = SimulationData.from_coords(sim, xs, ys,
                                      featurizer=iso0.data.featurizer)
    iso = itk.Iso(data=data, key=11, nout=args.nout,
                  opt=itk.AdamRegularized(), target=itk.TransformISA())
    iso.run(args.iters)
    loss = float(iso.losses[-1])
    print(f"trained {args.iters} iters (ISA, nout={args.nout}), "
          f"loss {loss:.6f} ({time.time() - t0:.0f}s)", flush=True)

    flat = F.reshape(W * nF, -1)
    chi = np.concatenate(
        [np.asarray(iso.chicoords(jnp.asarray(flat[i:i + 8192])))
         for i in range(0, len(flat), 8192)]).astype(np.float64)  # (n, d)

    # ---- grid MSM anchor at the same lag (as in trpcage_traj_iso) --------
    pdb = getattr(sim, "pdbfile", None) or os.path.join(
        ROOT, "out", f"{args.name}.pdb")
    p = read_pdb(pdb)
    ca_idx = np.asarray([i for i, nm in enumerate(p.atom_names)
                         if nm == "CA"], np.int64)
    feats = ca_pairdists(flat, ca_idx).reshape(W, nF, -1).astype(np.float64)
    f_x, f_y = trajectory_pairs(feats, lag)
    lam_t, V, mu = tica(f_x, f_y, dim=2, n_pca=args.n_pca)
    cv = ((feats.reshape(W * nF, -1) - mu) @ V).reshape(W, nF, 2)
    cvf = cv.reshape(-1, 2)
    lo, hi = cvf.min(axis=0), cvf.max(axis=0)
    pad = 1e-9 + 0.02 * (hi - lo)
    lo, hi = lo - pad, hi + pad
    cx, cy = trajectory_pairs(cv, lag)
    P, cells, counts = ulam_transition_matrix(
        cx, cy, lo, hi, args.nbins, periodic=False,
        min_count=args.min_count, symmetrize=True)
    vals, vecs = koopman_eigenfunctions(P, k=4)
    ref = eigenfunction_on_samples(cvf, cells, vecs[:, 1], lo, hi,
                                   args.nbins, periodic=False)
    fin = np.isfinite(ref)

    # ---- is psi_2 contained in the learned subspace? ---------------------
    from isokann_tpu.analysis.msm import containment_R
    R = containment_R(ref, chi)[0]

    # per-column 1-D stats
    cols = []
    chi_w = chi.reshape(W, nF, args.nout)
    chi1 = None
    p_traj = os.path.join(args.out, "iso_traj.pkl")
    if os.path.exists(p_traj):
        iso1 = itk.load(p_traj)
        chi1 = np.concatenate(
            [np.asarray(iso1.chicoords(jnp.asarray(flat[i:i + 8192])))
             for i in range(0, len(flat), 8192)]).astype(np.float64).ravel()
    for j in range(args.nout):
        cj = chi[:, j]
        a, b = chi_w[:, :-lag, j].ravel(), chi_w[:, lag:, j].ravel()
        m = np.concatenate([a, b]).mean()
        v = np.concatenate([a, b]).var()
        cols.append(dict(
            corr_psi2=float(abs(np.corrcoef(cj[fin], ref[fin])[0, 1])),
            autocorr_at_lag=float(((a - m) * (b - m)).mean() / v),
            corr_rare_1d=(None if chi1 is None else
                          float(abs(np.corrcoef(cj, chi1)[0, 1]))),
            spread=float(np.percentile(cj, 99) - np.percentile(cj, 1))))
    best1d = max(c["corr_psi2"] for c in cols)
    rare_tracked = (max((c["corr_rare_1d"] or 0.0) for c in cols)
                    if chi1 is not None else None)

    row = dict(
        system=f"deca-alanine (Ala10) + OBC2 (multi-dim trajectory "
               f"ISOKANN, nout={args.nout})",
        artifact=os.path.relpath(args.out, ROOT),
        method="TransformISA chi on reverse-augmented trajectory pairs; "
               "anchor containment = multiple correlation of the grid "
               "MSM psi_2 on span{1, chi_columns}",
        walkers=int(W), frames_per_walker=int(nF), lag_ps=float(lag_ps),
        n_pairs=int(len(xs)), train_iters=int(args.iters),
        train_loss=loss, msm_eigvals=np.asarray(vals).tolist(),
        columns=cols, best_column_corr_psi2=best1d,
        subspace_R_psi2=R, rare_mode_best_corr=rare_tracked,
        accept_threshold=args.accept, accepted=bool(R >= args.accept),
        acceptance_metric="subspace_R_psi2 (anchor mode contained in "
                          "the learned invariant subspace)",
        wall_s=time.time() - t0)
    print(json.dumps(row, indent=1), flush=True)

    json.dump(row, open(os.path.join(args.out, "multichi.json"), "w"),
              indent=1)
    gpath = os.path.join(ROOT, "out", "golden_md.json")
    gdoc = json.load(open(gpath)) if os.path.exists(gpath) else []
    gdoc = [r for r in gdoc if not (isinstance(r, dict)
                                    and r.get("system") == row["system"])]
    gdoc.append(row)
    json.dump(gdoc, open(gpath, "w"), indent=1)
    os.makedirs(os.path.join(ROOT, "data", "golden"), exist_ok=True)
    np.savez(os.path.join(ROOT, "data", "golden",
                          f"{args.name}_multichi.npz"),
             chi=chi[::10].astype(np.float32),
             ref=ref[::10].astype(np.float32),
             msm_eigvals=vals, subspace_R_psi2=R,
             best_column_corr_psi2=best1d, lag_ps=lag_ps,
             nout=args.nout)
    print(f"wrote {os.path.join(args.out, 'multichi.json')} "
          f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
