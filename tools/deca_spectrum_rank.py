"""Where does helix-coil rank in the deca equilibrium ensemble's slow
spectrum?

The multi-dim trajectory-ISOKANN demonstration (tools/deca_multichi.py)
failed its psi_2-containment acceptance at nout=3 AND nout=5
(subspace_R 0.40/0.42) while every chi column was variational
(autocorr above the grid MSM's lambda_2 = 0.734).  Hypothesis: the
FULL-feature process has more than nout modes slower than helix-coil,
so the leading invariant subspace legitimately excludes it.  This
script tests that hypothesis with linear algebra only (no NN
training):

  (A) full-feature TICA ladder at the same lag — eigenvalue ladder,
      per-mode |corr| with the grid psi_2 and with the 1-D rare-mode
      chi, and the multiple correlation R_k of psi_2 on span{1, top-k
      TICA modes} as k grows (the rank at which a LINEAR method
      contains helix-coil);
  (B) a 3-D Ulam MSM on the top TICA CVs — a nonlinear spectral
      estimate: eigenvalue ladder + mode identification (corr with
      psi_2 / rare chi) to place helix-coil's rank among all slow
      modes, not just linear ones;
  (C) the committed nout=3/5 chi columns' PROJECTED subspace spectrum
      (generalized eigenvalues of C_tau vs C_0 on the chi span, from
      the strided chi stored in data/golden/deca_multichi.npz) — the
      variational-dominance check for the committed artifact.

Usage: python -u tools/deca_spectrum_rank.py [out/deca_production]
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


def containment(ref, basis):
    """Multiple correlation of ref on span{1, basis columns}."""
    from isokann_tpu.analysis.msm import containment_R
    return containment_R(ref, basis)[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?",
                    default=os.path.join(ROOT, "out", "deca_production"))
    ap.add_argument("--name", type=str, default="deca")
    ap.add_argument("--lag-ps", type=float, default=250.0)
    ap.add_argument("--stride-ps", type=float, default=12.5)
    ap.add_argument("--burnin-ps", type=float, default=250.0)
    ap.add_argument("--nbins", type=int, default=12)
    ap.add_argument("--min-count", type=int, default=2)
    ap.add_argument("--n-pca", type=int, default=60)
    ap.add_argument("--tica-dim", type=int, default=12)
    ap.add_argument("--ulam-dims", type=int, default=3)
    ap.add_argument("--ulam-bins", type=int, default=8)
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
    print(f"ensemble {W} x {nF} frames; lag {lag_ps} ps", flush=True)
    flat = F.reshape(W * nF, -1)

    # ---- grid MSM anchor psi_2 (identical to deca_multichi) -------------
    pdb = getattr(sim, "pdbfile", None) or os.path.join(
        ROOT, "out", f"{args.name}.pdb")
    p = read_pdb(pdb)
    ca_idx = np.asarray([i for i, nm in enumerate(p.atom_names)
                         if nm == "CA"], np.int64)
    feats_ca = ca_pairdists(flat, ca_idx).reshape(W, nF, -1)
    fx_ca, fy_ca = trajectory_pairs(feats_ca, lag)
    lam2d, V2d, mu2d = tica(fx_ca, fy_ca, dim=2, n_pca=10)
    cv = ((feats_ca.reshape(W * nF, -1) - mu2d) @ V2d).reshape(W, nF, 2)
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
    print(f"grid MSM eigvals {np.round(np.asarray(vals), 4).tolist()}",
          flush=True)

    # rare-mode 1-D chi (trajectory-trained)
    chi1 = None
    p_traj = os.path.join(args.out, "iso_traj.pkl")
    if os.path.exists(p_traj):
        iso1 = itk.load(p_traj)
        chi1 = np.concatenate(
            [np.asarray(iso1.chicoords(jnp.asarray(flat[i:i + 8192])))
             for i in range(0, len(flat), 8192)]).astype(np.float64).ravel()

    # ---- (A) full-feature TICA ladder ------------------------------------
    featurize = iso0.data.features_of
    feats = np.concatenate(
        [np.asarray(featurize(jnp.asarray(flat[i:i + 8192])))
         for i in range(0, len(flat), 8192)]).astype(np.float64)
    feats = feats.reshape(W, nF, -1)
    print(f"full features: {feats.shape[-1]} dims "
          f"({time.time() - t0:.0f}s)", flush=True)
    fx, fy = trajectory_pairs(feats, lag)
    lam, V, mu = tica(fx, fy, dim=args.tica_dim, n_pca=args.n_pca)
    proj = (feats.reshape(W * nF, -1) - mu) @ V  # (n, tica_dim)

    modes = []
    for j in range(args.tica_dim):
        modes.append(dict(
            autocorr=float(lam[j]),
            corr_psi2=float(abs(np.corrcoef(proj[fin, j],
                                            ref[fin])[0, 1])),
            corr_rare_1d=(None if chi1 is None else
                          float(abs(np.corrcoef(proj[:, j],
                                                chi1)[0, 1])))))
    R_k = [containment(ref[fin], proj[fin, :k])
           for k in range(1, args.tica_dim + 1)]
    rank95 = next((k + 1 for k, r in enumerate(R_k) if r >= 0.95), None)

    # ---- (B) Ulam MSM on the top TICA CVs (nonlinear spectrum) ----------
    d3 = args.ulam_dims
    cv3 = proj[:, :d3].reshape(W, nF, d3)
    lo3 = cv3.reshape(-1, d3).min(axis=0)
    hi3 = cv3.reshape(-1, d3).max(axis=0)
    pad3 = 1e-9 + 0.02 * (hi3 - lo3)
    lo3, hi3 = lo3 - pad3, hi3 + pad3
    c3x, c3y = trajectory_pairs(cv3, lag)
    P3, cells3, counts3 = ulam_transition_matrix(
        c3x, c3y, lo3, hi3, args.ulam_bins, periodic=False,
        min_count=args.min_count, symmetrize=True)
    k3 = min(8, P3.shape[0] - 1)
    vals3, vecs3 = koopman_eigenfunctions(P3, k=k3)
    ulam_modes = []
    for j in range(1, k3):
        ev = eigenfunction_on_samples(proj[:, :d3], cells3, vecs3[:, j],
                                      lo3, hi3, args.ulam_bins,
                                      periodic=False)
        fj = np.isfinite(ev) & fin
        ulam_modes.append(dict(
            eigval=float(np.real(vals3[j])),
            corr_psi2=float(abs(np.corrcoef(ev[fj], ref[fj])[0, 1])),
            corr_rare_1d=(None if chi1 is None else
                          float(abs(np.corrcoef(
                              ev[np.isfinite(ev)],
                              chi1[np.isfinite(ev)])[0, 1])))))
    # rank of helix-coil among the Ulam modes: first mode with the max
    # corr_psi2 (1-indexed counting the slowest non-trivial mode as 1)
    if ulam_modes:
        psi2_rank = 1 + int(np.argmax([m["corr_psi2"]
                                       for m in ulam_modes]))
    else:
        psi2_rank = None

    # ---- (C) committed chi columns: projected subspace spectrum ---------
    # the strided chi snapshot lives in data/golden; recompute the
    # subspace GEV from the stride-10 series (lag 20 -> strided lag 2)
    npz = os.path.join(ROOT, "data", "golden", f"{args.name}_multichi.npz")
    chi_gev = None
    if os.path.exists(npz):
        with np.load(npz) as z:
            chi_s = np.asarray(z["chi"], np.float64)  # (n//10, nout)
        sstep = 10
        slag = lag // sstep  # frames between strided samples at the lag
        if slag >= 1:
            idx = np.arange(len(chi_s))
            orig = idx * sstep
            wlk = orig // nF
            ok = (wlk == ((orig + slag * sstep) // nF)) & \
                 (idx + slag < len(chi_s))
            from isokann_tpu.analysis.msm import subspace_spectrum
            gev, _, _ = subspace_spectrum(chi_s[idx[ok]],
                                          chi_s[idx[ok] + slag])
            chi_gev = gev.tolist()

    row = dict(
        system="deca-alanine (Ala10) + OBC2: slow-spectrum rank of "
               "helix-coil",
        artifact=os.path.relpath(args.out, ROOT),
        lag_ps=float(lag_ps), walkers=int(W), frames_per_walker=int(nF),
        grid_msm_eigvals=np.asarray(vals).tolist(),
        tica_modes=modes,
        tica_containment_R_by_k=R_k,
        tica_rank95=rank95,
        ulam3d_cells=int(P3.shape[0]),
        ulam3d_modes=ulam_modes,
        ulam3d_psi2_rank=psi2_rank,
        committed_chi_subspace_gev=chi_gev,
        wall_s=time.time() - t0)
    print(json.dumps(row, indent=1), flush=True)
    json.dump(row, open(os.path.join(args.out, "spectrum_rank.json"), "w"),
              indent=1)
    print(f"wrote {os.path.join(args.out, 'spectrum_rank.json')}",
          flush=True)


if __name__ == "__main__":
    main()
