"""Trajectory-trained ISOKANN vs MSM on the trp-cage equilibrium
ensemble: the method-equivalence golden anchor.

Round-4 measurement chain: the campaign chi (trained on 125 ps
adaptive bursts, lag capped at 62500 steps) tracks a ~1 ns structural
process, while the equilibrium ensemble (tools/trpcage_golden_eq.py)
reveals a slower mode the campaign's own headroom check flagged at
gen 574 ("eigenvalue 0.99 > headroom but max_steps reached").  Direct
campaign-chi x equilibrium-MSM correlation therefore compares two
DIFFERENT processes and is an honest negative — not evidence that
either estimator is wrong.

This tool closes the loop the way the ala2 anchors do: estimate the
SAME operator from the SAME data with two independent methods —

  1. ISOKANN: chi trained on sliding-window trajectory pairs
     (``data_from_trajectories`` with time-reversed augmentation,
     reference ``src/data.jl:88-100``) at a lag long enough to resolve
     the ensemble's slow mode;
  2. grid MSM: detailed-balance-symmetrized Ulam matrix at the same
     lag on TICA CVs (``analysis/msm``).

If the framework's learner is correct, corr(chi, MSM eigenfunction)
must be high REGARDLESS of whether 20 ns/walker fully converges the
physical folding process — both estimators see the same sampled
operator.  Reports the 1-D correlation, the top-3 subspace multiple
correlation, and corr(campaign chi, trajectory chi) to quantify the
process mismatch explanation.

Usage: python -u tools/trpcage_traj_iso.py [artifact] --lag-ps 625
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from trpcage_golden import ca_pairdists, subspace_R  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?",
                    default=os.path.join(ROOT, "out", "trpcage_tpu"))
    ap.add_argument("--lag-ps", type=float, default=625.0)
    ap.add_argument("--burnin-ps", type=float, default=250.0)
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--nbins", type=int, default=12)
    ap.add_argument("--min-count", type=int, default=2)
    ap.add_argument("--n-pca", type=int, default=10)
    ap.add_argument("--max-pairs", type=int, default=20000,
                    help="stride the pair set down to this size")
    ap.add_argument("--accept", type=float, default=0.95)
    ap.add_argument("--quantile", type=float, default=0.005,
                    help="robust shift-scale quantile used for the "
                         "retrain when chi collapses onto a rare state "
                         "(min/max normalization lets one rarely-"
                         "visited near-absorbing state own the scale)")
    ap.add_argument("--no-robust", action="store_true",
                    help="disable the rare-state-collapse retrain")
    ap.add_argument("--no-exclude", action="store_true",
                    help="skip the disconnected-walker exclusion round")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--name", type=str, default="trpcage",
                    help="system name: fallback structure out/<name>.pdb "
                         "and committed anchor data/golden/"
                         "<name>_traj_iso.npz")
    ap.add_argument("--label", type=str, default=None,
                    help="human-readable system label for the evidence "
                         "row")
    ap.add_argument("--stride-ps", type=float, default=12.5,
                    help="frame stride of the golden_eq ensemble")
    args = ap.parse_args()

    import numpy as np

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import isokann_tpu as itk
    from isokann_tpu.analysis.msm import (
        disconnected_trajectories, koopman_eigenfunctions,
        eigenfunction_on_samples, implied_timescale, tica,
        trajectory_pairs, ulam_transition_matrix)
    from isokann_tpu.data import SimulationData, data_from_trajectories
    from isokann_tpu.md.pdbio import read_pdb

    t0 = time.time()
    ck = os.path.join(args.out, "golden_eq_frames.npz")
    with np.load(ck) as z:
        F = z["frames"]                               # (W, nF, 3N)
    iso0 = itk.load(os.path.join(args.out, "iso_final.pkl"))
    sim = iso0.data.sim
    stride_ps = float(args.stride_ps)                 # golden_eq stride
    burn = int(round(args.burnin_ps / stride_ps))
    F = F[:, burn:]
    walker_ok = np.isfinite(F).all(axis=(1, 2))
    F = F[walker_ok]
    W, nF = F.shape[:2]
    lag = max(1, int(round(args.lag_ps / stride_ps)))
    lag_ps = lag * stride_ps
    print(f"ensemble {W} walkers x {nF} frames ({nF * stride_ps / 1e3:.1f} "
          f"ns each); ISOKANN/MSM lag {lag_ps} ps ({lag} frames)",
          flush=True)

    pdb = getattr(sim, "pdbfile", None) or os.path.join(
        ROOT, "out", f"{args.name}.pdb")
    p = read_pdb(pdb)
    ca_idx = np.asarray([i for i, nm in enumerate(p.atom_names)
                         if nm == "CA"], np.int64)

    # Up to two rounds: train + compare, then — if chi collapsed onto a
    # kinetically disconnected trajectory (the trajectory analogue of
    # MSM ergodic trimming, analysis.msm.disconnected_trajectories) —
    # exclude the flagged walkers from BOTH estimators and retrain.
    excluded = []
    round1 = None
    round_collapse = None
    tq = 0.0                      # robust shift-scale quantile in effect

    def _collapsed(c):
        """Rare-state collapse: nearly all chi mass in a sliver of the
        range (one rarely-visited state owns the min/max scale)."""
        c = np.asarray(c, np.float64)
        rng_c = c.max() - c.min()
        if rng_c <= 0:
            return True
        q1, q3 = np.percentile(c, [25, 75])
        return (q3 - q1) / rng_c < 0.05

    for round_i in range(3):
        # ---- ISOKANN on trajectory pairs (ref data_from_trajectory) ------
        stride_pairs = max(1, (W * (nF - 2 * lag)) // args.max_pairs)
        xs, ys = data_from_trajectories(
            [jnp.asarray(F[w]) for w in range(W)], reverse=True, lag=lag,
            stride=stride_pairs)
        print(f"{len(xs)} training pairs (stride {stride_pairs}, reverse "
              f"augmented k=2)", flush=True)
        data = SimulationData.from_coords(sim, xs, ys,
                                          featurizer=iso0.data.featurizer)
        iso = itk.Iso(data=data, key=5, opt=itk.AdamRegularized(),
                      target=itk.TransformShiftscale(quantile=tq))
        iso.run(args.iters)
        loss = float(iso.losses[-1])
        print(f"trained {args.iters} iters, loss {loss:.6f} "
              f"({time.time() - t0:.0f}s)", flush=True)

        # ---- MSM at the same lag on TICA CVs ------------------------------
        feats = ca_pairdists(F.reshape(W * nF, -1),
                             ca_idx).reshape(W, nF, -1).astype(np.float64)
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
        ts = implied_timescale(vals[1], lag_ps)
        gap = float(vals[2] / vals[1]) if vals[1] > 0 else float("nan")

        # ---- compare on the frames (host-chunked device calls) ------------
        flat = F.reshape(W * nF, -1)

        def chi_chunked(model_iso):
            return np.concatenate(
                [np.asarray(model_iso.chicoords(jnp.asarray(flat[i:i + 8192])))
                 for i in range(0, len(flat), 8192)]).astype(np.float64).ravel()

        chi = chi_chunked(iso)
        ref = eigenfunction_on_samples(cvf, cells, vecs[:, 1], lo, hi,
                                       args.nbins, periodic=False)
        fin = np.isfinite(ref)
        corr = float(abs(np.corrcoef(chi[fin], ref[fin])[0, 1]))
        R3 = subspace_R(chi, cvf, cells, vecs, lo, hi, args.nbins, j=3)
        chi0 = chi_chunked(iso0)
        corr_campaign_msm = float(abs(np.corrcoef(chi0[fin], ref[fin])[0, 1]))
        corr_campaign_traj = float(abs(np.corrcoef(chi0, chi)[0, 1]))
        print(f"MSM eigvals {np.round(vals, 4).tolist()} (gap {gap:.3f}), "
              f"timescale {ts:.0f} ps", flush=True)
        print(f"corr(traj-chi, MSM)={corr:.4f} R3={R3:.4f} | "
              f"corr(campaign-chi, MSM)={corr_campaign_msm:.4f} "
              f"corr(campaign-chi, traj-chi)={corr_campaign_traj:.4f}",
              flush=True)

        if round_i == 0 and not args.no_exclude:
            flagged, dinfo = disconnected_trajectories(chi.reshape(W, nF))
            if len(flagged):
                print(f"chi collapsed onto disconnected walker(s) "
                      f"{flagged.tolist()} (between/within variance ratio "
                      f"{dinfo['ratio']:.0f}) — excluding and retraining "
                      f"both estimators on the connected set", flush=True)
                round1 = dict(chi_corr=corr, chi_subspace_R3=R3,
                              msm_eigvals=np.asarray(vals).tolist(),
                              variance_ratio=float(dinfo["ratio"]),
                              flagged_walkers=flagged.tolist())
                excluded = flagged.tolist()
                keep = np.setdiff1d(np.arange(W), flagged)
                F = F[keep]
                W = len(keep)
                continue
        if not args.no_robust and tq == 0.0 and _collapsed(chi):
            q1, q3 = np.percentile(chi, [25, 75])
            iqr_ratio = float((q3 - q1) / (chi.max() - chi.min()))
            print(f"chi collapsed onto a rare state (IQR/range "
                  f"{iqr_ratio:.4f}): the min/max shift-scale let a "
                  f"rarely-visited near-absorbing state own the scale — "
                  f"retraining with quantile-robust bounds "
                  f"(q={args.quantile})", flush=True)
            round_collapse = dict(
                chi_corr=corr, chi_subspace_R3=R3,
                chi_iqr_over_range=iqr_ratio,
                corr_campaign_chi_traj_chi=corr_campaign_traj)
            tq = args.quantile
            continue
        break

    # ---- variational check: chi's own autocorrelation at the lag ---------
    # For any mean-free observable f, autocorr(f, tau) <= lambda_2(tau);
    # a chi whose autocorrelation EXCEEDS the grid MSM's lambda_2 has
    # found a slower coordinate than the projected MSM can represent —
    # the honest interpretation of a low 1-D correlation.
    chi_w = chi.reshape(W, nF)
    chi_autocorr = float(np.corrcoef(chi_w[:, :-lag].ravel(),
                                     chi_w[:, lag:].ravel())[0, 1])
    print(f"variational: autocorr(chi, {lag_ps:.0f} ps) = "
          f"{chi_autocorr:.4f} vs MSM lambda_2 = {vals[1]:.4f}", flush=True)

    # ---- method equivalence on the IDENTICAL projected process -----------
    # Train ISOKANN on the TICA CVs themselves, so learner and grid MSM
    # see exactly the same information set: no hidden slow modes, the
    # estimators must agree if the learner is correct.  This is the
    # anchor's acceptance criterion; the full-feature chi above is the
    # variational statement.
    from isokann_tpu.features import FeaturesCoords
    cxs, cys = data_from_trajectories(
        [jnp.asarray(cv[w]) for w in range(W)], reverse=True, lag=lag,
        stride=stride_pairs)
    data_cv = SimulationData.from_coords(sim, cxs, cys,
                                         featurizer=FeaturesCoords())
    cv_retrained = False
    for q_cv in ([tq] if (tq or args.no_robust) else [0.0, args.quantile]):
        iso_cv = itk.Iso(data=data_cv, key=7, opt=itk.AdamRegularized(),
                         target=itk.TransformShiftscale(quantile=q_cv))
        iso_cv.run(args.iters)
        chi_cv = np.concatenate(
            [np.asarray(iso_cv.chicoords(jnp.asarray(cvf[i:i + 8192])))
             for i in range(0, len(cvf), 8192)]).astype(np.float64).ravel()
        if not _collapsed(chi_cv):
            break
        cv_retrained = True
        print(f"chi_on_CV collapsed at q={q_cv} — retrying robust",
              flush=True)
    corr_cv = float(abs(np.corrcoef(chi_cv[fin], ref[fin])[0, 1]))
    print(f"projected method equivalence: corr(chi_on_CV, MSM) = "
          f"{corr_cv:.4f} (loss {float(iso_cv.losses[-1]):.6f})",
          flush=True)

    label = args.label or ("trp-cage TC5B" if args.name == "trpcage"
                           else args.name)
    row = dict(
        system=f"{label} + OBC2 (trajectory-ISOKANN vs MSM, "
               "equilibrium ensemble)",
        artifact=os.path.relpath(args.out, ROOT),
        method="ISOKANN on data_from_trajectories (reverse-augmented) "
               "vs symmetrized Ulam MSM, SAME frames, SAME lag",
        walkers=int(W), frames_per_walker=int(nF),
        total_ns=float(W * nF * stride_ps / 1e3),
        lag_ps=float(lag_ps), n_pairs=int(len(xs)),
        train_iters=int(args.iters), train_loss=loss,
        tica_autocorr=np.asarray(lam_t).tolist(),
        msm_eigvals=np.asarray(vals).tolist(),
        msm_gap_l3_over_l2=gap, msm_implied_timescale_ps=float(ts),
        chi_corr=corr, chi_subspace_R3=R3,
        corr_campaign_chi_msm=corr_campaign_msm,
        corr_campaign_chi_traj_chi=corr_campaign_traj,
        excluded_walkers=excluded,
        round1_before_exclusion=round1,
        transform_quantile=tq,
        round_before_robust=round_collapse,
        cv_robust_retrained=cv_retrained,
        chi_autocorr_at_lag=chi_autocorr,
        msm_lambda2=float(vals[1]),
        variational_ok=bool(chi_autocorr >= float(vals[1]) - 0.02),
        cv_chi_corr=corr_cv,
        accept_threshold=args.accept,
        accepted=bool(corr_cv >= args.accept),
        acceptance_metric="cv_chi_corr (ISOKANN and grid MSM on the "
                          "identical projected process)",
        wall_s=time.time() - t0)

    iso.save(os.path.join(args.out, "iso_traj.pkl"))
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        figp = os.path.join(args.out, "traj_iso.png")
        fig, axes = plt.subplots(1, 3, figsize=(13, 4))
        axes[0].scatter(ref[fin], chi[fin], s=2, alpha=0.2)
        axes[0].set_xlabel("MSM eigenfunction $\\psi_2$")
        axes[0].set_ylabel("trajectory-trained $\\chi$")
        axes[0].set_title(f"full-feature $\\chi$: |corr| = {corr:.3f}, "
                          f"autocorr {chi_autocorr:.3f} vs "
                          f"$\\lambda_2$={vals[1]:.3f}")
        axes[1].scatter(ref[fin], chi_cv[fin], s=2, alpha=0.2, color="C1")
        axes[1].set_xlabel("MSM eigenfunction $\\psi_2$")
        axes[1].set_ylabel("$\\chi$ trained on the TICA CVs")
        axes[1].set_title(f"projected equivalence: |corr| = {corr_cv:.3f}")
        tgrid = np.arange(nF) * stride_ps / 1000.0
        chi_w = chi.reshape(W, nF)
        for w in range(0, W, max(1, W // 6)):
            axes[2].plot(tgrid, chi_w[w], lw=0.7)
        axes[2].set_xlabel("t [ns]")
        axes[2].set_ylabel("$\\chi$(traj)")
        axes[2].set_title(f"lag {lag_ps:.0f} ps, "
                          f"{W * nF * stride_ps / 1e3:.0f} ns total")
        fig.tight_layout()
        fig.savefig(figp, dpi=110)
        print(f"wrote {figp}", flush=True)
    except Exception as e:
        print(f"plot skipped: {e}", flush=True)
    # compact committed regression bundle: every 10th frame's CV,
    # MSM-eigenfunction value and both chi values, plus the recorded
    # correlations — tests/test_trpcage_golden.py re-derives corr from
    # the stored samples and pins it against the recorded value
    os.makedirs(os.path.join(ROOT, "data", "golden"), exist_ok=True)
    sl = slice(None, None, 10)
    np.savez(os.path.join(ROOT, "data", "golden",
                          f"{args.name}_traj_iso.npz"),
             cv=cvf[sl].astype(np.float32),
             ref=ref[sl].astype(np.float32),
             chi_traj=chi[sl].astype(np.float32),
             chi_campaign=chi0[sl].astype(np.float32),
             chi_cv=chi_cv[sl].astype(np.float32),
             n_walkers=W, n_frames=nF,
             chi_autocorr=chi_autocorr, msm_lambda2=float(vals[1]),
             cv_chi_corr=corr_cv,
             msm_eigvals=np.asarray(vals),
             cells=cells, vec=vecs[:, 1], lo=lo, hi=hi, nbins=args.nbins,
             lag_ps=lag_ps, chi_corr=corr, chi_subspace_R3=R3,
             corr_campaign_msm=corr_campaign_msm)
    gpath = os.path.join(ROOT, "out", "golden_md.json")
    gdoc = json.load(open(gpath)) if os.path.exists(gpath) else []
    gdoc = [r for r in gdoc
            if not (isinstance(r, dict)
                    and r.get("system", "") == row["system"])]
    gdoc.append(row)
    json.dump(gdoc, open(gpath, "w"), indent=1)
    rpath = os.path.join(args.out, "results.json")
    if os.path.exists(rpath):
        doc = json.load(open(rpath))
        doc.setdefault("results", {}).update(
            traj_iso_chi_corr=corr, traj_iso_R3=R3,
            traj_iso_lag_ps=float(lag_ps),
            traj_iso_corr_campaign_msm=corr_campaign_msm,
            traj_iso_corr_campaign=corr_campaign_traj,
            traj_iso_accepted=row["accepted"])
        json.dump(doc, open(rpath, "w"), indent=1)
    json.dump(row, open(os.path.join(args.out, "traj_iso.json"), "w"),
              indent=1)
    print(json.dumps(row, indent=1), flush=True)


if __name__ == "__main__":
    main()
