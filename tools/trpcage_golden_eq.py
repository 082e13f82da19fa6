"""Equilibrium-ensemble golden anchor for the trp-cage campaign chi.

The campaign-data anchor (``tools/trpcage_golden.py``) is an honest
negative on the round-4 artifact: 8.4k adaptively-sampled burst pairs
give an Ulam MSM with a DENSE spectrum (gap l3/l2 = 0.96) whose
individual eigenvectors are not identifiable (chi_corr 0.29,
subspace_R3 0.51).  This tool builds the ground truth the proper way —
from a dedicated EQUILIBRIUM trajectory ensemble:

- W walkers start chi-stratified (both basins + transition region
  covered immediately), then run unbiased underdamped Langevin with NO
  velocity resampling for ``--ns`` nanoseconds each;
- frames are saved every ``--stride-ps``; the MSM uses sliding-window
  trajectory pairs at the campaign lag, with the detailed-balance
  (symmetrized-count) estimator that equilibrium trajectories justify
  and burst data does not;
- chi is compared to the slowest nontrivial eigenfunction ON the
  equilibrium frames (the campaign anchor could only compare on its own
  biased samples), with a walker-bootstrap CI on the correlation.

Fault posture (docs/v5e_fault_report.md class c): device work is
dispatched as one jitted (W, 3N) block program per stride — a few
thousand sequential steps per program — and frames checkpoint to disk
every ``--checkpoint-every`` dispatches, so a worker crash costs at
most that window; ``--resume`` continues from the checkpoint.

Usage:
  python -u tools/trpcage_golden_eq.py [artifact_dir] --ns 5 --walkers 32
"""

import argparse
import json
import os
import sys
import time
import warnings

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from trpcage_golden import ca_pairdists, subspace_R  # noqa: E402


def crossings(series, lo=0.35, hi=0.65):
    """Count full transitions of a scalar trajectory across [lo, hi]."""
    import numpy as np

    s = np.asarray(series)
    state, n = 0, 0
    for v in s:
        if not np.isfinite(v):
            continue
        if v < lo:
            if state == 2:
                n += 1
            state = 1
        elif v > hi:
            if state == 1:
                n += 1
            state = 2
    return n


def generate(out, walkers, ns, stride_ps, checkpoint_every, budget_s,
             resume):
    """Run (or resume) the equilibrium ensemble; returns (frames (W, F,
    3N) float32 np, stride_ps, walker_ok)."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    import isokann_tpu as itk
    from isokann_tpu.md import integrators as I
    from isokann_tpu.md.vsites import place_vsites_flat
    from isokann_tpu.sample import subsample_uniformgrid

    ck = os.path.join(out, "golden_eq_frames.npz")
    iso = itk.load(os.path.join(out, "iso_final.pkl"))
    sim = iso.data.sim
    dt_ps = float(sim.step)
    stride = max(1, int(round(stride_ps / dt_ps)))
    stride_ps = stride * dt_ps
    nframes = int(round(ns * 1000.0 / stride_ps))

    done = 0
    frames = []
    if resume and os.path.exists(ck):
        with np.load(ck) as z:
            prev = z["frames"]                     # (W, F0, 3N)
            x = jnp.asarray(z["x"])
            v = jnp.asarray(z["v"])
            kstate = jnp.asarray(z["key"])
        if prev.shape[0] != walkers:
            raise SystemExit(f"checkpoint has {prev.shape[0]} walkers, "
                             f"requested {walkers}")
        frames = [prev[:, i] for i in range(prev.shape[1])]
        done = len(frames)
        print(f"resuming from {ck}: {done}/{nframes} frames", flush=True)
    if done == 0:
        # chi-stratified starts: both basins and the transition region
        # are populated from frame 0 (row-conditional MSM estimates are
        # start-distribution-free; this just buys coverage)
        chi = np.asarray(iso.chis(), np.float64).ravel()
        sel = subsample_uniformgrid(chi, walkers,
                                    rng=np.random.default_rng(7))
        x = jnp.asarray(np.asarray(iso.data.coords)[sel])
        kv, kstate = jax.random.split(jax.random.PRNGKey(11))
        v = I.maxwell_boltzmann(kv, sim.masses3, sim.temp, x.shape)

    block = sim._block_fn(walkers, stride, resample_velocities=False)
    t0 = time.time()
    i = done
    while i < nframes:
        kstep, kstate = jax.random.split(kstate)
        x, v = block(x, v, kstep)
        frames.append(np.asarray(x, np.float32))
        if i == done:
            t1 = time.time()
            print(f"first dispatch (compile) {t1 - t0:.1f}s", flush=True)
        elif i == done + 1:
            # steady-state estimate from the SECOND dispatch (the first
            # carries the remote compile)
            per = time.time() - t1
            est = per * (nframes - done - 1)
            print(f"dispatch {per:.2f}s -> est remaining {est:.0f}s for "
                  f"{nframes - done - 1} frames", flush=True)
            if budget_s and est > budget_s:
                nframes = done + max(10, int(budget_s / per))
                print(f"budget {budget_s}s: clamping to {nframes} frames "
                      f"({nframes * stride_ps / 1000:.2f} ns/walker)",
                      flush=True)
        if (i + 1) % checkpoint_every == 0 or i + 1 == nframes:
            np.savez(ck, frames=np.stack(frames, axis=1),
                     x=np.asarray(x), v=np.asarray(v),
                     key=np.asarray(kstate))
            print(f"[{i + 1}/{nframes}] {time.time() - t0:.0f}s "
                  f"(checkpointed)", flush=True)
        i += 1
    F = np.stack(frames, axis=1)                   # (W, F, 3N)
    W = F.shape[0]
    sysm = sim.system
    F = place_vsites_flat(sysm, jnp.asarray(F.reshape(W * F.shape[1], -1)))
    F = np.asarray(F, np.float32).reshape(W, -1, F.shape[-1])
    walker_ok = np.isfinite(F).all(axis=(1, 2))
    if not walker_ok.all():
        warnings.warn(f"{int((~walker_ok).sum())} of {W} walkers diverged; "
                      "excluded from the golden build")
    return iso, sim, F, stride_ps, walker_ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?",
                    default=os.path.join(ROOT, "out", "trpcage_tpu"))
    ap.add_argument("--walkers", type=int, default=32)
    ap.add_argument("--ns", type=float, default=5.0,
                    help="simulated time per walker")
    ap.add_argument("--stride-ps", type=float, default=12.5)
    ap.add_argument("--burnin-ps", type=float, default=250.0)
    ap.add_argument("--nbins", type=int, default=12)
    ap.add_argument("--min-count", type=int, default=2)
    ap.add_argument("--n-pca", type=int, default=10)
    ap.add_argument("--lag-ps", type=float, default=None,
                    help="MSM lag (default: the campaign lag)")
    ap.add_argument("--checkpoint-every", type=int, default=40)
    ap.add_argument("--budget-s", type=float, default=1800.0)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--accept", type=float, default=0.95)
    ap.add_argument("--bootstrap", type=int, default=100)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (analysis-only reruns "
                         "from a complete frame checkpoint don't need "
                         "the chip)")
    ap.add_argument("--name", type=str, default="trpcage",
                    help="system name: fallback structure out/<name>.pdb "
                         "and committed anchor data/golden/"
                         "<name>_msm_eq.npz (the pipeline is sequence-"
                         "agnostic; pair with run_trpcage_production.py "
                         "--sequence/--name)")
    ap.add_argument("--label", type=str, default=None,
                    help="human-readable system label for the evidence "
                         "row (default: trp-cage wording for the trpcage "
                         "name, else the name)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    t0 = time.time()
    iso, sim, F, stride_ps, walker_ok = generate(
        args.out, args.walkers, args.ns, args.stride_ps,
        args.checkpoint_every, args.budget_s, not args.no_resume)
    from isokann_tpu.analysis.msm import (
        koopman_eigenfunctions, eigenfunction_on_samples,
        implied_timescale, tica, trajectory_pairs,
        ulam_transition_matrix)
    from isokann_tpu.md.pdbio import read_pdb

    lag_ps = args.lag_ps or float(sim.lagtime)
    lag_frames = max(1, int(round(lag_ps / stride_ps)))
    lag_ps = lag_frames * stride_ps
    burn = int(round(args.burnin_ps / stride_ps))
    W, nF = F.shape[:2]
    print(f"ensemble: {W} walkers x {nF} frames @ {stride_ps} ps "
          f"({nF * stride_ps / 1000:.2f} ns each, {int(walker_ok.sum())} "
          f"finite), burn-in {burn} frames, MSM lag {lag_ps} ps "
          f"({lag_frames} frames)", flush=True)
    F = F[:, burn:]
    nF = F.shape[1]

    pdb = getattr(sim, "pdbfile", None) or os.path.join(
        ROOT, "out", f"{args.name}.pdb")
    p = read_pdb(pdb)
    ca_idx = np.asarray([i for i, nm in enumerate(p.atom_names)
                         if nm == "CA"], np.int64)
    feats = ca_pairdists(F.reshape(W * nF, -1),
                         ca_idx).reshape(W, nF, -1).astype(np.float64)

    ok_idx = np.where(walker_ok)[0]
    f_x, f_y = trajectory_pairs(feats, lag_frames, ok_idx)
    lam_t, V, mu = tica(f_x, f_y, dim=2, n_pca=args.n_pca)
    cv = ((feats.reshape(W * nF, -1) - mu) @ V).reshape(W, nF, 2)
    cv_ok = cv[walker_ok].reshape(-1, 2)
    lo, hi = cv_ok.min(axis=0), cv_ok.max(axis=0)
    pad = 1e-9 + 0.02 * (hi - lo)
    lo, hi = lo - pad, hi + pad

    def build(walker_ids):
        cx, cy = trajectory_pairs(cv, lag_frames, walker_ids)
        P, cells, counts = ulam_transition_matrix(
            cx, cy, lo, hi, args.nbins, periodic=False,
            min_count=args.min_count, symmetrize=True)
        vals, vecs = koopman_eigenfunctions(P, k=4)
        return P, cells, vals, vecs

    P, cells, vals, vecs = build(ok_idx)
    ts = implied_timescale(vals[1], lag_ps)
    gap = float(vals[2] / vals[1]) if vals[1] > 0 else float("nan")

    # chi on the equilibrium frames (the unbiased comparison set),
    # host-chunked: one device call per 8192 frames bounds the
    # featurizer gather memory at the 50k-frame ensemble scale
    import jax.numpy as jnp
    flat = F.reshape(W * nF, -1)
    chi = np.concatenate(
        [np.asarray(iso.chicoords(jnp.asarray(flat[i:i + 8192])))
         for i in range(0, len(flat), 8192)]).reshape(W, nF, -1)[..., 0]
    chi = chi.astype(np.float64)
    chi_flat = chi[walker_ok].ravel()
    ref = eigenfunction_on_samples(cv[walker_ok].reshape(-1, 2), cells,
                                   vecs[:, 1], lo, hi, args.nbins,
                                   periodic=False)
    fin = np.isfinite(ref)
    corr = float(abs(np.corrcoef(chi_flat[fin], ref[fin])[0, 1]))
    coverage = float(fin.mean())
    R3 = subspace_R(chi_flat, cv[walker_ok].reshape(-1, 2), cells, vecs,
                    lo, hi, args.nbins, j=3)

    # walker-bootstrap CI on the correlation (the anchor's own noise)
    rng = np.random.default_rng(3)
    bs = []
    for _ in range(args.bootstrap):
        try:
            _, c_b, v_b, e_b = build(rng.choice(ok_idx, len(ok_idx), True))
            r_b = eigenfunction_on_samples(
                cv[walker_ok].reshape(-1, 2), c_b, e_b[:, 1], lo, hi,
                args.nbins, periodic=False)
            f_b = np.isfinite(r_b)
            bs.append(abs(np.corrcoef(chi_flat[f_b], r_b[f_b])[0, 1]))
        except Exception:
            pass
    ci = (np.percentile(bs, [2.5, 97.5]).tolist() if len(bs) >= 20
          else None)

    n_trans_chi = sum(crossings(chi[w]) for w in ok_idx)
    ref_grid = eigenfunction_on_samples(
        cv.reshape(-1, 2), cells, vecs[:, 1], lo, hi, args.nbins,
        periodic=False).reshape(W, nF)
    g_lo, g_hi = np.nanpercentile(ref_grid[walker_ok], [25, 75])
    n_trans_msm = sum(crossings(ref_grid[w], g_lo, g_hi) for w in ok_idx)

    print(f"TICA autocorrs {np.round(lam_t, 4).tolist()}; symmetrized "
          f"Ulam cells={len(cells)} eigvals={np.round(vals, 4).tolist()} "
          f"(gap l3/l2={gap:.3f}) implied timescale={ts:.1f} ps",
          flush=True)
    print(f"corr(chi, golden)={corr:.4f} (bootstrap 95% CI {ci}) "
          f"subspace_R3={R3:.4f} coverage={coverage:.3f} "
          f"transitions: chi={n_trans_chi} msm={n_trans_msm}", flush=True)

    label = args.label or ("trp-cage TC5B" if args.name == "trpcage"
                           else args.name)
    row = dict(
        system=f"{label} + OBC2 (equilibrium ensemble)",
        artifact=os.path.relpath(args.out, ROOT),
        method="chi-stratified starts -> unbiased Langevin ensemble; "
               "TICA(CA pairdists) CVs; symmetrized Ulam MSM on "
               "sliding-window trajectory pairs",
        walkers=int(walker_ok.sum()), frames_per_walker=int(nF),
        stride_ps=float(stride_ps),
        total_ns=float(walker_ok.sum() * nF * stride_ps / 1000.0),
        lag_ps=float(lag_ps), nbins=int(args.nbins),
        n_cells=int(len(cells)),
        tica_autocorr=np.asarray(lam_t).tolist(),
        msm_eigvals=np.asarray(vals).tolist(), msm_gap_l3_over_l2=gap,
        msm_implied_timescale_ps=float(ts),
        chi_corr=corr, chi_corr_ci95=ci, chi_subspace_R3=R3,
        coverage=coverage,
        transitions_chi=int(n_trans_chi), transitions_msm=int(n_trans_msm),
        accept_threshold=args.accept, accepted=bool(corr >= args.accept),
        wall_s=time.time() - t0)

    np.savez(os.path.join(args.out, "trpcage_golden_eq.npz"),
             cells=cells, vec=vecs[:, 1], vecs=vecs, eigvals=vals,
             lo=lo, hi=hi, nbins=args.nbins, cv=cv.astype(np.float32),
             chi=chi.astype(np.float32), walker_ok=walker_ok,
             tica_components=V, tica_mean=mu, lag_ps=lag_ps,
             stride_ps=stride_ps)
    os.makedirs(os.path.join(ROOT, "data", "golden"), exist_ok=True)
    np.savez(os.path.join(ROOT, "data", "golden",
                          f"{args.name}_msm_eq.npz"),
             cells=cells, vec=vecs[:, 1], vecs=vecs, eigvals=vals,
             lo=lo, hi=hi, nbins=args.nbins, lag_ps=lag_ps,
             cv_sample=cv[walker_ok][:, ::10].reshape(-1, 2),
             chi_sample=chi[walker_ok][:, ::10].ravel())

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
            golden_eq_chi_corr=corr, golden_eq_ci95=ci,
            golden_eq_subspace_R3=R3, golden_eq_timescale_ps=float(ts),
            golden_eq_total_ns=row["total_ns"],
            golden_eq_transitions=int(n_trans_msm),
            golden_eq_accepted=row["accepted"])
        json.dump(doc, open(rpath, "w"), indent=1)
    print(json.dumps(row, indent=1), flush=True)


if __name__ == "__main__":
    main()
