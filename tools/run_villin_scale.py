"""Villin-scale production evidence (VERDICT round-1 weak item 6).

The reference's villin headless config (35-residue HP35, OBC2 implicit
solvent, long lags) at full scale (2500 generations x nx=1000 x 1e4-step
lag) is a multi-week single-chip workload by construction; this runs a
genuinely villin-SCALE configuration — same system, 5 ps lag (2500 x 2 fs
steps), nx=200 x nk=4, adaptive generations — and records per-generation
wall time so the full-config cost is a measured extrapolation instead of
a guess.

``--reference-lag`` (VERDICT r2 weak #9) instead measures REAL
generations at the reference's exact per-generation workload — 1e4-step
(20 ps) lags, nk=1, 60 resampled walkers per generation
(``scripts/villin.jl:10-45``) — so the full-config (2500 gen) cost is a
direct multiple of a measured number, not an extrapolation across lag
and walker count.

Usage: python -u tools/run_villin_scale.py [--generations N]
       [--reference-lag]
Writes out/villin_scale[_truelag]/results.json (+ model/plots).
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HP35 = "LSDEDFKAVFGMTRSAFANLPLWKQQNLKKEKGLF"


def main(generations=50, iters=300, nx=96, nk=4, lag_steps=2500,
         resamples=None, tag=""):
    # nx=96 x nk=4 = 384 concurrent walkers: 800-walker villin batches
    # crashed the v5e worker (same HBM/kernel fragility class as the
    # dense-path 768-walker crash; see round-2 notes)
    import isokann_tpu as itk
    from isokann_tpu.md.fixtures import peptide_pdb

    out = os.path.join(ROOT, "out", "villin_scale" + tag)
    os.makedirs(out, exist_ok=True)
    pdb = os.path.join(ROOT, "out", "villin.pdb")
    if not os.path.exists(pdb):
        peptide_pdb(HP35, pdb, minimize=True, implicit="obc2", maxiter=2000)
    sim = itk.MDSimulation(pdb=pdb, steps=lag_steps, implicit="obc2")
    print(f"{sim.natoms} atoms, lag {sim.lagtime} ps", flush=True)

    iso = itk.Iso(sim=sim, nx=nx, nk=nk, key=0, opt=itk.AdamRegularized())
    telemetry = []
    t0 = time.time()
    tg = t0
    for g in range(generations):
        try:
            iso.run(iters)
        except itk.DomainError:
            print(f"gen {g}: degenerate target", flush=True)
        iso.resample_strat(resamples or max(2, nx // 50))
        now = time.time()
        telemetry.append(dict(gen=g, n=len(iso.data),
                              loss=float(iso.losses[-1]), t_gen=now - tg))
        tg = now
        # a true-lag CPU generation can cost hours: checkpoint the
        # telemetry each generation so an outer timeout keeps the
        # measurement
        json.dump(dict(telemetry=telemetry),
                  open(os.path.join(out, "results.json"), "w"), indent=1)
        if g % 5 == 0 or g == generations - 1:
            print(f"gen {g}: n={len(iso.data)} loss={iso.losses[-1]:.5f} "
                  f"({now - t0:.0f}s)", flush=True)

    wall = time.time() - t0
    s_per_gen = wall / generations
    s_per_gen_steady = (sum(t["t_gen"] for t in telemetry[1:])
                        / max(1, len(telemetry) - 1)
                        if len(telemetry) > 1 else s_per_gen)
    r = resamples or max(2, nx // 50)
    # reference villin per-gen MD: (nx=30 + nchistrat=30) x nk=1 lags
    # (scripts/villin.jl:25-31); scale the measured per-gen cost by the
    # per-gen walker-lag ratio and the lag-step ratio
    full_gen_cost = s_per_gen_steady * (60 / (r * nk)) * (1e4 / lag_steps)
    import jax
    backend = jax.default_backend()
    results = dict(
        system="villin HP35 + OBC2", natoms=sim.natoms,
        backend=backend,
        label=("MEASURED at the reference per-generation workload"
               + (" — CPU fallback during the TPU outage; TPU rerun "
                  "stays queued" if backend == "cpu" else "")
               if lag_steps == 10000 else
               "villin-scale extrapolation run"),
        generations=generations, nx=nx, nk=nk, lag_steps=lag_steps,
        resamples_per_gen=r,
        wall_s=wall, s_per_gen=s_per_gen,
        s_per_gen_steady=s_per_gen_steady,
        loss_final=float(iso.losses[-1]), n_final=len(iso.data),
        full_config_s_per_gen_estimate=full_gen_cost,
        full_config_2500gen_days_estimate=full_gen_cost * 2500 / 86400)
    iso.save(os.path.join(out, "iso_final.pkl"))
    try:
        import matplotlib
        matplotlib.use("Agg")
        from isokann_tpu.utils.plots import plot_training
        plot_training(iso, out=os.path.join(out, "training.png"))
    except Exception as e:
        results["plot_error"] = repr(e)
    json.dump(dict(results=results, telemetry=telemetry),
              open(os.path.join(out, "results.json"), "w"), indent=1)
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--generations", type=int, default=50)
    ap.add_argument("--reference-lag", action="store_true",
                    help="measure real generations at the reference's "
                         "true villin lag (1e4 steps = 20 ps, nk=1, 60 "
                         "resamples/gen; scripts/villin.jl:10-45) "
                         "instead of extrapolating from 2500-step lags")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (outage fallback; the "
                         "artifact is labeled as such)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.reference_lag:
        main(generations=min(args.generations, 5), iters=args.iters,
             nx=120, nk=1, lag_steps=10000, resamples=60, tag="_truelag")
    else:
        main(generations=args.generations, iters=args.iters)
