"""Reference-scale trp-cage production run (VERDICT round-1 item 9).

The reference's production config (``scripts/trpcage.jl``): implicit-
solvent trp-cage, 100-step lag, nx=100 x nk=8, adaptive chi-stratified
resampling, data cutoff 2000, ~1000 generations.  Round 1 ran 100
generations as the capstone; this runs the full 1000 and archives
everything the reference campaign produces: loss/telemetry series,
rates, exit rates, reactive path, plots, and the final model.

Usage: python -u tools/run_trpcage_production.py [--generations N]
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(generations=1000, iters=300, resamples=3, cutoff=2000,
         out=None):
    import numpy as np

    import isokann_tpu as itk
    from isokann_tpu.md.fixtures import peptide_pdb

    out = out or os.path.join(ROOT, "out", "trpcage_production")
    os.makedirs(out, exist_ok=True)

    TC5B = "NLYIQWLKDGGPSSGRPPPS"
    pdb = os.path.join(ROOT, "out", "trpcage.pdb")
    if not os.path.exists(pdb):
        peptide_pdb(TC5B, pdb, minimize=True, implicit="obc2", maxiter=1500)
    sim = itk.MDSimulation(pdb=pdb, steps=100, implicit="obc2")
    print(f"{sim.natoms} atoms, lag {sim.lagtime} ps", flush=True)

    iso = itk.Iso(sim=sim, nx=100, nk=8, key=0, opt=itk.AdamRegularized())

    telemetry = []
    t_start = time.time()
    t_gen = t_start
    for g in range(generations):
        try:
            iso.run(iters)
        except itk.DomainError:
            print(f"gen {g}: degenerate target, resampling", flush=True)
        iso.resample_strat(resamples)
        if len(iso.data) > cutoff:
            iso.data = iso.data[len(iso.data) - cutoff:]
        now = time.time()
        telemetry.append(dict(gen=g, n=len(iso.data),
                              loss=float(iso.losses[-1]),
                              t_gen=now - t_gen, t_total=now - t_start))
        t_gen = now
        if g % 50 == 0 or g == generations - 1:
            print(f"gen {g}: n={len(iso.data)} loss={iso.losses[-1]:.5f} "
                  f"({now - t_start:.0f}s)", flush=True)

    wall = time.time() - t_start
    print(f"total {wall:.1f}s for {generations} generations "
          f"({wall / generations * 1e3:.0f} ms/gen)", flush=True)

    # --- analysis artifacts -------------------------------------------------
    iso.save(os.path.join(out, "iso_final.pkl"))

    results = dict(generations=generations, iters_per_gen=iters,
                   wall_s=wall, ms_per_gen=wall / generations * 1e3,
                   n_final=len(iso.data),
                   loss_final=float(iso.losses[-1]))
    try:
        Q = np.asarray(iso.rates())
        results["rates_per_ps"] = Q.tolist()
        results["exit_rates"] = np.asarray(iso.exit_rates()).tolist()
    except Exception as e:
        results["rates_error"] = str(e)
    try:
        from isokann_tpu.analysis import save_reactive_path
        ids = save_reactive_path(
            iso, sigma=0.5, out=os.path.join(out, "reactive_path.pdb"))
        results["reactive_path_frames"] = (int(len(ids))
                                           if ids is not None else 0)
    except Exception as e:
        results["reactive_path_error"] = str(e)
    try:
        import matplotlib
        matplotlib.use("Agg")
        from isokann_tpu.utils.plots import plot_training, plot_chi
        plot_training(iso, out=os.path.join(out, "training.png"))
        plot_chi(iso, out=os.path.join(out, "chi.png"))
    except Exception as e:
        results["plot_error"] = str(e)

    json.dump(dict(results=results, telemetry=telemetry[-100:]),
              open(os.path.join(out, "results.json"), "w"), indent=1)
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--generations", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=300)
    args = ap.parse_args()
    main(generations=args.generations, iters=args.iters)
