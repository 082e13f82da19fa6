"""Post-hoc analysis for a finished trp-cage production run.

Loads out/trpcage_production/iso_final.pkl (written by
tools/run_trpcage_production.py before its analysis phase) and produces
the rates / reactive-path / plot artifacts + results.json on the CPU —
used when the TPU session ended after training but before analysis.
Telemetry is recovered from the run log when available.
"""

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(out=None, log="/tmp/trpcage_prod.log"):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import isokann_tpu as itk

    out = out or os.path.join(ROOT, "out", "trpcage_production")
    iso = itk.load(os.path.join(out, "iso_final.pkl"))
    print(f"loaded: n={len(iso.data)} losses={len(iso.losses)} "
          f"final={iso.losses[-1]:.5f}", flush=True)

    telemetry = []
    if os.path.exists(log):
        for m in re.finditer(
                r"gen (\d+): n=(\d+) loss=([\d.e-]+) \((\d+)s\)",
                open(log).read()):
            telemetry.append(dict(gen=int(m.group(1)), n=int(m.group(2)),
                                  loss=float(m.group(3)),
                                  t_total=float(m.group(4))))
    wall = telemetry[-1]["t_total"] if telemetry else None
    gens = telemetry[-1]["gen"] + 1 if telemetry else None

    results = dict(generations=gens, wall_s=wall,
                   ms_per_gen=(wall / gens * 1e3) if wall else None,
                   n_final=len(iso.data),
                   loss_final=float(iso.losses[-1]))
    try:
        import warnings as _w
        with _w.catch_warnings(record=True) as wlist:
            _w.simplefilter("always")
            Q = np.asarray(iso.rates())
        results["rates_per_ps"] = Q.tolist()
        results["exit_rates"] = np.asarray(iso.exit_rates()).tolist()
        notes = [str(x.message) for x in wlist]
        if notes:
            results["rates_note"] = notes[0]
        print("rates:", results["rates_per_ps"], flush=True)
    except Exception as e:
        results["rates_error"] = repr(e)
    try:
        from isokann_tpu.analysis import save_reactive_path
        ids = save_reactive_path(
            iso, sigma=0.5, out=os.path.join(out, "reactive_path.pdb"))
        results["reactive_path_frames"] = (int(len(ids))
                                           if ids is not None else 0)
        print("reactive path frames:", results["reactive_path_frames"],
              flush=True)
    except Exception as e:
        results["reactive_path_error"] = repr(e)
    try:
        import matplotlib
        matplotlib.use("Agg")
        from isokann_tpu.utils.plots import plot_training, plot_chi
        plot_training(iso, out=os.path.join(out, "training.png"))
        plot_chi(iso, out=os.path.join(out, "chi.png"))
    except Exception as e:
        results["plot_error"] = repr(e)

    json.dump(dict(results=results, telemetry=telemetry),
              open(os.path.join(out, "results.json"), "w"), indent=1)
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
