"""Post-hoc lag-resolved rates for a finished trp-cage campaign artifact.

Loads ``<out>/iso_final.pkl``, runs ``workflows.rates_resolved`` with the
trained chi (no retraining) and merges the result into
``<out>/results.json``.  Used when the campaign process ended before the
rates_resolved analysis phase (e.g. the 2026-08-18 tunnel outage's CPU
fallback run).  Reference context for the rate fit: src/iso.jl:339-351.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(out=None, nx=64, nk=4):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import isokann_tpu as itk
    from isokann_tpu.workflows import rates_resolved

    out = out or os.path.join(ROOT, "out", "trpcage_cpu")
    iso = itk.load(os.path.join(out, "iso_final.pkl"))
    steps = iso.data.sim.steps
    print(f"loaded: n={len(iso.data)} steps/lag={steps}", flush=True)

    path = os.path.join(out, "results.json")
    doc = json.load(open(path)) if os.path.exists(path) else {}
    results = doc.setdefault("results", {})
    try:
        Qr, row = rates_resolved(iso, lags=[steps * m for m in (5, 25)],
                                 nx=nx, nk=nk)
        if Qr is not None:
            results["rates_resolved_per_ps"] = np.asarray(Qr).tolist()
            results["rates_resolved_exit"] = (-np.diag(Qr)).tolist()
            results["rates_resolved_lag_steps"] = row["steps"]
            results["rates_resolved_eigs"] = row["eigs"]
        else:
            results["rates_resolved_rows"] = row
    except Exception as e:
        results["rates_resolved_error"] = repr(e)
    json.dump(doc, open(path, "w"), indent=1)
    print(json.dumps({k: v for k, v in results.items()
                      if k.startswith("rates_resolved")}, indent=1),
          flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:2])
