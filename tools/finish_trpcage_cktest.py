"""Post-hoc Chapman-Kolmogorov validation for a finished trp-cage
campaign artifact.

Loads ``<out>/iso_final.pkl`` and runs ``workflows.cktest`` at the
campaign's *resolved* lag (``results.rates_resolved_lag_steps``, falling
back to the training lag): if the chi-coarse Koopman model is Markovian
there, ``K(tau)^k == K(k*tau)`` must hold within the joint-bootstrap
band, certifying that the reported macro-rates are lag-consistent and
not fit artifacts.  Merges the verdict into ``<out>/results.json`` and
renders ``<out>/cktest.png``.  Reference context: the rate fit is
``src/iso.jl:339-351``; the reference ships no CK validation.

Usage: python -u tools/finish_trpcage_cktest.py [out_dir] [nx] [nk]
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(out=None, nx=24, nk=8, factors=(2, 4)):
    import time

    import jax
    if os.environ.get("ISOKANN_CKTEST_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")
    import isokann_tpu as itk
    from isokann_tpu.workflows import cktest

    out = out or os.path.join(ROOT, "out", "trpcage_cpu")
    iso = itk.load(os.path.join(out, "iso_final.pkl"))

    path = os.path.join(out, "results.json")
    doc = json.load(open(path)) if os.path.exists(path) else {}
    results = doc.setdefault("results", {})
    base = int(results.get("rates_resolved_lag_steps")
               or iso.data.sim.steps)
    print(f"loaded: n={len(iso.data)} base lag={base} steps "
          f"nx={nx} nk={nk} factors={factors}", flush=True)

    t0 = time.time()
    try:
        ok, rows = cktest(iso, steps=base, factors=factors,
                          nx=int(nx), nk=int(nk), key=11)
        results["cktest_ok"] = bool(ok)
        results["cktest_base_steps"] = base
        results["cktest_rows"] = [
            {k: v for k, v in r.items() if k != "dev"} for r in rows]
        results["cktest_max_abs_dev"] = max(
            r["max_abs_dev"] for r in rows)
        try:
            from isokann_tpu.utils.plots import plot_cktest
            plot_cktest(rows, out=os.path.join(out, "cktest.png"))
        except Exception as e:       # rendering is best-effort
            results["cktest_plot_error"] = repr(e)
    except Exception as e:
        results["cktest_error"] = repr(e)
    results["cktest_wall_s"] = time.time() - t0
    json.dump(doc, open(path, "w"), indent=1)
    print(json.dumps({k: v for k, v in results.items()
                      if k.startswith("cktest") and k != "cktest_rows"},
                     indent=1), flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    main(args[0] if args else None,
         *(int(a) for a in args[1:3]))
