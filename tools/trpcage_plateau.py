"""Extend the trp-cage implied-timescale ladder one rung past the
campaign lag and re-run the CK test at factors {2, 4}.

Round-4 verdict item: the committed campaign's resolved ladder tops out
at 125 ps (62500 steps) with rates_plateau_ratio [0.70, 1.04] — the
25 ps rung's 545 ps implied timescale disagrees ~20-30% with the 125 ps
rung's 646 ps, and the CK test ran at a single factor.  This tool runs,
on the COMMITTED campaign artifact (out/trpcage_tpu/iso_final.pkl):

1. rates_resolved over [12500, 62500, 312500] steps (25/125/625 ps) —
   the 312500-step rung propagates through the staged long-lag path
   (mdsim._propagate_staged, class-c-fault-safe);
2. cktest at base 62500 with factors (2, 4) (125 -> 250/500 ps);
3. the plateau verdict: ratio of implied timescales across the top two
   resolved rungs in [0.8, 1.25], plus bootstrap-band cross-coverage of
   the exit rates; if unresolved, the honest bound with the band.

Writes out/trpcage_tpu/plateau_ext.json.

Usage: python -u tools/trpcage_plateau.py [out/trpcage_tpu] [--cpu]
           [--nx 100] [--nk 8] [--ck-nx 50] [--max-batch 256]
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?",
                    default=os.path.join(ROOT, "out", "trpcage_tpu"))
    ap.add_argument("--nx", type=int, default=100)
    ap.add_argument("--nk", type=int, default=8)
    ap.add_argument("--ck-nx", type=int, default=50)
    ap.add_argument("--ck-nk", type=int, default=8)
    ap.add_argument("--max-batch", type=int, default=256)
    ap.add_argument("--lags", type=int, nargs="+",
                    default=[12500, 62500, 312500])
    ap.add_argument("--skip-ck", action="store_true")
    ap.add_argument("--skip-rates", action="store_true",
                    help="reuse the existing plateau_ext.json rates and "
                         "run only the CK legs (resume after a kill)")
    ap.add_argument("--ck-factors", type=int, nargs="+", default=[2, 4])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import isokann_tpu as itk
    from isokann_tpu.workflows import cktest, rates_resolved

    t0 = time.time()
    iso = itk.load(os.path.join(args.out, "iso_final.pkl"))
    sim = iso.data.sim
    dt_per_step = sim.lagtime / sim.steps
    print(f"{sim.natoms} atoms, campaign lag {sim.steps} steps "
          f"({sim.lagtime} ps); ladder {args.lags} steps", flush=True)

    path = os.path.join(args.out, "plateau_ext.json")
    if args.skip_rates:
        res = json.load(open(path))
        _run_ck(args, iso, res, path, t0)
        return

    res = dict(artifact=os.path.relpath(args.out, ROOT),
               lags_steps=args.lags, nx=args.nx, nk=args.nk,
               max_batch=args.max_batch)

    Qr, row, rrows = rates_resolved(
        iso, lags=args.lags, nx=min(args.nx, len(iso.data)), nk=args.nk,
        key=13, return_rows=True, max_batch=args.max_batch)
    res["rows"] = [{k: v for k, v in r.items() if k != "K"} for r in rrows]
    resolved = [r for r in rrows
                if r["resolved"] and np.isfinite(r["timescale"])]
    res["resolved_steps"] = [r["steps"] for r in resolved]
    if len(resolved) >= 2:
        a, b = resolved[-2], resolved[-1]
        ratio = b["timescale"] / a["timescale"]
        res["top_rungs_steps"] = [a["steps"], b["steps"]]
        res["top_rungs_timescale_ps"] = [a["timescale"], b["timescale"]]
        res["plateau_ratio"] = float(ratio)
        res["plateau_ok"] = bool(0.8 <= ratio <= 1.25)
        # bootstrap-band cross-coverage: does each rung's point estimate
        # fall inside the other's 95% exit-rate band?
        cover = []
        for p, q in ((a, b), (b, a)):
            if "exit_rates_lo" in q and "exit_rates" in p:
                lo, hi = np.asarray(q["exit_rates_lo"]), np.asarray(
                    q["exit_rates_hi"])
                pt = np.asarray(p["exit_rates"])
                cover.append(bool(np.all((pt >= lo) & (pt <= hi))))
        res["band_cross_coverage"] = cover
    print(f"[plateau] resolved rungs {res['resolved_steps']}; "
          f"ratio {res.get('plateau_ratio')}, "
          f"ok={res.get('plateau_ok')} ({time.time() - t0:.0f}s)",
          flush=True)
    # checkpoint after the rates phase: the CK legs are the slowest part
    # and a wall-clock kill there must not lose the ladder (it did once —
    # the round-5 first attempt died in the factor-4 leg after 2.5 h)
    res["wall_s"] = time.time() - t0
    json.dump(res, open(path, "w"), indent=1, default=float)

    if not args.skip_ck:
        _run_ck(args, iso, res, path, t0)
    else:
        print(f"wrote {path} ({res['wall_s']:.0f}s)", flush=True)


def _run_ck(args, iso, res, path, t0):
    """CK legs, one factor per call, checkpointing the JSON after each:
    each leg repropagates tau and k*tau, so a kill loses at most the
    running leg.  Factors already recorded in ``res`` are skipped
    (resume semantics)."""
    import numpy as np  # noqa: F811

    from isokann_tpu.workflows import cktest

    import json as _json
    import time as _time

    tck = _time.time()
    ck_rows = [r for r in res.get("cktest_rows", [])
               if isinstance(r, dict) and "factor" in r]
    done = {r["factor"] for r in ck_rows}
    ck_oks = [bool(r.get("ok", True)) for r in ck_rows]
    for fac in args.ck_factors:
        if fac in done:
            print(f"[cktest] k={fac} already recorded, skipping",
                  flush=True)
            continue
        ok_f, rows_f = cktest(
            iso, steps=62500, factors=(fac,), nx=args.ck_nx,
            nk=args.ck_nk, key=11, max_batch=args.max_batch)
        ck_rows += [{k: v for k, v in r.items() if k != "dev"}
                    for r in rows_f]
        ck_oks.append(bool(ok_f))
        res["cktest_base_steps"] = 62500
        res["cktest_ok"] = all(ck_oks)
        res["cktest_factors_done"] = [r["factor"] for r in ck_rows]
        res["cktest_rows"] = ck_rows
        res["cktest_max_abs_dev"] = max(r["max_abs_dev"] for r in ck_rows)
        res["cktest_wall_s"] = res.get("cktest_wall_s", 0.0) + (
            _time.time() - tck)
        res.pop("cktest_factor4", None)   # clears the kill marker
        res["wall_s"] = _time.time() - t0
        _json.dump(res, open(path, "w"), indent=1, default=float)
        tck = _time.time()
    print(f"[cktest] ok={res.get('cktest_ok')} "
          f"max_dev={res.get('cktest_max_abs_dev', float('nan')):.3f}",
          flush=True)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
