"""Lag selection for trustworthy rates (beyond-reference workflow).

The coarse rate fit (reference ``src/iso.jl:339-351``) silently
degrades when the lag is too short for the slow process: the fitted
Koopman eigenvalue lands within noise of (or past) 1 and the rates
become clamped bounds.  ``lag_sweep`` detects this and recommends the
smallest resolved lag; production campaigns
(``tools/run_trpcage_production.py``) run it as a pilot phase.

This example trains on the doublewell, sweeps a lag ladder, plots the
implied-timescale curve, and compares rates at a resolved vs an
unresolved lag.

Usage: python examples/lag_selection.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")


def main(out="out"):
    import numpy as np
    import isokann_tpu as itk

    sim = itk.Doublewell(sigma=1.0)
    iso = itk.Iso(sim=sim, nx=100, nk=5, key=0, opt=itk.AdamRegularized())
    iso.run(200)
    print(f"trained: loss {iso.losses[-1]:.4f}")

    rec, rows = iso.lag_sweep(steps=[5, 20, 50, 100, 200, 400],
                              nx=60, nk=16, key=1)
    print(f"recommended lag: {rec} steps "
          f"({rec * sim.dt:g} time units)" if rec else "no lag resolved")

    ts = [r["timescale"] for r in rows if r["resolved"]]
    if len(ts) >= 2:
        print(f"implied timescale plateau: {min(ts):.2f} .. {max(ts):.2f}")

    os.makedirs(out, exist_ok=True)
    try:
        import matplotlib
        matplotlib.use("Agg")
        from isokann_tpu.utils.plots import plot_lag_sweep
        plot_lag_sweep(rows, out=os.path.join(out, "lag_sweep.png"))
        print(f"wrote {out}/lag_sweep.png")
    except Exception as e:
        print(f"(no plot: {e})")

    Q = np.asarray(iso.rates())
    print(f"rates at the training lag (1.0): exit rates "
          f"{(-np.diag(Q)).round(4).tolist()} /unit time")


if __name__ == "__main__":
    main()
