"""Two-regime Girsanov evidence figure.

Left: analytic doublewell (tools/optcontrol_analytic.py) — raw-estimator
variance ratio (plain/biased, >1 = bias wins) rises toward the
zero-variance limit as forcescale -> 1 with a near-exact chi.
Right: MD scale (tools/girsanov_variance.py, vacuum ala2 at a 1 ps lag)
— every estimator loses (ratios << 1) as the weights degenerate.

Writes out/girsanov_regimes.png from the two committed JSON artifacts.
"""

import json
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BLUE, ORANGE, INK, MUTED = "#2563eb", "#ea580c", "#1f2937", "#6b7280"


def rows(doc, key):
    fs = sorted(doc["by_forcescale"], key=float)
    r = [doc["by_forcescale"][f][key] for f in fs]
    x = [float(f) for f in fs]
    mid = [v["ratio"] if isinstance(v, dict) else v for v in r]
    lo = [v["ci95"][0] if isinstance(v, dict) else None for v in r]
    hi = [v["ci95"][1] if isinstance(v, dict) else None for v in r]
    return np.array(x), np.array(mid, float), lo, hi


def errbars(ax, x, y, lo, hi, color, marker, label):
    if lo[0] is not None:
        yerr = np.vstack([y - np.array(lo, float),
                          np.array(hi, float) - y])
        ax.errorbar(x, y, yerr=yerr, color=color, marker=marker, ms=6,
                    lw=2, capsize=3, label=label)
    else:
        ax.plot(x, y, color=color, marker=marker, ms=6, lw=2, label=label)


def main(out=None):
    ana = json.load(open(os.path.join(ROOT, "out", "optcontrol_analytic.json")))
    # the canonical artifact IS the full 64-rep MD run (the cpu64 copy
    # is kept for older citations)
    mdp = os.path.join(ROOT, "out", "girsanov_variance.json")
    if not os.path.exists(mdp):
        mdp = os.path.join(ROOT, "out", "girsanov_variance_cpu64.json")
    md = json.load(open(mdp))

    fig, axes = plt.subplots(1, 2, figsize=(9.2, 3.8), sharey=False)

    ax = axes[0]
    x, y, lo, hi = rows(ana, "var_ratio_raw")
    # per-row CI keys in the analytic artifact
    lo = [ana["by_forcescale"][f]["var_ratio_raw_ci95"][0]
          for f in sorted(ana["by_forcescale"], key=float)]
    hi = [ana["by_forcescale"][f]["var_ratio_raw_ci95"][1]
          for f in sorted(ana["by_forcescale"], key=float)]
    errbars(ax, x, y, lo, hi, BLUE, "o", "raw weighted mean")
    x2, y2, _, _ = rows(ana, "var_ratio_selfnorm")
    errbars(ax, x2, y2,
            [ana["by_forcescale"][f]["var_ratio_selfnorm_ci95"][0]
             for f in sorted(ana["by_forcescale"], key=float)],
            [ana["by_forcescale"][f]["var_ratio_selfnorm_ci95"][1]
             for f in sorted(ana["by_forcescale"], key=float)],
            ORANGE, "s", "self-normalized")
    ax.set_title(f"Doublewell, chi |corr| = {ana['chi_corr_exact']:.3f} "
                 "(controllable regime)", fontsize=10, color=INK)
    ax = axes[1]
    x, y, lo, hi = rows(md, "var_ratio_raw_overall")
    errbars(ax, x, y, lo, hi, BLUE, "o", "raw weighted mean")
    x2, y2, lo2, hi2 = rows(md, "var_ratio_selfnorm_overall")
    errbars(ax, x2, y2, lo2, hi2, ORANGE, "s", "self-normalized")
    ax.set_title(f"Vacuum ala2, {md['lag_ps']:.0f} ps lag "
                 f"(MD scale, reps={md['reps']})", fontsize=10, color=INK)

    for ax in axes:
        ax.set_yscale("log")
        ax.axhline(1.0, color=MUTED, lw=1, ls="--")
        ax.text(ax.get_xlim()[1], 1.0, " break-even", va="center",
                ha="left", color=MUTED, fontsize=8, clip_on=False)
        ax.set_xlabel("forcescale", color=INK)
        ax.grid(True, which="major", axis="y", color="#e5e7eb", lw=0.7)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        ax.tick_params(colors=MUTED)
    axes[0].set_ylabel("variance ratio  plain / biased\n(>1 = bias wins)",
                       color=INK)
    axes[0].legend(frameon=False, fontsize=9, loc="upper left")

    fig.suptitle("Optimal-control importance sampling: two regimes",
                 fontsize=12, color=INK)
    fig.tight_layout(rect=(0, 0, 1, 0.96))
    out = out or os.path.join(ROOT, "out", "girsanov_regimes.png")
    fig.savefig(out, dpi=150)
    print("wrote", out)


if __name__ == "__main__":
    main(*(sys.argv[1:2]))
