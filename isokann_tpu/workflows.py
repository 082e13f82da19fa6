"""High-level workflow runners.

TPU-native rebuild of ``src/workflows.jl``: adaptive metadynamics,
combined KDE + metadynamics training loops.  Plotting hooks are optional
(pass ``plots=list`` to collect matplotlib figures).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .simulators.metadynamics import MetadynamicsSimulation


def adaptive_metadynamics(iso, deposit=None, x0=None, maxnorm=20.0, key=None,
                          **mdargs):
    """One generation of chi-metadynamics sampling: run a biased trajectory
    and deposit its frames into the training data
    (reference ``adaptive_metadynamics``, ``src/workflows.jl:16-24``)."""
    sim = iso.data.sim
    deposit = sim.steps if deposit is None else deposit
    if x0 is None:
        x0 = np.asarray(iso.data.coords)[-1]
    md = MetadynamicsSimulation(iso, **mdargs)
    t = md.trajectory(x0=x0, steps=sim.steps * max(1, deposit // sim.steps),
                      saveevery=deposit, key=key)
    xnew = np.asarray(t.values)
    drift = np.linalg.norm(xnew[-1] - np.asarray(x0))
    assert drift < maxnorm, (
        f"metadynamics trajectory drifted {drift:.2f} > maxnorm={maxnorm}")
    iso.addcoords(xnew)
    return dict(t=t, md=md, xnew=xnew)


def run_metadynamics(iso, generations=100, iter=100, plots=None, **mdargs):
    """generations x (metadynamics sampling -> train)
    (reference ``run_metadynamics!``, ``src/workflows.jl:4-14``)."""
    for _ in range(generations):
        adaptive_metadynamics(iso, **mdargs)
        iso.run(iter)
        if plots is not None:
            from .utils.plots import plot_training
            plots.append(plot_training(iso))
    return iso


def run_kde_dash(iso, generations=1, plots=None, **kwargs):
    """KDE-adaptive training with optional dashboard collection
    (reference ``run_kde_dash!``, ``src/workflows.jl:39-49``)."""
    for _ in range(generations):
        iso.run_kde(generations=1, **kwargs)
        if plots is not None:
            from .utils.plots import plot_training
            plots.append(plot_training(iso))
    return plots


def run_both(iso, generations=100, samples_kde=1, iter=100, plots=None,
             **mdargs):
    """Alternate KDE resampling and metadynamics generations
    (reference ``run_both!``, ``src/workflows.jl:51-56``)."""
    for _ in range(generations):
        iso.run_kde(generations=1, kde=samples_kde, iter=iter)
        run_metadynamics(iso, generations=1, iter=iter, plots=plots, **mdargs)
    return iso


def run_girsanov(iso, generations=1, iter=100, kde=1, forcescale=1.0,
                 cutoff=np.inf, showprogress=False):
    """Koopman-weighted adaptive training: per generation, refresh the
    chi-derived optimal-control bias (``integrators.optcontrol``), resample
    new start points whose Koopman bursts are integrated *under the bias*
    (Girsanov-reweighted ``WeightedSamples``), and train on the weighted
    expectation.

    The importance-sampling bias drives walkers across the transition
    region, cutting the variance of the Kchi estimate exactly where the
    chi gradient lives (the study the reference runs by hand with
    ``optcontrol`` + ``langevin_girsanov!``,
    ``src/simulators/openmm.jl:569-667``).  On TPU, eligible systems
    integrate bias and weights inside the fused Pallas kernel
    (``md/pallas_md.aboba_girsanov_fused``) — the per-generation model
    refresh reuses one compiled program.

    Before chi contracts (lambda >= 1) the generation samples unbiased.

    Practical regime (quantified in tools/girsanov_variance.py, results
    in out/girsanov_variance.json): the Girsanov weights are exact
    martingales (E[w] = 1 verified for arbitrary biases), but their
    variance grows exponentially with sum |Delta eta|^2 along the lag —
    at 1 ps lags the full-strength optcontrol bias collapses the raw
    weighted estimator's effective sample size to ~1.  Keep the
    per-generation lag short (the reference's 0.2 ps regime) or temper
    with ``forcescale`` <= 0.5; the measured sweet spot at 1 ps was
    forcescale 0.5 with self-normalized estimators (3-4x variance
    reduction in the transition region).
    """
    from .md.integrators import optcontrol
    from .targets import DomainError

    sim = iso.data.sim
    old_bias = sim.bias
    try:
        for g in range(generations):
            try:
                sim.bias = optcontrol(iso, forcescale=forcescale)
            except DomainError:
                sim.bias = None       # not yet contracting: sample unbiased
            iso.resample_kde(kde)
            if len(iso.data) > cutoff:
                iso.data = iso.data[len(iso.data) - int(cutoff):]
            iso.run(iter)
            if showprogress:
                biased = sim.bias is not None
                print(f"[run_girsanov] gen {g + 1}/{generations} "
                      f"loss={iso.losses[-1]:.4g} n={len(iso.data)} "
                      f"biased={biased}", flush=True)
    finally:
        sim.bias = old_bias
    return iso
