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
                 cutoff=np.inf, showprogress=False, auto_forcescale=False,
                 min_forcescale=0.0625, telemetry=None):
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

    Practical regime (two round-3 studies bracket it; see
    docs/evidence_round3.md): the Girsanov weights are exact
    martingales (E[w] = 1, regression-locked in
    tests/test_girsanov_stats.py), and in the controllable regime —
    low dimension, near-exact chi — the raw weighted Koopman estimator
    approaches the zero-variance limit (13.6x reduction on the
    doublewell at forcescale 1, tools/optcontrol_analytic.py).  At MD
    scale the per-coordinate bias accumulates sum |Delta eta|^2 >> 1 of
    log-weight variance over a long lag and importance sampling
    degenerates (vacuum ala2 at 1 ps: ESS -> ~3/16, net variance loss;
    tools/girsanov_variance.py).  Keep the per-generation lag short
    (the reference's 0.2 ps regime) or temper with ``forcescale``
    <= 0.5; this loop surfaces the per-generation ESS in its progress
    line and warns once when the new bursts fall below 0.3 * nk.

    Telemetry: every generation appends a row
    ``dict(gen, biased, forcescale, ess, nk, n_new, n_data, loss)`` to
    ``iso.girsanov_telemetry`` (created on first use, extended across
    calls) and to the optional ``telemetry`` list, so ESS degradation is
    visible in the record, not only in a one-shot warning.

    ``auto_forcescale=True`` turns the warning into an intervention:
    when the new generation's mean ESS falls below ``0.3 * nk`` for two
    consecutive biased generations, ``forcescale`` is halved (down to
    ``min_forcescale``) before the next bias refresh — the tempering
    direction both round-3 studies point to (MD-scale degeneracy at
    full strength, controllable at <= 0.5; optcontrol math
    ``src/simulators/openmm.jl:640-667``).
    """
    from .md.integrators import optcontrol
    from .targets import DomainError

    from .data import WeightedSamples

    sim = iso.data.sim
    old_bias = sim.bias
    warned_ess = False
    rows = getattr(iso, "girsanov_telemetry", None)
    if rows is None:
        rows = iso.girsanov_telemetry = []
    low_streak = 0
    try:
        for g in range(generations):
            try:
                sim.bias = optcontrol(iso, forcescale=forcescale)
            except DomainError:
                sim.bias = None       # not yet contracting: sample unbiased
            n_before = len(iso.data)
            iso.resample_kde(kde)
            n_new = len(iso.data) - n_before
            if len(iso.data) > cutoff:
                iso.data = iso.data[len(iso.data) - int(cutoff):]
            ess = None
            pf = iso.data.propfeatures
            if sim.bias is not None and isinstance(pf, WeightedSamples) \
                    and n_new > 0:
                # degeneracy check on this generation's biased bursts
                # (resample_kde can early-return and append fewer than
                # kde rows — slice exactly what it added)
                ess = float(pf[-n_new:].ess().mean())
            if (ess is not None and not warned_ess
                    and ess < 0.3 * iso.data.nk):
                import warnings
                warnings.warn(
                    f"run_girsanov: Girsanov weights are degenerating "
                    f"(mean ESS {ess:.1f} of nk={iso.data.nk} on the new "
                    f"generation) — the weighted Koopman estimate is "
                    f"noise-dominated at this lag/forcescale.  Lower "
                    f"forcescale (<= 0.5) or shorten the lag; measured "
                    f"regimes: tools/girsanov_variance.py (MD scale), "
                    f"tools/optcontrol_analytic.py (controllable regime).")
                warned_ess = True
            iso.run(iter)
            biased = sim.bias is not None
            row = dict(gen=len(rows), biased=biased,
                       forcescale=float(forcescale), ess=ess,
                       nk=int(iso.data.nk), n_new=int(n_new),
                       n_data=len(iso.data),
                       loss=float(iso.losses[-1]))
            rows.append(row)
            if telemetry is not None:
                telemetry.append(row)
            # auto-tempering: two consecutive degenerate biased
            # generations halve the bias strength before the next
            # optcontrol refresh
            if biased and ess is not None and ess < 0.3 * iso.data.nk:
                low_streak += 1
            else:
                low_streak = 0
            if (auto_forcescale and low_streak >= 2
                    and forcescale > min_forcescale):
                forcescale = max(forcescale / 2.0, min_forcescale)
                low_streak = 0
                row["forcescale_next"] = float(forcescale)
                if showprogress:
                    print(f"[run_girsanov] ESS below 0.3*nk twice — "
                          f"tempering forcescale to {forcescale:g}",
                          flush=True)
            if showprogress:
                msg = (f"[run_girsanov] gen {g + 1}/{generations} "
                       f"loss={iso.losses[-1]:.4g} n={len(iso.data)} "
                       f"biased={biased}")
                if ess is not None:
                    msg += f" ess={ess:.1f}/{iso.data.nk}"
                print(msg, flush=True)
    finally:
        sim.bias = old_bias
    return iso


# ==========================================================================
# Lag selection / validation
# ==========================================================================

def _fit_koopman(chi_x, chi_y):
    """Least-squares coarse Koopman matrix K with chi @ K = Kchi and its
    eigenvalues (1-D chi augmented with 1-chi, as in the rate fit,
    reference ``src/iso.jl:344-349``)."""
    x = np.asarray(chi_x, dtype=np.float64)
    y = np.asarray(chi_y, dtype=np.float64)
    if x.ndim == 1:
        x, y = x[:, None], y[:, None]
    if x.shape[1] == 1:
        x = np.hstack([x, 1.0 - x])
        y = np.hstack([y, 1.0 - y])
    K, *_ = np.linalg.lstsq(x, y, rcond=None)
    K = K.T
    return K, np.linalg.eigvals(K)


def _strat_starts(iso, nx, keepedges, key):
    """chi-stratified start points from the pooled dataset (the same
    selection the adaptive samplers use, ``sample.subsample_uniformgrid``)."""
    from .sample import subsample_uniformgrid

    xs_all = np.asarray(iso.data.coords)
    chi_all = np.asarray(iso.chis())
    nx = min(int(nx), len(xs_all))
    rng = np.random.default_rng(np.asarray(jax.random.key_data(key)))
    inds = subsample_uniformgrid(chi_all[:, 0], nx, keepedges=keepedges,
                                 rng=rng)
    return xs_all[inds]


def _check_steps_override(sim, who):
    import inspect

    sig = inspect.signature(sim.propagate)
    if "steps" not in sig.parameters and not any(
            p.kind is inspect.Parameter.VAR_KEYWORD
            for p in sig.parameters.values()):
        raise TypeError(
            f"{type(sim).__name__}.propagate() does not accept a "
            f"steps= override; {who} needs a simulator that can "
            "propagate at arbitrary lags (Diffusion family and "
            "MDSimulation do).  Rebuild the simulation with the "
            "candidate lag instead, or add steps= support.")


def _chi_pairs_at_lag(iso, xs, s, nk, key, max_batch=None):
    """``(chi(x), E[chi(X_s)|x])`` for fixed start points ``xs`` at lag
    ``s`` integrator steps: one batched ``propagate`` with ``nk``
    replicas, chi evaluated with the trained model, replica mean
    (Girsanov-weight-aware when propagation returns WeightedSamples).

    ``max_batch`` caps walkers per device program (``nx*nk`` above it is
    host-chunked): large sweeps compile walker batches the campaign
    itself never runs, and on v5e a 1024-walker OBC2 batch has crashed
    the worker when launched from a long-lived process (standalone
    probes pass — ``tools/repro_v5e_faults.py --gb``)."""
    from .data import WeightedSamples, values as _values

    nx = len(xs)
    if max_batch is not None and nx * nk > max_batch:
        nchunks = -(-(nx * nk) // int(max_batch))
        parts = np.array_split(np.arange(nx), nchunks)
        keys = jax.random.split(key, len(parts))
        ys = [iso.data.sim.propagate(xs[p], nk, key=k, steps=s)
              for p, k in zip(parts, keys)]
        if isinstance(ys[0], WeightedSamples):
            ys = WeightedSamples(
                np.concatenate([np.asarray(y.values) for y in ys]),
                np.concatenate([np.asarray(y.weights) for y in ys]))
        else:
            ys = np.concatenate([np.asarray(y) for y in ys])
    else:
        ys = iso.data.sim.propagate(xs, nk, key=key, steps=s)
    yv = np.asarray(_values(ys))                     # (nx, nk, d)
    chi_x = np.asarray(iso.chicoords(xs))            # (nx, d_chi)
    chi_y = np.asarray(iso.chicoords(yv.reshape(-1, yv.shape[-1])))
    chi_y = chi_y.reshape(nx, nk, -1)                # (nx, nk, d_chi)
    if isinstance(ys, WeightedSamples):              # Girsanov weights
        w = np.asarray(ys.weights, np.float64).reshape(nx, nk, 1)
        chi_y = (w * chi_y).sum(axis=1) / w.sum(axis=1)
    else:
        chi_y = chi_y.mean(axis=1)                   # (nx, d_chi)
    return chi_x, chi_y


def _spectrum_resolved(eigs, tol=1e-6):
    """True when the fitted spectrum supports a rate fit: the dominant
    eigenvalue is the structural ~1 (the constant mode, reproduced
    exactly by the augmented least squares) and every other eigenvalue
    lies strictly inside the unit interval/disk."""
    order = np.argsort(np.real(eigs))[::-1]
    rest = np.asarray(eigs)[order[1:]]
    return bool(np.real(eigs[order[0]]) <= 1.0 + tol
                and np.all(np.abs(rest) < 1.0)
                and np.all(np.real(rest) > 0.0))


def lag_sweep(iso, steps=None, nx=50, nk=8, n_boot=100, threshold=0.9,
              keepedges=True, key=None, verbose=True, max_batch=None):
    """Implied-timescale lag validation for production campaigns.

    The coarse rate fit (reference ``src/iso.jl:339-351``) is only
    meaningful when the fitted Koopman matrix K (chi @ K = Kchi, least
    squares) has its spectrum inside (0, 1); at too-short lags
    finite-sample noise pushes the slow eigenvalue past 1 and ``rates()``
    degrades to clamped upper bounds.  The reference ships no tooling to
    detect or fix this — this sweep closes that gap.

    For each candidate lag (integrator steps), ``nx`` chi-stratified
    start points from the dataset are propagated ``nk``-fold (one device
    batch per lag, reusing the trained chi for start selection and for
    the Koopman estimate) and the fitted spectrum is bootstrap-tested.

    Per-lag row fields:

    - ``steps`` / ``lag``: lag in integrator steps / physical time
    - ``eigs``: fitted Koopman eigenvalues (sorted descending, real parts)
    - ``timescale``: implied timescale -lag/log(lambda_slow) (NaN while
      the slow eigenvalue sits outside (0, 1)); trustworthy once it
      plateaus across consecutive resolved lags
    - ``resolved_frac``: fraction of ``n_boot`` bootstrap resamples of
      the start points whose full fitted spectrum lies inside (0, 1)
    - ``resolved``: resolved_frac >= threshold
    - ``exit_rates_lo`` / ``exit_rates_hi``: 2.5/97.5 bootstrap
      percentiles of the exit rates (per unit time) over the RESOLVED
      resamples (present when >= 10 resamples resolved) — the band a
      point estimate from another lag must fall inside for the two
      rates to "agree"

    Returns ``(recommended_steps, rows)``; recommended_steps is picked
    by ``_recommend_lag``: the smallest resolved lag with eigenvalue
    headroom (slow eigenvalue <= 0.98, so further chi training cannot
    push it past 1) whose implied timescale forms a two-sided plateau
    with the next rung; with no plateau it falls back to the LARGEST
    resolved rung with headroom, then to the smallest resolved lag,
    then None (extend the ladder).  Note ``rates_resolved`` uses a
    different, deliberately cheaper rule (the smallest resolved rung) —
    it reads rates off an already-validated ladder rather than choosing
    a training lag.  Typical use: pilot-train, sweep, rebuild the
    simulation with the recommended lag, run the campaign
    (``tools/run_trpcage_production.py --lag-sweep``).
    """
    from .sample import subsample_uniformgrid

    sim = iso.data.sim
    if steps is None:
        steps = [sim.steps * m for m in (1, 5, 25, 125)]
    key = jax.random.PRNGKey(0) if key is None else (
        jax.random.PRNGKey(key) if isinstance(key, int) else key)

    # chi-stratified start points from the pooled dataset
    key, sub = jax.random.split(key)
    xs = _strat_starts(iso, nx, keepedges, sub)
    nx = len(xs)
    dt_per_step = sim.lagtime / sim.steps
    _check_steps_override(sim, "lag_sweep")

    import scipy.linalg

    rows = []
    for s in sorted(int(s) for s in steps):
        key, sub = jax.random.split(key)
        chi_x, chi_y = _chi_pairs_at_lag(iso, xs, s, nk, sub,
                                         max_batch=max_batch)
        K, eigs_c = _fit_koopman(chi_x, chi_y)
        eigs = np.sort(np.real(eigs_c))[::-1]
        lag = s * dt_per_step
        n_ok = 0
        boot_exits = []
        rng_b = np.random.default_rng(0)
        for _ in range(n_boot):
            b = rng_b.integers(0, nx, nx)
            Kb, eb = _fit_koopman(chi_x[b], chi_y[b])
            ok_b = _spectrum_resolved(eb)
            n_ok += ok_b
            if ok_b:
                # exit rates of this resample (host 2x2 logm — cheap):
                # their percentiles are the bootstrap band the point
                # estimates must agree within
                with np.errstate(all="ignore"):
                    Qb = np.real(scipy.linalg.logm(Kb)) / lag
                if np.all(np.isfinite(Qb)):
                    boot_exits.append(-np.diag(Qb))
        frac = n_ok / n_boot
        # slow (non-stationary) eigenvalue: largest below the dominant one
        lam = eigs[1] if len(eigs) > 1 else eigs[0]
        ts = float(-lag / np.log(lam)) if 0.0 < lam < 1.0 else float("nan")
        row = dict(steps=s, lag=float(lag), eigs=eigs.tolist(),
                   K=K.tolist(),
                   timescale=ts, resolved_frac=frac,
                   resolved=bool(_spectrum_resolved(eigs_c)
                                 and frac >= threshold))
        if len(boot_exits) >= 10:
            be = np.asarray(boot_exits)
            row["exit_rates_lo"] = np.percentile(be, 2.5, axis=0).tolist()
            row["exit_rates_hi"] = np.percentile(be, 97.5, axis=0).tolist()
        rows.append(row)
        if verbose:
            print(f"[lag_sweep] steps={s} lag={lag:g} "
                  f"eigs={np.round(eigs, 5).tolist()} timescale={ts:g} "
                  f"resolved={frac:.2f}", flush=True)

    if _ladder_edge_rising(rows):
        import warnings
        tail = [r for r in rows if r["resolved"]
                and np.isfinite(r["timescale"])]
        warnings.warn(
            f"lag_sweep: the implied timescale is still RISING at the "
            f"ladder edge ({tail[-2]['timescale']:.3g} -> "
            f"{tail[-1]['timescale']:.3g} at lag {tail[-1]['lag']:g}) — "
            f"the slowest process is likely slower than every candidate "
            f"lag resolves; extend the ladder, or rely on the campaign's "
            f"adaptive lag escalation to correct the recommendation as "
            f"chi sharpens.")
    return _recommend_lag(rows), rows


def _ladder_edge_rising(rows, plateau_ratio=1.5):
    """True when the two largest RESOLVED rungs still show a rising
    implied timescale (ratio > plateau_ratio): the mid-ladder plateau
    the recommendation picked may be a fast-mode artifact and the true
    slow timescale lies beyond the ladder (observed on the trp-cage
    pilot sweep: 8.4/5.5/5.8/15.5/67.9 ps over a 100..62500-step
    ladder)."""
    tail = [r for r in rows if r["resolved"] and np.isfinite(r["timescale"])]
    if len(tail) < 2:
        return False
    return tail[-1]["timescale"] / tail[-2]["timescale"] > plateau_ratio


def _recommend_lag(rows, eig_headroom=0.98, plateau_ratio=1.5):
    """The smallest resolved lag that also has

    (a) eigenvalue HEADROOM — the slow eigenvalue measured with the
        current chi must sit clearly below 1, because a sharper chi
        (after further training) pushes it toward the true, larger
        value (the round-2 trp-cage failure: pilot-resolved at 0.2 ps,
        unresolved after 1000 generations), and
    (b) an implied-timescale PLATEAU vs the next rung, two-sided: a
        timescale that *shrinks* with lag means the short-lag estimate
        was a fast mode, not a plateau.

    Falls back to headroom-only, then to the smallest resolved lag
    (e.g. single-rung ladders); None when nothing resolves."""
    recommended = None
    for a, b in zip(rows, rows[1:]):
        lam_a = a["eigs"][1] if len(a["eigs"]) > 1 else a["eigs"][0]
        if (a["resolved"] and b["resolved"] and lam_a <= eig_headroom
                and np.isfinite(a["timescale"])
                and np.isfinite(b["timescale"])
                and 1.0 / plateau_ratio
                < b["timescale"] / a["timescale"] < plateau_ratio):
            recommended = a["steps"]
            break
    if recommended is None:
        # no plateau found: take the LARGEST resolved rung with
        # headroom (larger lags are the safe direction)
        ok = [r["steps"] for r in rows
              if r["resolved"]
              and (r["eigs"][1] if len(r["eigs"]) > 1 else 1.0)
              <= eig_headroom
              and np.isfinite(r["timescale"])]
        recommended = ok[-1] if ok else None
    if recommended is None:
        recommended = next((r["steps"] for r in rows if r["resolved"]),
                           None)
    return recommended


def rates_resolved(iso, lags=None, nx=100, nk=8, threshold=0.9, key=None,
                   verbose=True, return_rows=False, max_batch=None):
    """Coarse macro-rates from the smallest lag at which the trained
    chi's Koopman fit resolves.

    ISOKANN's chi converges to the SLOWEST process in the data; at the
    (short) training lag its fitted eigenvalue is 1 +- sampling noise
    and ``rates()`` degrades to clamped bounds.  The rate fit, however,
    does not require retraining: chi is just a function, and the pair
    (chi(x), E[chi(X_L)|x]) at ANY lag L yields K(L) and
    Q = logm(K)/L.  This sweeps ``lags`` (in integrator steps) with the
    trained chi and returns the rate matrix from the smallest resolved
    lag — the direct analog of reading rates off the implied-timescale
    plateau.

    Returns ``(Q_per_time, row)`` where row is the winning lag_sweep row
    (None, rows) when nothing resolved; with ``return_rows=True`` the
    uniform ``(Q_per_time_or_None, row_or_None, rows)``.  EVERY
    resolved row in the sweep additionally carries ``Q`` (the rate
    matrix resolved at that rung, per unit time) and ``exit_rates`` —
    agreement of the exit rates across consecutive resolved rungs is
    the implied-timescale plateau that makes the returned rates
    trustworthy.  Reference context: the rate fit `src/iso.jl:339-351`;
    the reference has no resolution control.
    """
    import scipy.linalg

    sim = iso.data.sim
    if lags is None:
        lags = [sim.steps * m for m in (5, 25, 125)]
    key = jax.random.PRNGKey(11) if key is None else (
        jax.random.PRNGKey(key) if isinstance(key, int) else key)
    dt_per_step = sim.lagtime / sim.steps

    rec, rows = lag_sweep(iso, steps=sorted(int(s) for s in lags), nx=nx,
                          nk=nk, threshold=threshold, key=key,
                          verbose=verbose, max_batch=max_batch)
    winner = None
    for row in rows:
        if not row["resolved"]:
            continue
        s = row["steps"]
        K = np.asarray(row["K"], np.float64)
        w_, V = np.linalg.eig(K)
        w_ = np.clip(np.real(w_), 1e-12, 1.0 - 1e-12) + 0j
        K = np.real(V @ np.diag(w_) @ np.linalg.inv(V))
        Q = np.real(scipy.linalg.logm(K)) / (s * dt_per_step)
        row["Q"] = Q.tolist()
        row["exit_rates"] = (-np.diag(Q)).tolist()
        if verbose:
            print(f"[rates_resolved] lag {s} steps "
                  f"({s * dt_per_step:g}): exit rates "
                  f"{(-np.diag(Q)).tolist()}", flush=True)
        if winner is None:
            winner = (Q, row)
    if return_rows:
        return (winner + (rows,)) if winner is not None else (None, None,
                                                              rows)
    if winner is not None:
        return winner
    return None, rows


def training_lag_headroom(iso):
    """Slow eigenvalue of the coarse Koopman fit on the CURRENT training
    data (host-side, essentially free): the live indicator of the
    training-lag drift failure, where a sharpening chi pushes the slow
    eigenvalue through 1 and ``rates()`` degrades to clamped bounds
    (reference fit ``src/iso.jl:339-351``, which has no such guard)."""
    chi = np.asarray(iso.chis(), np.float64)
    kchi = np.asarray(iso.koopman(), np.float64)
    _, eigs = _fit_koopman(chi, kchi)
    eigs = np.sort(np.real(eigs))[::-1]
    return float(eigs[1]) if len(eigs) > 1 else float(eigs[0])


def escalate_lag(iso, new_steps, nx_max=64, keepedges=True, key=None,
                 sim_factory=None):
    """Continue an adaptive campaign at a longer lag, warm-started.

    The trained model is a lag-free function of features, so it is kept
    as-is; the DATA is lag-specific, so the dataset is re-seeded with
    chi-stratified start points from the pool, re-propagated at the new
    lag.  The new simulation comes from ``sim_factory(new_steps)`` when
    given; otherwise the current sim is shallow-copied with its lag
    overridden (``steps`` attribute for MD sims — propagation programs
    key on the step count, so caches stay valid — or ``lagtime_`` for
    the analytic Diffusion family).

    Combine with ``training_lag_headroom``: check every N generations,
    escalate when the slow eigenvalue exceeds ~0.98
    (``tools/run_trpcage_production.py: campaign(adaptive_lag=True)``).
    """
    import copy as _copy

    from .data import SimulationData

    sim = iso.data.sim
    nk = iso.data.nk
    new_steps = int(new_steps)
    if sim_factory is not None:
        new_sim = sim_factory(new_steps)
    else:
        new_sim = _copy.copy(sim)
        if hasattr(new_sim, "lagtime_") and hasattr(new_sim, "dt"):
            new_sim.lagtime_ = new_steps * new_sim.dt
        elif hasattr(new_sim, "steps"):
            new_sim.steps = new_steps
        else:
            raise TypeError(
                f"{type(sim).__name__} exposes neither steps nor "
                "lagtime_; pass sim_factory")
        if hasattr(new_sim, "constructor"):
            new_sim.constructor = {**sim.constructor, "steps": new_steps}

    key = jax.random.PRNGKey(11) if key is None else (
        jax.random.PRNGKey(key) if isinstance(key, int) else key)
    key, sub = jax.random.split(key)
    xs = _strat_starts(iso, min(nx_max, len(iso.data)), keepedges, sub)
    iso.data = SimulationData.from_sim(new_sim, xs=xs, nk=nk, key=key)
    return iso


def cktest(iso, steps=None, factors=(2, 4), nx=50, nk=8, n_boot=200,
           atol=0.1, keepedges=True, key=None, verbose=True,
           max_batch=None):
    """Chapman-Kolmogorov test of the chi-coarse Koopman model.

    ``lag_sweep`` answers "does the rate fit *resolve* at this lag";
    this answers the stronger question "is the chi-projected dynamics
    *Markovian* at this lag": if it is, the coarse Koopman matrix must
    satisfy Chapman-Kolmogorov, ``K(tau)^k == K(k*tau)``.  A violation
    means chi mixes processes slower than tau and the macro-rates from
    ``rates()``/``rates_resolved`` (reference fit ``src/iso.jl:339-351``,
    which ships no such validation) are lag-dependent artifacts.

    For the base lag ``steps`` (default: the simulation's training lag)
    and each factor ``k``, the SAME ``nx`` chi-stratified start points
    are propagated ``nk``-fold at ``tau`` and at ``k*tau``; the CK
    prediction ``K(tau)^k`` is compared entrywise against the direct
    estimate ``K(k*tau)``.  Sampling uncertainty is handled by a JOINT
    bootstrap over start points (both matrices refit per resample, so
    the difference distribution absorbs the shared-start correlation).

    Per-factor row fields: ``factor``, ``steps``, ``lag``, ``K_pred``,
    ``K_est``, ``dev`` (entrywise prediction - estimate), ``dev_lo`` /
    ``dev_hi`` (2.5/97.5 bootstrap percentiles of the deviation),
    ``max_abs_dev``, ``ok`` (every entry's bootstrap interval covers 0,
    or its mean deviation is within ``atol``).  Entries are transition
    probabilities in [0, 1]; the default ``atol=0.1`` is the
    conventional visually-acceptable CK band.  Sharper tolerances
    (e.g. 0.05) expose the residual non-invariance of any *trained*
    chi — on the converged doublewell the measured CK deviation is
    ~0.03 at factor 2 and ~0.07 at factor 4, training-length
    independent — so treat small, factor-growing deviations as a chi
    quality metric rather than a broken lag.

    Returns ``(ok, rows)`` with ``ok`` true when every factor passes.
    """
    sim = iso.data.sim
    _check_steps_override(sim, "cktest")
    s0 = int(steps) if steps is not None else int(sim.steps)
    dt_per_step = sim.lagtime / sim.steps
    key = jax.random.PRNGKey(7) if key is None else (
        jax.random.PRNGKey(key) if isinstance(key, int) else key)

    key, sub = jax.random.split(key)
    xs = _strat_starts(iso, nx, keepedges, sub)
    nx = len(xs)

    key, sub = jax.random.split(key)
    chi_x, chi_y0 = _chi_pairs_at_lag(iso, xs, s0, nk, sub,
                                      max_batch=max_batch)
    K0, _ = _fit_koopman(chi_x, chi_y0)

    rng_b = np.random.default_rng(0)
    boots = [rng_b.integers(0, nx, nx) for _ in range(n_boot)]

    rows, all_ok = [], True
    for k in sorted(int(k) for k in factors):
        key, sub = jax.random.split(key)
        _, chi_yk = _chi_pairs_at_lag(iso, xs, k * s0, nk, sub,
                                      max_batch=max_batch)
        Kk, _ = _fit_koopman(chi_x, chi_yk)
        pred = np.linalg.matrix_power(K0, k)
        dev = pred - Kk

        D = np.empty((n_boot,) + dev.shape)
        for i, b in enumerate(boots):
            K0_b, _ = _fit_koopman(chi_x[b], chi_y0[b])
            Kk_b, _ = _fit_koopman(chi_x[b], chi_yk[b])
            D[i] = np.linalg.matrix_power(K0_b, k) - Kk_b
        lo = np.percentile(D, 2.5, axis=0)
        hi = np.percentile(D, 97.5, axis=0)
        ok = bool(np.all(((lo <= 0.0) & (0.0 <= hi))
                         | (np.abs(dev) <= atol)))
        all_ok = all_ok and ok
        rows.append(dict(
            factor=k, steps=k * s0, lag=float(k * s0 * dt_per_step),
            K_pred=pred.tolist(), K_est=Kk.tolist(), dev=dev.tolist(),
            dev_lo=lo.tolist(), dev_hi=hi.tolist(),
            max_abs_dev=float(np.abs(dev).max()), ok=ok))
        if verbose:
            print(f"[cktest] k={k} lag={rows[-1]['lag']:g} "
                  f"max|K^k - K(k tau)|={rows[-1]['max_abs_dev']:.4f} "
                  f"ok={ok}", flush=True)
    return all_ok, rows
