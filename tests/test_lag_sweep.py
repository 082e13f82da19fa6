"""Lag selection / implied-timescale validation (workflows.lag_sweep).

The reference has no lag-validation tooling; its rate fit
(``src/iso.jl:339-351``) silently degrades when the fitted Koopman
spectrum escapes (0, 1).  lag_sweep detects that and recommends the
smallest resolved lag.
"""

import numpy as np
import pytest

import isokann_tpu as itk
from isokann_tpu.workflows import _fit_koopman, _spectrum_resolved


def test_fit_koopman_augments_1d():
    chi = np.linspace(0.05, 0.95, 40)
    # exact contraction towards 1/2 with factor 0.5
    kchi = 0.5 * chi + 0.25
    K, eigs = _fit_koopman(chi, kchi)
    assert K.shape == (2, 2)
    eigs = np.sort(np.real(eigs))
    assert eigs[1] == pytest.approx(1.0, abs=1e-9)   # structural constant mode
    assert eigs[0] == pytest.approx(0.5, abs=1e-9)
    assert _spectrum_resolved(np.array([1.0, 0.5]))


def test_spectrum_resolved_criteria():
    assert not _spectrum_resolved(np.array([1.0, 1.00871]))  # round-2 trp-cage
    assert not _spectrum_resolved(np.array([1.2, 0.5]))
    assert not _spectrum_resolved(np.array([1.0, -0.1]))
    assert _spectrum_resolved(np.array([0.999, 0.42]))
    # complex pair inside the unit disk with positive real part is fine
    assert _spectrum_resolved(np.array([1.0, 0.3 + 0.1j, 0.3 - 0.1j]))
    assert not _spectrum_resolved(np.array([1.0, 0.9 + 0.5j, 0.9 - 0.5j]))


@pytest.fixture(scope="module")
def trained_doublewell():
    sim = itk.Doublewell(sigma=1.0)
    iso = itk.Iso(sim=sim, nx=80, nk=5, key=1, opt=itk.AdamRegularized())
    iso.run(150)
    return iso


def test_lag_sweep_doublewell(trained_doublewell):
    iso = trained_doublewell
    rec, rows = iso.lag_sweep(steps=[50, 100, 200], nx=40, nk=16,
                              n_boot=40, key=3, verbose=False)
    assert [r["steps"] for r in rows] == [50, 100, 200]
    for r in rows:
        assert len(r["eigs"]) == 2
        assert r["lag"] == pytest.approx(r["steps"] * iso.data.sim.dt)
    # the doublewell at sigma=1 hops fast: every lag here resolves
    assert rec == 50
    resolved = [r for r in rows if r["resolved"]]
    assert len(resolved) == 3
    # implied timescale is lag-independent once resolved (within noise)
    ts = np.array([r["timescale"] for r in resolved])
    assert np.all(np.isfinite(ts))
    assert ts.max() / ts.min() < 3.0
    # resolved rows carry the bootstrap exit-rate band, and the row's own
    # point estimate falls inside it
    import scipy.linalg
    for r in resolved:
        assert "exit_rates_lo" in r and "exit_rates_hi" in r
        lo, hi = np.asarray(r["exit_rates_lo"]), np.asarray(r["exit_rates_hi"])
        assert lo.shape == (2,) and np.all(lo <= hi)
        Q = np.real(scipy.linalg.logm(np.asarray(r["K"]))) / r["lag"]
        point = -np.diag(Q)
        assert np.all(point >= lo - 1e-12) and np.all(point <= hi + 1e-12)


def test_lag_sweep_unresolved_reports_none(trained_doublewell):
    # a process far slower than the lag: Kchi ~ chi + noise, so the
    # fitted slow eigenvalue sits within noise of 1 (the round-2
    # trp-cage failure).  The sweep must flag it unresolved rather than
    # hand back garbage rates.
    import copy
    import dataclasses
    import jax

    class FrozenSim:
        steps = 100
        lagtime = 1.0

        def propagate(self, xs, nk, key=None, steps=None):
            import jax.numpy as jnp
            xs = jnp.asarray(xs)
            noise = 1e-3 * jax.random.normal(
                key, (xs.shape[0], nk, xs.shape[1]), xs.dtype)
            return xs[:, None, :] + noise

    iso = copy.copy(trained_doublewell)
    iso.data = dataclasses.replace(iso.data, sim=FrozenSim())
    rec, rows = iso.lag_sweep(steps=[100], nx=30, nk=2, n_boot=60, key=4,
                              verbose=False)
    assert rows[0]["resolved_frac"] < 0.9
    assert not rows[0]["resolved"]
    assert np.isnan(rows[0]["timescale"]) or rows[0]["timescale"] > 50.0
    assert rec is None


def test_rates_no_spurious_warning_when_resolved():
    # the structural dominant eigenvalue (constant mode) is exactly 1
    # by construction of the augmented least squares; a resolved slow
    # eigenvalue must NOT trigger the unresolved-lag warning
    import warnings as _w
    from isokann_tpu.iso import rates as rates_fn

    chi = np.linspace(0.05, 0.95, 50)[:, None]
    kchi = 0.5 * chi + 0.25
    with _w.catch_warnings():
        _w.simplefilter("error")
        Q = rates_fn(chi, kchi)
    assert Q[0, 0] < 0 and Q[1, 1] < 0
    assert Q[0, 0] == pytest.approx(np.log(0.5) / 2, rel=1e-6)


def test_rates_warns_when_unresolved():
    from isokann_tpu.iso import rates as rates_fn

    rng = np.random.default_rng(0)
    chi = np.linspace(0.05, 0.95, 50)[:, None]
    kchi = chi + rng.normal(0, 0.02, chi.shape)   # slow eig ~1 +- noise
    with pytest.warns(UserWarning, match="not.*resolved|outside"):
        rates_fn(chi, kchi)


def test_lag_sweep_uses_girsanov_weights(trained_doublewell):
    # a biased sim returning WeightedSamples: replicas with zero weight
    # must not contribute to the Koopman estimate
    import copy
    import dataclasses
    from isokann_tpu.data import WeightedSamples

    class BiasedSim:
        steps = 50
        lagtime = 0.5

        def propagate(self, xs, nk, key=None, steps=None):
            import jax.numpy as jnp
            xs = jnp.asarray(xs)
            n = xs.shape[0]
            # first half of replicas: frozen values, weight 1;
            # second half: garbage values, weight 0
            good = jnp.tile(xs[:, None, :], (1, nk // 2, 1))
            junk = jnp.full((n, nk - nk // 2, xs.shape[1]), 37.0)
            vals = jnp.concatenate([good, junk], axis=1)
            w = jnp.concatenate([jnp.ones((n, nk // 2)),
                                 jnp.zeros((n, nk - nk // 2))], axis=1)
            return WeightedSamples(vals, w)

    iso = copy.copy(trained_doublewell)
    iso.data = dataclasses.replace(iso.data, sim=BiasedSim())
    rec, rows = iso.lag_sweep(steps=[50], nx=20, nk=4, n_boot=10, key=5,
                              verbose=False)
    # weighted Kchi == chi (frozen dynamics): slow eig ~1, unresolved —
    # junk values at x=37 would otherwise wreck the fit entirely
    eigs = rows[0]["eigs"]
    assert abs(eigs[0] - 1.0) < 1e-6
    assert eigs[1] > 0.9


def test_fit_koopman_multidim_no_augmentation():
    # d>=2 chi columns (simplex memberships) are fitted directly; the
    # structural eigenvalue ~1 comes from the columns summing to 1
    chi = np.linspace(0.05, 0.95, 60)
    X = np.stack([chi, 1.0 - chi], axis=1)
    Y = np.stack([0.6 * chi + 0.2, 0.8 - 0.6 * chi], axis=1)
    K, eigs = _fit_koopman(X, Y)
    assert K.shape == (2, 2)
    eigs = np.sort(np.real(eigs))
    assert eigs[1] == pytest.approx(1.0, abs=1e-9)
    assert eigs[0] == pytest.approx(0.6, abs=1e-9)


def test_lag_sweep_on_md_simulation():
    # integration: the MDSimulation steps-override path (vacuum ala2)
    import isokann_tpu as itk

    sim = itk.MDSimulation(steps=10)
    iso = itk.Iso(sim=sim, nx=24, nk=3, key=0, minibatch=0,
                  opt=itk.AdamRegularized())
    iso.run(30)
    rec, rows = iso.lag_sweep(steps=[10, 20], nx=12, nk=4, n_boot=20,
                              key=2, verbose=False)
    assert [r["steps"] for r in rows] == [10, 20]
    for r in rows:
        assert r["lag"] == pytest.approx(
            r["steps"] * sim.lagtime / sim.steps)
        assert len(r["eigs"]) == 2
        assert np.isfinite(r["eigs"]).all()


def test_training_lag_headroom_and_escalation(trained_doublewell):
    """training_lag_headroom reads the live slow eigenvalue;
    escalate_lag continues warm-started at a longer lag (Diffusion
    dataclass path: lagtime_ override)."""
    import copy

    from isokann_tpu.workflows import escalate_lag, training_lag_headroom

    iso = copy.copy(trained_doublewell)
    iso.data = trained_doublewell.data
    lam = training_lag_headroom(iso)
    assert 0.0 < lam < 1.0          # doublewell at sigma=1 resolves

    old_params = iso.model.params
    old_steps = iso.data.sim.steps
    escalate_lag(iso, old_steps * 3, nx_max=24, key=5)
    assert iso.data.sim.steps == old_steps * 3
    assert iso.data.sim.lagtime == pytest.approx(
        trained_doublewell.data.sim.lagtime * 3)
    assert len(iso.data) <= 24
    assert iso.model.params is old_params        # model kept (warm start)
    iso.run(5)                                   # trains at the new lag
    assert np.isfinite(iso.losses[-1])


def test_escalate_lag_md_copy_path():
    """MDSimulation path: shallow copy with steps overridden; programs
    key on the step count so caches stay valid; constructor kwargs are
    updated for save/load rebuild."""
    from isokann_tpu.workflows import escalate_lag

    sim = itk.MDSimulation(steps=20)
    iso = itk.Iso(sim=sim, nx=8, nk=2, key=0, opt=itk.AdamRegularized())
    iso.run(3)
    escalate_lag(iso, 40, nx_max=6, key=1)
    assert iso.data.sim.steps == 40
    assert iso.data.sim.constructor["steps"] == 40
    assert sim.steps == 20                       # original untouched
    assert len(iso.data) <= 6
    iso.run(2)
    assert np.isfinite(iso.losses[-1])


def test_recommendation_rejects_shrinking_timescale():
    # synthetic rows mimicking the trp-cage CPU sweep: the 0.2 ps rung
    # resolves with eig headroom but its implied timescale SHRINKS at
    # the next rung (a fast mode, not a plateau) — the recommendation
    # must move past it
    from isokann_tpu.workflows import lag_sweep as _ls  # noqa: F401
    # exercise via the module-level rule by reconstructing it on rows:
    import isokann_tpu.workflows as W

    rows = [
        dict(steps=100, lag=0.2, eigs=[1.0, 0.9485], timescale=3.78,
             resolved_frac=0.97, resolved=True),
        dict(steps=500, lag=1.0, eigs=[1.0, 0.4066], timescale=1.11,
             resolved_frac=1.0, resolved=True),
        dict(steps=2500, lag=5.0, eigs=[1.0, 0.0122], timescale=1.13,
             resolved_frac=1.0, resolved=True),
    ]
    rec = W._recommend_lag(rows)
    assert rec == 500


def test_rates_resolved_doublewell(trained_doublewell):
    from isokann_tpu.workflows import rates_resolved

    Q, row = rates_resolved(trained_doublewell, lags=[50, 100], nx=40,
                            nk=16, key=8, verbose=False)
    assert Q is not None
    assert row["steps"] == 50
    Q = np.asarray(Q)
    assert Q.shape == (2, 2)
    assert Q[0, 0] < 0 and Q[1, 1] < 0
    assert Q[0, 1] > 0 or Q[1, 0] > 0
    # same order of magnitude as the training-lag fit
    ex = -np.diag(Q)
    ex0 = -np.diag(np.asarray(trained_doublewell.rates()))
    assert 0.2 < ex.sum() / ex0.sum() < 5.0


def test_chi_pairs_at_lag_max_batch(trained_doublewell):
    # max_batch host-chunks the propagation (v5e large-batch crash
    # mitigation) without changing shapes or the estimate structure
    import copy
    import dataclasses

    import jax

    from isokann_tpu.workflows import _chi_pairs_at_lag

    iso = trained_doublewell
    real = iso.data.sim
    calls = []

    class Recording:
        steps = real.steps
        lagtime = real.lagtime

        def propagate(self, xs, nk, key=None, steps=None):
            calls.append(len(xs) * nk)
            return real.propagate(xs, nk, key=key, steps=steps)

    iso2 = copy.copy(iso)
    iso2.data = dataclasses.replace(iso.data, sim=Recording())
    xs = np.asarray(iso.data.coords)[:12]

    chi_x, chi_y = _chi_pairs_at_lag(iso2, xs, 50, 4,
                                     jax.random.PRNGKey(0), max_batch=16)
    assert len(calls) == 3 and max(calls) <= 16        # 48 walkers / 16
    assert chi_x.shape == (12, 1) and chi_y.shape == (12, 1)
    assert np.isfinite(chi_y).all()

    calls.clear()
    _chi_pairs_at_lag(iso2, xs, 50, 4, jax.random.PRNGKey(0))
    assert calls == [48]                               # unchunked: one call


def test_chi_pairs_at_lag_max_batch_weighted(trained_doublewell):
    # chunked WeightedSamples concatenate values AND weights; zero-weight
    # junk replicas still contribute nothing
    import copy
    import dataclasses

    import jax
    import jax.numpy as jnp

    from isokann_tpu.data import WeightedSamples
    from isokann_tpu.workflows import _chi_pairs_at_lag

    class BiasedSim:
        steps = 50
        lagtime = 0.5

        def propagate(self, xs, nk, key=None, steps=None):
            xs = jnp.asarray(xs)
            n = xs.shape[0]
            good = jnp.tile(xs[:, None, :], (1, nk // 2, 1))
            junk = jnp.full((n, nk - nk // 2, xs.shape[1]), 37.0)
            vals = jnp.concatenate([good, junk], axis=1)
            w = jnp.concatenate([jnp.ones((n, nk // 2)),
                                 jnp.zeros((n, nk - nk // 2))], axis=1)
            return WeightedSamples(vals, w)

    iso = copy.copy(trained_doublewell)
    iso.data = dataclasses.replace(iso.data, sim=BiasedSim())
    xs = np.asarray(trained_doublewell.data.coords)[:6]
    chi_x, chi_y = _chi_pairs_at_lag(iso, xs, 50, 4,
                                     jax.random.PRNGKey(1), max_batch=8)
    np.testing.assert_allclose(chi_y, chi_x, atol=1e-6)


def test_ladder_edge_rising():
    from isokann_tpu.workflows import _ladder_edge_rising

    def row(steps, ts, resolved=True):
        return dict(steps=steps, lag=float(steps), timescale=ts,
                    resolved=resolved, eigs=[1.0, 0.5])

    # trp-cage pilot shape: plateau mid-ladder, rising tail
    assert _ladder_edge_rising([row(100, 8.4), row(500, 5.5),
                                row(2500, 5.8), row(12500, 15.5),
                                row(62500, 67.9)])
    # genuine plateau at the edge
    assert not _ladder_edge_rising([row(500, 5.5), row(2500, 5.8),
                                    row(12500, 6.1)])
    # unresolved tail rungs are ignored
    assert not _ladder_edge_rising([row(500, 5.5), row(2500, 5.8),
                                    row(12500, 60.0, resolved=False)])
    assert not _ladder_edge_rising([row(500, 5.5)])


def test_lag_sweep_warns_on_rising_edge(trained_doublewell):
    # synthetic sweep whose resolved timescales rise at the edge must warn
    import warnings as _w
    import copy
    import dataclasses
    import jax.numpy as jnp

    class SlowingSim:
        steps = 50
        lagtime = 0.5

        def propagate(self, xs, nk, key=None, steps=None):
            # contraction keyed to lag so the implied timescale RISES:
            # chi_y = 0.5 + (chi_x - 0.5) * lam(steps), lam growing with
            # steps is impossible for a real process — emulate by pulling
            # towards the mean more weakly at longer lags
            lam = {50: 0.2, 100: 0.2, 200: 0.8}[int(steps)]
            xs = jnp.asarray(xs)
            y = 0.5 + (xs - 0.0) * 0.0 + lam * xs  # linear pull in x-space
            return jnp.tile(y[:, None, :], (1, nk, 1))

    iso = copy.copy(trained_doublewell)
    iso.data = dataclasses.replace(iso.data, sim=SlowingSim())
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        iso.lag_sweep(steps=[50, 100, 200], nx=20, nk=4, n_boot=20,
                      key=5, verbose=False)
    assert any("RISING at the ladder edge" in str(x.message) for x in rec)
