"""Chapman-Kolmogorov validation (workflows.cktest).

Beyond reference: the reference's rate fit (``src/iso.jl:339-351``)
never checks that the chi-coarse dynamics is Markovian at the chosen
lag.  cktest compares the CK prediction K(tau)^k against the directly
estimated K(k*tau) with a joint bootstrap over shared start points.
"""

import copy
import dataclasses

import numpy as np
import pytest

import isokann_tpu as itk


@pytest.fixture(scope="module")
def trained_doublewell():
    sim = itk.Doublewell(sigma=1.0)
    iso = itk.Iso(sim=sim, nx=80, nk=5, key=1, opt=itk.AdamRegularized())
    iso.run(150)
    return iso


def _linear_chi_ou_iso(theta=1.0, sigma=0.5, dt=0.01, steps=100, n=200):
    """A stub Iso over an exactly-solvable OU process with an exactly
    affine chi: E[chi(X_t)|x] = 0.5 + a e^{-theta t} x, so the coarse
    Koopman model satisfies Chapman-Kolmogorov EXACTLY at every lag and
    from every start distribution — the ground-truth pass case that no
    trained network can provide."""
    import types
    import jax
    import jax.numpy as jnp

    class OUSim:
        def __init__(self):
            self.steps = steps
            self.lagtime = steps * dt

        def propagate(self, xs, nk, key=None, steps=None):
            s = self.steps if steps is None else int(steps)
            t = s * dt
            xs = jnp.asarray(xs)
            mean = xs[:, None, :] * np.exp(-theta * t)
            std = np.sqrt(sigma**2 / (2 * theta)
                          * (1.0 - np.exp(-2 * theta * t)))
            noise = jax.random.normal(key, (xs.shape[0], nk, xs.shape[1]),
                                      xs.dtype)
            return mean + std * noise

    rng = np.random.default_rng(0)
    coords = rng.uniform(-1.0, 1.0, (n, 1))

    def chicoords(xs):
        return 0.5 + 0.25 * np.asarray(xs)

    iso = types.SimpleNamespace(
        data=types.SimpleNamespace(sim=OUSim(), coords=coords),
        chis=lambda: chicoords(coords),
        chicoords=chicoords)
    return iso


def test_cktest_exact_chi_passes_all_factors():
    from isokann_tpu.workflows import cktest

    iso = _linear_chi_ou_iso()
    # exact chi: hold it to a band sharper than the default 0.1
    ok, rows = cktest(iso, factors=(2, 4), nx=60, nk=32, n_boot=100,
                      atol=0.05, key=3, verbose=False)
    assert ok
    assert [r["factor"] for r in rows] == [2, 4]
    for r in rows:
        assert r["ok"]
        K_pred = np.asarray(r["K_pred"])
        K_est = np.asarray(r["K_est"])
        assert K_pred.shape == K_est.shape == (2, 2)
        # rows of a coarse Koopman matrix on (chi, 1-chi) sum to ~1
        assert np.allclose(K_est.sum(axis=1), 1.0, atol=5e-2)
        dev = np.asarray(r["dev"])
        lo, hi = np.asarray(r["dev_lo"]), np.asarray(r["dev_hi"])
        assert np.all(lo <= hi)
        assert r["max_abs_dev"] == pytest.approx(np.abs(dev).max())
        assert r["max_abs_dev"] < 0.06
        assert r["steps"] == r["factor"] * iso.data.sim.steps


def test_cktest_trained_doublewell(trained_doublewell):
    # a trained (not exact) chi on the Markovian doublewell passes at
    # the default atol=0.1 band.  At a sharper atol=0.05 the factor-4
    # row exposes the trained chi's residual non-invariance (~0.07,
    # training-length independent) — both behaviors are intended.
    ok, rows = trained_doublewell.cktest(factors=(2, 4), nx=40, nk=16,
                                         n_boot=80, key=3, verbose=False)
    assert ok
    assert all(r["ok"] for r in rows)
    assert rows[0]["max_abs_dev"] < 0.1
    assert rows[0]["lag"] == pytest.approx(
        2 * trained_doublewell.data.sim.lagtime)

    ok_sharp, rows_sharp = trained_doublewell.cktest(
        factors=(4,), nx=40, nk=16, n_boot=80, atol=0.05, key=3,
        verbose=False)
    assert not ok_sharp
    assert 0.05 < rows_sharp[0]["max_abs_dev"] < 0.1


def test_cktest_detects_non_markovian(trained_doublewell):
    # a sim that is identity at the base lag but flips wells at 2x the
    # lag violates CK maximally: K(tau)^2 = I != K(2 tau)
    import jax
    import jax.numpy as jnp

    base = int(trained_doublewell.data.sim.steps)

    class NonMarkovSim:
        steps = base
        lagtime = float(trained_doublewell.data.sim.lagtime)

        def propagate(self, xs, nk, key=None, steps=None):
            xs = jnp.asarray(xs)
            noise = 1e-3 * jax.random.normal(
                key, (xs.shape[0], nk, xs.shape[1]), xs.dtype)
            s = base if steps is None else int(steps)
            sign = 1.0 if s <= base else -1.0   # well flip past the base lag
            return sign * xs[:, None, :] + noise

    iso = copy.copy(trained_doublewell)
    iso.data = dataclasses.replace(iso.data, sim=NonMarkovSim())
    ok, rows = iso.cktest(factors=(2,), nx=30, nk=8, n_boot=60, key=4,
                          verbose=False)
    assert not ok
    assert not rows[0]["ok"]
    assert rows[0]["max_abs_dev"] > 0.3


def test_cktest_respects_girsanov_weights(trained_doublewell):
    # zero-weight junk replicas must not contaminate either estimate;
    # if they did, the lag-independent contraction towards chi(37)
    # would fail CK (factor 0.5 at every lag instead of 0.5^k)
    import jax.numpy as jnp
    from isokann_tpu.data import WeightedSamples

    class BiasedFrozenSim:
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
    iso.data = dataclasses.replace(iso.data, sim=BiasedFrozenSim())
    ok, rows = iso.cktest(factors=(2,), nx=20, nk=4, n_boot=30, key=5,
                          verbose=False)
    # frozen dynamics: K(tau) = K(2 tau) = I, CK holds exactly
    assert ok
    assert rows[0]["max_abs_dev"] < 1e-6


def test_cktest_requires_steps_override(trained_doublewell):
    class NoOverrideSim:
        steps = 10
        lagtime = 0.1

        def propagate(self, xs, nk, key=None):
            raise AssertionError("should not be called")

    iso = copy.copy(trained_doublewell)
    iso.data = dataclasses.replace(iso.data, sim=NoOverrideSim())
    with pytest.raises(TypeError, match="cktest"):
        iso.cktest(verbose=False)
