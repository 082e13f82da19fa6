import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isokann_tpu import data as D
from isokann_tpu.simulators import Doublewell


def test_data_from_trajectory_reverse():
    traj = jnp.arange(10.0)[:, None]
    xs, ys = D.data_from_trajectory(traj, reverse=True, lag=1)
    assert xs.shape == (8, 1)
    assert ys.shape == (8, 2, 1)
    # first pair: x=1 with neighbours 0 and 2
    assert float(xs[0, 0]) == 1.0
    assert np.allclose(np.asarray(ys[0, :, 0]), [0.0, 2.0])


def test_data_from_trajectory_forward():
    traj = jnp.arange(10.0)[:, None]
    xs, ys = D.data_from_trajectory(traj, reverse=False, lag=2)
    assert xs.shape == (8, 1)
    assert ys.shape == (8, 1, 1)
    assert float(ys[0, 0, 0]) == 2.0


def test_data_from_trajectories():
    t1 = jnp.arange(6.0)[:, None]
    t2 = jnp.arange(8.0)[:, None]
    xs, ys = D.data_from_trajectories([t1, t2])
    assert xs.shape[0] == 4 + 6


def test_simulationdata_from_sim(key):
    dw = Doublewell()
    data = D.SimulationData.from_sim(dw, nx=20, nk=3, key=key)
    assert len(data) == 20
    assert data.nk == 3
    assert data.features.shape == (20, 1)
    assert data.propfeatures.shape == (20, 3, 1)
    assert data.features.dtype == jnp.float32


def test_getitem_and_merge(key):
    dw = Doublewell()
    data = D.SimulationData.from_sim(dw, nx=10, nk=2, key=key)
    sub = data[2:5]
    assert len(sub) == 3
    merged = data.merge(sub)
    assert len(merged) == 13
    assert np.allclose(merged.coords[10:], data.coords[2:5])


def test_addcoords(key):
    dw = Doublewell()
    data = D.SimulationData.from_sim(dw, nx=5, nk=2, key=key)
    new = data.addcoords(jnp.zeros((3, 1)), key=key)
    assert len(new) == 8


def test_subsample_uniform():
    from isokann_tpu.sample import subsample_uniformgrid
    ys = np.linspace(0, 1, 1000)
    inds = subsample_uniformgrid(ys, 10)
    assert len(inds) == 10
    assert len(set(inds.tolist())) == 10
    picked = np.sort(ys[inds])
    # approximately uniform: gaps not too large
    assert np.max(np.diff(picked)) < 0.35


def test_weighted_samples():
    ws = D.WeightedSamples(jnp.ones((4, 3, 2)), jnp.ones((4, 3)))
    sub = ws[1:3]
    assert sub.values.shape == (2, 3, 2)
    cat = D.lastcat(ws, ws)
    assert cat.values.shape == (8, 3, 2)


def test_trajectorydata_bursts(key):
    dw = Doublewell()
    data = D.trajectorydata_bursts(dw, 10, 3, key=key)
    assert len(data) == 10
    assert data.nk == 3


def test_trajectorydata_linear(key):
    dw = Doublewell()
    data = D.trajectorydata_linear(dw, 10, key=key)
    assert len(data) == 9
    assert data.nk == 1


def test_subsample_inds_deterministic_with_key(key):
    """Same PRNG key => identical chi-stratified selection; this covers
    both the perturbed-grid path and the degenerate (constant-chi)
    uniform fallback."""
    xs = np.linspace(0.0, 1.0, 200)[:, None].astype(np.float32)
    model = lambda z: np.asarray(z)          # chi = identity
    a = D.subsample_inds(model, xs, 17, key=key)
    b = D.subsample_inds(model, xs, 17, key=key)
    assert np.array_equal(a, b)
    k2 = jax.random.PRNGKey(123)
    c = D.subsample_inds(model, xs, 17, key=k2)
    assert not np.array_equal(a, c)          # different key, different grid

    const_model = lambda z: np.zeros((len(z), 1), np.float32)
    a = D.subsample_inds(const_model, xs, 17, key=key)
    b = D.subsample_inds(const_model, xs, 17, key=key)
    assert np.array_equal(a, b)


def test_resample_strat_deterministic_with_key(key):
    """resample_strat with the same key appends identical coordinates
    (selection + propagation both seeded)."""
    dw = Doublewell()
    data = D.SimulationData.from_sim(dw, nx=30, nk=2, key=key)
    model = lambda z: np.asarray(z)
    k = jax.random.PRNGKey(7)
    d1 = data.resample_strat(model, 5, key=k)
    d2 = data.resample_strat(model, 5, key=k)
    assert np.allclose(np.asarray(d1.coords), np.asarray(d2.coords))
    assert np.allclose(np.asarray(d1.propcoords), np.asarray(d2.propcoords))
