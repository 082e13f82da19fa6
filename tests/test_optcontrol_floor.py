"""The optimal-control bias must stay finite where chi strays out of
[0, 1] (identity-output networks extrapolate freely): the value
function psi = lam_t * (chi - b) + b is floored at PSI_FLOOR in both
the XLA bias and the fused kernel, so neither the force nor the
Girsanov weight can NaN.  Regression for the round-3 variance study,
which was NaN-poisoned at every forcescale before the floor.
Reference context: the reference's optcontrol
(src/simulators/openmm.jl:640-667) has no guard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isokann_tpu as itk
from isokann_tpu.md.integrators import PSI_FLOOR, optcontrol


class _StubSim:
    lagtime = 1.0


class _StubModel:
    """chi(x) = params . x — linear, so chi is exactly controllable."""
    params = jnp.array([1.0])

    @staticmethod
    def apply(params, feats):
        return jnp.atleast_1d(feats @ params)

    def with_params(self, params):
        return self


class _StubData:
    sim = _StubSim()

    @staticmethod
    def featurizer(x):
        return x


class _StubIso:
    """Minimal surface optcontrol() reads: chi/koopman samples pinned
    to an exact affine law kchi = shift + lam * chi, and a linear
    model so chi(x) = x."""
    data = _StubData()
    model = _StubModel()

    def __init__(self, lam=0.8, shift=0.1):
        self._chi = np.linspace(0.0, 1.0, 11)
        self._kchi = shift + lam * self._chi
        self.lam, self.shift = lam, shift

    def chis(self):
        return self._chi

    def koopman(self):
        return self._kchi


def test_floor_engages_and_stays_finite():
    iso = _StubIso(lam=0.8, shift=0.1)
    b = iso.shift / (1.0 - iso.lam)                    # = 0.5
    bias = optcontrol(iso, forcescale=1.0)
    # at t = Tmax, lam_t = 1 and psi = chi(x) = x: x <= 0 is exactly
    # the floored region
    xs = jnp.array([[-5.0], [-1.0], [0.0], [PSI_FLOOR / 2], [0.5]])
    u = np.asarray(bias(xs, _StubSim.lagtime, 1.0, None)).ravel()
    assert np.isfinite(u).all()
    # clamped region: log(PSI_FLOOR) is flat -> zero force
    assert u[0] == 0.0 and u[1] == 0.0
    # unclamped region: u = sigma * chi'/psi = 1/x
    assert u[4] == pytest.approx(1.0 / 0.5, rel=1e-5)
    # the floor caps the force magnitude at sigma * |chi'| / PSI_FLOOR
    assert np.abs(u).max() <= 1.0 / PSI_FLOOR + 1e-6
    del b


def test_floor_boundary_continuity():
    """Just above the floor the analytic force 1/x applies; crossing
    into the floored region it drops to 0 without blowing up."""
    iso = _StubIso()
    bias = optcontrol(iso, forcescale=1.0)
    xs = jnp.array([[PSI_FLOOR * 1.01], [PSI_FLOOR * 0.99]])
    u = np.asarray(bias(xs, _StubSim.lagtime, 1.0, None)).ravel()
    assert u[0] == pytest.approx(1.0 / (PSI_FLOOR * 1.01), rel=1e-4)
    assert u[1] == 0.0


def test_biased_md_propagate_finite():
    """End-to-end: a barely-trained chi (the worst case for psi > 0)
    biases vacuum-ala2 MD; positions and Girsanov weights stay
    finite."""
    from isokann_tpu.data import WeightedSamples, values as _values

    sim = itk.MDSimulation(steps=10)
    iso = itk.Iso(sim=sim, nx=16, nk=2, key=0, opt=itk.AdamRegularized())
    iso.run(15)
    try:
        sim.bias = optcontrol(iso, forcescale=1.0)
    except itk.DomainError:
        pytest.skip("lambda fit outside (0,1] for this seed")
    try:
        ys = sim.propagate(np.asarray(iso.data.coords)[:4], 2,
                           key=jax.random.PRNGKey(5))
        yv = np.asarray(_values(ys))
        assert np.isfinite(yv).all()
        if isinstance(ys, WeightedSamples):
            assert np.isfinite(np.asarray(ys.weights)).all()
    finally:
        sim.bias = None
