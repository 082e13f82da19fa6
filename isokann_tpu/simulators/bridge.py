"""chi-guided Langevin bridges between simplex corners.

TPU-native rebuild of ``src/simulators/bridge.jl`` (script-loaded extra in
the reference): a time-interpolated guide z(t) in RC space, bias
``u = J^T G angdiff(z(t), xi(x))`` with J the RC Jacobian (jax.jacobian
through featurizer + model; the reference uses Zygote,
``bridge.jl:17-36``), integrated with the Girsanov ABOBA/Brownian steppers
and deposited into the training data (``bridge_simplex``/``run_bridges!``,
``bridge.jl:68-127``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..data import WeightedSamples


def angdiff(xi, z):
    """Periodic RC difference (reference ``bridge.jl:13``)."""
    return jnp.mod(xi - z + jnp.pi, 2 * jnp.pi) - jnp.pi


@dataclass
class LinearInterpolant:
    """Piecewise-linear guide z(t) (reference ``bridge.jl:52-63``).

    ``xs``: (k,) times; ``ys``: (k, d) values (row-major)."""

    xs: Any
    ys: Any

    def __post_init__(self):
        self.xs = jnp.asarray(self.xs, jnp.float32)
        self.ys = jnp.atleast_2d(jnp.asarray(self.ys, jnp.float32))

    def __call__(self, t):
        i = jnp.clip(jnp.searchsorted(self.xs, t, side="right") - 1,
                     0, len(self.xs) - 2)
        t0, t1 = self.xs[i], self.xs[i + 1]
        w = (t - t0) / (t1 - t0)
        return (1 - w) * self.ys[i] + w * self.ys[i + 1]

    @property
    def tmax(self):
        return float(self.xs[-1])


class GuidedLangevinBridge:
    """Guided bridge simulation (reference ``GuidedLangevinBridge``,
    ``bridge.jl:6-49``).

    - ``sim``: an MDSimulation (or any sim with masses3/temp/friction/step)
    - ``xi``: RC function (3N,) -> (d,)
    - ``guide``: t -> (d,) target RC path (e.g. LinearInterpolant)
    - ``gain``: t -> scalar (or matrix) feedback gain
    - ``periodic``: use angdiff for periodic RCs (dihedrals)
    """

    def __init__(self, sim, xi, guide, gain=lambda t: 1.0, periodic=False):
        self.sim = sim
        self.xi = xi
        self.guide = guide
        self.gain = gain
        self.periodic = periodic

    def biasforce(self, withsigma=True):
        """(reference ``biasforce``, ``bridge.jl:17-36``)."""
        xi, guide, gain, periodic = self.xi, self.guide, self.gain, self.periodic

        def bias1(x, t):
            J = jax.jacobian(xi)(x)                 # (d, 3N)
            z = guide(t)
            v = xi(x)
            diff = angdiff(z, v) if periodic else (z - v)
            return J.T @ (gain(t) * diff)

        def bias(x, t, sigma, F):
            u = jax.vmap(lambda xx: bias1(xx, t))(x)
            return u if withsigma else u / sigma

        return bias

    @property
    def tmax(self):
        return self.guide.tmax

    def trajectory(self, x0, key=None):
        """Girsanov-weighted bridge trajectory (reference ``bridge.jl:38-48``).
        Returns WeightedSamples of all frames."""
        from ..md import integrators as I

        sim = self.sim
        key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1)) if key is None else key
        x0 = jnp.asarray(x0).reshape(-1)
        steps = int(round(self.tmax / sim.step))
        bias = self.biasforce()
        force_fn = sim._force_fn()
        if getattr(sim, "integrator", "langevin") == "brownian":
            x, logw = I.brownian_girsanov(force_fn, bias, x0[None, :],
                                          sim.masses3, sim.temp, sim.friction,
                                          sim.step, steps, key)
            return WeightedSamples(x, jnp.exp(logw))
        kv, ki = jax.random.split(key)
        p0 = jax.random.normal(kv, (1, sim.dim)) * jnp.sqrt(
            sim.masses3 * I.KB * sim.temp)
        qs, logws, _ = I.aboba_girsanov(force_fn, bias, x0[None, :], p0,
                                        sim.masses3, sim.temp, sim.friction,
                                        sim.step, steps, ki, save_every=1)
        return WeightedSamples(qs[:, 0, :], jnp.exp(logws[:, 0]))


def bridge_simplex(iso, ix=(0, 1), eps=0.1, T=1.0, gain=1.0, deposit=10,
                   key=None):
    """Bridge from simplex corner ix[0] to ix[1]; deposit transition-region
    frames into the iso data (reference ``bridge_simplex``,
    ``bridge.jl:68-110``)."""
    key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1)) if key is None else key
    nd = iso.model.outputdim
    z0 = np.zeros(nd)
    z1 = np.zeros(nd)
    z0[ix[0]] = 1.0
    z1[ix[1]] = 1.0

    c = np.asarray(iso.chis())                        # (n, d)
    starts = np.flatnonzero(np.linalg.norm(c - z0, axis=1) < eps)
    if len(starts) == 0:
        import warnings
        warnings.warn(f"No starting point found within eps={eps} of corner "
                      f"{ix[0]}. Try increasing eps.")
        return None
    i = int(np.random.default_rng(int(np.asarray(key)[-1])).choice(starts))
    x0 = np.asarray(iso.data.coords)[i]

    guide = LinearInterpolant([0.0, T], np.stack([z0, z1]))
    featurizer = iso.data.featurizer
    apply, params = iso.model.apply, iso.model.params

    def rc(x):
        return apply(params, jnp.asarray(featurizer(x[None, :]),
                                         jnp.float32)[0])

    glb = GuidedLangevinBridge(iso.data.sim, rc, guide, lambda t: gain)
    t = np.asarray(glb.trajectory(x0, key=key).values)

    if deposit > 0:
        chit = np.asarray(iso.chicoords(t))
        i_trans = np.flatnonzero((chit ** 2).sum(axis=1) < 0.9)
        if len(i_trans):
            rng = np.random.default_rng(int(np.asarray(key)[0]))
            sel = np.unique(rng.choice(i_trans, size=min(deposit, len(i_trans))))
            iso.addcoords(t[sel])
    return t


def run_bridges(iso, sample_bridge=1, train=100, generations=1, **kwargs):
    """All-corner-pairs bridge generation + training
    (reference ``run_bridges!``, ``bridge.jl:112-127``)."""
    nd = iso.model.outputdim
    for _ in range(generations):
        for i1 in range(nd):
            for i2 in range(nd):
                if i1 == i2:
                    continue
                bridge_simplex(iso, ix=(i1, i2), **kwargs)
        iso.run(train)
    return iso


def resample_picking_features(iso, n=None):
    """Farthest-point resampling over all (x and y) features
    (reference ``resample_picking_features!``, ``bridge.jl:318-334``)."""
    from ..data import flattenfirst
    from ..sample import picking

    n = len(iso.data) if n is None else n
    ys = np.concatenate([np.asarray(iso.data.coords),
                         np.asarray(flattenfirst(iso.data.propcoords))])
    fys = np.concatenate([np.asarray(iso.data.features),
                          np.asarray(flattenfirst(iso.data.propfeatures))])
    _, inds, _ = picking(fys, n)
    inds = np.sort(inds)
    nold = len(iso.data)
    iold = inds[inds < nold]
    inew = inds[inds >= nold]
    iso.data = iso.data[iold.tolist()]
    if len(inew):
        iso.addcoords(ys[inew])
    return iso
