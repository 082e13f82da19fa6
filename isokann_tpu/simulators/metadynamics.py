"""Well-tempered metadynamics with the learned chi as reaction coordinate.

TPU-native rebuild of ``src/simulators/metadynamics.jl``: the bias is a sum
of Gaussians over deposited RC centers; the force is ``-grad_x`` of the
well-tempered rescaled bias, obtained by ``jax.grad`` through the chi model
and featurizer (the reference uses Zygote, ``metadynamics.jl:44-47``).

Center storage is a dense (ncenters, d_rc) matrix — the reference's
GPU-optimized ``MetadynamicsStateMatrix`` (``metadynamics.jl:134-146``) is
the natural TPU layout; a capacity-bounded buffer with a count mask keeps
shapes static under jit.  A gridded variant with multilinear interpolation
mirrors ``MetadynamicsStateGridded`` (``metadynamics.jl:159-178``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import WeightedSamples


def rescale_welltempered(U, dt=1600.0):
    """Well-tempered rescaling (reference ``metadynamics.jl:60``)."""
    if np.isinf(dt):
        return U
    return dt * jnp.log(1.0 + U / dt)


def project_onto_simplex_hyperplane(x):
    """Project chi onto the sum=1 hyperplane (reference ``metadynamics.jl:61``)."""
    if x.shape[-1] <= 1:
        return x
    return x - (jnp.sum(x, axis=-1, keepdims=True) - 1.0) / x.shape[-1]


class MetadynamicsState:
    """Capacity-bounded matrix of Gaussian centers (jit-static shapes).

    ``centers``: (capacity, d) with ``count`` valid rows."""

    def __init__(self, centers, capacity=4096):
        centers = np.atleast_2d(np.asarray(centers, np.float32))
        self.capacity = max(capacity, len(centers))
        self.d = centers.shape[1]
        buf = np.zeros((self.capacity, self.d), np.float32)
        buf[:len(centers)] = centers
        self.centers = jnp.asarray(buf)
        self.count = len(centers)

    def deposit(self, z):
        """Append center(s) (reference ``deposit!``, ``metadynamics.jl:148``)."""
        z = np.atleast_2d(np.asarray(z, np.float32))
        n = len(z)
        if self.count + n > self.capacity:
            self.capacity = max(2 * self.capacity, self.count + n)
            buf = np.zeros((self.capacity, self.d), np.float32)
            buf[:self.count] = np.asarray(self.centers)[:self.count]
            self.centers = jnp.asarray(buf)
        self.centers = self.centers.at[self.count:self.count + n].set(z)
        self.count += n

    def bias_potential(self, z, height, sigma):
        """V(z) = sum_i h exp(-|z - s_i|^2 / 2 sigma^2), masked to the valid
        rows (reference ``metadynamics.jl:150-156``)."""
        mask = (jnp.arange(self.centers.shape[0]) < self.count)
        d2 = jnp.sum((z[None, :] - self.centers) ** 2, axis=-1)
        return jnp.sum(height * jnp.exp(-d2 / (2 * sigma ** 2)) * mask)


class MetadynamicsStateGridded:
    """Gridded bias with multilinear interpolation (1-2D rapid exploration;
    reference ``MetadynamicsStateGridded``, ``metadynamics.jl:159-178``).
    Approximate; no online deposition."""

    def __init__(self, centers, ranges, height, sigma):
        centers = np.atleast_2d(np.asarray(centers, np.float64))
        axes = [np.asarray(r, np.float64) for r in ranges]
        mesh = np.meshgrid(*axes, indexing="ij")
        grid = np.zeros(mesh[0].shape)
        pts = np.stack([m.ravel() for m in mesh], axis=-1)
        for c in centers:
            grid += (height * np.exp(-((pts - c) ** 2).sum(-1)
                                     / (2 * sigma ** 2))).reshape(grid.shape)
        self.grid = jnp.asarray(grid, jnp.float32)
        self.lo = jnp.asarray([a[0] for a in axes], jnp.float32)
        self.step = jnp.asarray([a[1] - a[0] for a in axes], jnp.float32)

    def deposit(self, z):
        raise NotImplementedError(
            "gridded metadynamics state does not support online deposition")

    def bias_potential(self, z, height=None, sigma=None):
        from jax.scipy.ndimage import map_coordinates
        idx = (z - self.lo) / self.step
        return map_coordinates(self.grid, [idx[i] for i in range(len(self.lo))],
                               order=1, mode="nearest")


class MetadynamicsSimulation:
    """Well-tempered metadynamics bias usable as a Langevin force
    (reference ``MetadynamicsSimulation``, ``metadynamics.jl:29-55``).

    Construct from an Iso: the RC is the (simplex-projected) chi function
    and the initial centers are the current chi values of the data."""

    def __init__(self, iso=None, sim=None, rc=None, mdstate=None,
                 dt=600.0, height=1.0, sigma=0.1, capacity=4096):
        if iso is not None:
            sim = iso.data.sim
            featurizer = iso.data.featurizer
            apply, params = iso.model.apply, iso.model.params

            def rc_(x):
                chi = apply(params, jnp.asarray(featurizer(x[None, :]),
                                                jnp.float32)[0])
                return project_onto_simplex_hyperplane(chi)

            rc = rc if rc is not None else rc_
            if mdstate is None:
                centers = np.asarray(iso.chis())
                mdstate = MetadynamicsState(
                    project_onto_simplex_hyperplane(jnp.asarray(centers)),
                    capacity=capacity)
        self.sim = sim
        self.rc = rc
        self.mdstate = mdstate
        self.dt = float(dt)
        self.height = float(height)
        self.sigma = float(sigma)

    # -- bias force -------------------------------------------------------

    def bias_energy(self, x):
        """Well-tempered bias at configuration x (3N,)."""
        z = self.rc(x)
        U = self.mdstate.bias_potential(z.reshape(-1), self.height, self.sigma)
        return rescale_welltempered(U, self.dt)

    def __call__(self, x, t=None, sigma=None, F=None):
        """Bias force -grad U_bias, batched over walkers
        (integrator ``bias_fn`` signature, NOT sigma-scaled —
        reference ``trajectory`` sets sigmascaled=false, :54-55)."""
        x = jnp.asarray(x)
        single = x.ndim == 1
        xb = x[None, :] if single else x
        g = jax.vmap(jax.grad(self.bias_energy))(xb)
        return -g[0] if single else -g

    def deposit(self, z):
        self.mdstate.deposit(np.asarray(z))

    # -- sampling -----------------------------------------------------------

    def trajectory(self, **kwargs):
        """Biased trajectory via the ABOBA Girsanov integrator
        (reference ``metadynamics.jl:54-55``). Returns WeightedSamples."""
        from ..md import integrators as I

        sim = self.sim
        key = kwargs.pop("key", None)
        key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1)) if key is None else key
        x0 = jnp.asarray(kwargs.pop("x0", sim.coords)).reshape(-1)
        steps = kwargs.pop("steps", sim.steps)
        saveevery = kwargs.pop("saveevery", 1)
        kv, ki = jax.random.split(key)
        p0 = jax.random.normal(kv, (1, sim.dim)) * jnp.sqrt(
            sim.masses3 * I.KB * sim.temp)
        force_fn = sim._force_fn()
        qs, logws, _ = I.aboba_girsanov(
            force_fn, lambda q, t, sigma, F: self(q, t, sigma, F),
            x0[None, :], p0, sim.masses3, sim.temp, sim.friction, sim.step,
            steps, ki, save_every=saveevery, sigmascaled=False)
        return WeightedSamples(qs[:, 0, :], jnp.exp(logws[:, 0]))

    def wt_free_energy(self, zs):
        """F(z) = -(T + dT)/T * V(z) (reference ``metadynamics.jl:82-87``).
        ``zs``: (m, d_rc)."""
        T = self.sim.temp
        zs = jnp.atleast_2d(jnp.asarray(zs, jnp.float32))
        V = jax.vmap(lambda z: self.mdstate.bias_potential(
            z, self.height, self.sigma))(zs)
        return -(T + self.dt) / T * V
