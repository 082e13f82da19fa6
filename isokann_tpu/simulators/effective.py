"""Learned effective dynamics in chi space.

TPU-native rebuild of ``src/simulators/effective.jl`` (script-loaded extra):
pointwise Ito projection of the full dynamics onto the reaction coordinate
(Legoll/Lelievre; Zhang/Hartmann/Schuette 2016) —

    b(z)  = E[ J_xi F + (sigma^2/2) Laplacian(xi) | xi = z ]
    A(z)  = E[ (J_xi sigma)(J_xi sigma)^T | xi = z ]

estimated by an Epanechnikov-kernel conditional expectation.  The
reference's KD-tree range query (``effective.jl:92-142``) becomes a dense
masked all-pairs kernel evaluation — the natural TPU formulation for the
few-thousand-point RC datasets involved; integration is a jitted EM scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from .base import IsoSimulation
from ..md.integrators import constants


def epanechnikov_weights(zs, z, h):
    """Product Epanechnikov kernel weights of stored points ``zs`` (n, d)
    at query ``z`` (d,) (reference ``epanechnikov``, ``effective.jl:131-140``)."""
    u = (zs - z[None, :]) / h
    inside = jnp.all(jnp.abs(u) < 1.0, axis=-1)
    w = jnp.prod(1.0 - u ** 2, axis=-1)
    return jnp.where(inside, w, 0.0)


@dataclass
class KDEExpectation:
    """Conditional expectation E[f | z] via kernel regression
    (reference ``KDEExpectation``, ``effective.jl:92-142``).

    ``zs``: (n, d) RC values; ``fs``: (n, m) function values."""

    zs: Any
    fs: Any
    h: float

    def __post_init__(self):
        self.zs = jnp.atleast_2d(jnp.asarray(self.zs, jnp.float32))
        self.fs = jnp.atleast_2d(jnp.asarray(self.fs, jnp.float32))

    def marginal_and_weight(self, z):
        w = epanechnikov_weights(self.zs, jnp.asarray(z, jnp.float32), self.h)
        weight = jnp.sum(w)
        acc = w @ self.fs
        return acc, weight

    def marginal(self, z):
        acc, weight = self.marginal_and_weight(z)
        return acc / jnp.maximum(weight, 1e-12)

    def weight(self, z):
        return self.marginal_and_weight(z)[1]


def b_and_A(xi, x, F, sigma):
    """Pointwise Ito projection (reference ``b_and_A``, ``effective.jl:46-65``).

    ``xi``: (3N,) -> (d,); ``x``: (3N,); ``F``: mass/friction-scaled force;
    ``sigma``: (3N,) overdamped noise amplitudes.
    Returns b (d,), A (d, d)."""
    J = jax.jacobian(xi)(x)                        # (d, 3N)
    # diagonal-Hessian Laplacian term: sum_j sigma_j^2/2 * d2xi_i/dx_j2
    H = jax.hessian(xi)(x)                         # (d, 3N, 3N)
    lap = jnp.sum(sigma ** 2 / 2 * jnp.diagonal(H, axis1=-2, axis2=-1), axis=-1)
    b = J @ F + lap
    s = J * sigma[None, :]
    A = s @ s.T
    return b, A


class EffectiveSimulation(IsoSimulation):
    """Effective SDE in RC space learned from an Iso
    (reference ``EffectiveSimulation``, ``effective.jl:8-43``)."""

    def __init__(self, iso=None, kde: KDEExpectation = None, steps=1000,
                 dt=0.001, h=0.1, xi=None, sim=None, xs=None):
        if iso is not None:
            sim = sim or iso.data.sim
            xs = np.asarray(iso.data.coords if xs is None else xs)
            featurizer = iso.data.featurizer
            apply, params = iso.model.apply, iso.model.params
            if xi is None:
                xi = lambda x: apply(params, jnp.asarray(
                    featurizer(x[None, :]), jnp.float32)[0])
            sigma = constants(jnp.repeat(jnp.asarray(sim.masses()), 3),
                              sim.temp, sim.friction, overdamped=True)
            forcescale = 1.0 / (sim.friction * jnp.repeat(
                jnp.asarray(sim.masses()), 3))

            def point(x):
                F = sim.force(x[None, :])[0] * forcescale
                b, A = b_and_A(xi, x, F, sigma)
                return jnp.concatenate([b, A.reshape(-1)])

            bA = jax.lax.map(point, jnp.asarray(xs, jnp.float32))
            zs = jax.vmap(xi)(jnp.asarray(xs, jnp.float32))
            kde = KDEExpectation(zs, bA, h)
        self.kde = kde
        self.steps = steps
        self.dt = dt

    @property
    def dim(self):
        return self.kde.zs.shape[1]

    @property
    def coords(self):
        return self.kde.zs[0]

    @property
    def lagtime(self):
        return self.steps * self.dt

    def b_and_sigma(self, z):
        """Effective drift and noise (Cholesky of A)
        (reference ``b_and_sigma``, ``effective.jl:81-89``)."""
        K = self.dim
        bA = self.kde.marginal(z)
        b = bA[:K]
        A = bA[K:].reshape(K, K)
        # regularize for robust cholesky on near-singular A
        L = jnp.linalg.cholesky(A + 1e-10 * jnp.eye(K))
        return b, L

    def trajectory(self, steps=None, saveevery=1, x0=None, dt=None, key=None):
        """Euler-Maruyama in RC space, one jitted scan
        (reference ``trajectory``, ``effective.jl:67-79``)."""
        steps = self.steps if steps is None else steps
        dt = self.dt if dt is None else dt
        x0 = self.coords if x0 is None else jnp.asarray(x0, jnp.float32)
        key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1)) if key is None else key
        kde, K = self.kde, self.dim
        sqdt = float(np.sqrt(dt))

        def step(z, k):
            bA = kde.marginal(z)
            b = bA[:K]
            A = bA[K:].reshape(K, K)
            L = jnp.linalg.cholesky(A + 1e-10 * jnp.eye(K))
            z = z + b * dt + sqdt * (L @ jax.random.normal(k, (K,)))
            return z, z

        _, zs = jax.lax.scan(step, x0.reshape(-1),
                             jax.random.split(key, steps))
        return zs[saveevery - 1::saveevery]

    def propagate(self, x0, nk, key=None):
        """(n, d) -> (n, nk, d) bursts of the effective dynamics."""
        key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1)) if key is None else key
        x0 = jnp.atleast_2d(jnp.asarray(x0, jnp.float32))
        n, d = x0.shape
        kde, K, dt = self.kde, self.dim, self.dt
        sqdt = float(np.sqrt(dt))
        xr = jnp.repeat(x0, nk, axis=0)

        def step(z, k):
            def one(zi, ki):
                bA = kde.marginal(zi)
                b = bA[:K]
                A = bA[K:].reshape(K, K)
                L = jnp.linalg.cholesky(A + 1e-10 * jnp.eye(K))
                return zi + b * dt + sqdt * (L @ jax.random.normal(ki, (K,)))
            ks = jax.random.split(k, z.shape[0])
            return jax.vmap(one)(z, ks), None

        z, _ = jax.lax.scan(step, xr, jax.random.split(key, self.steps))
        return z.reshape(n, nk, d)
