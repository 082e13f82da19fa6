"""Free-energy estimation along chi.

TPU-native rebuild of ``src/utils/freeenergy.jl``:
- ``marginal_free_energy``: histogram estimate -kBT log P(chi)
- ``constrained_free_energy``: thermodynamic integration with
  orthogonally-projected dynamics, drift correction and Fixman 1/sqrt(Z)
  weight.  The reference loops states serially
  (``src/utils/freeenergy.jl:59-124``); here all levelset walkers advance
  together in one jitted scan.
- ``local_mean_force``: binned mean-force estimator
- ``integrate_chi``: trapezoid cumulative integral
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..md.system import KB


def marginal_free_energy(iso, nbins=100):
    """-kBT log P(chi) from a histogram of chi values
    (reference ``src/utils/freeenergy.jl:12-42``).
    Returns (bin_centers, F)."""
    chivals = np.asarray(iso.chis()).ravel()
    temp = getattr(iso.data.sim, "temp", 310.0)
    kBT = KB * temp
    weights, edges = np.histogram(chivals, bins=nbins)
    centers = (edges[:-1] + edges[1:]) / 2
    P = weights / np.sum(weights * np.diff(edges))
    with np.errstate(divide="ignore"):
        F = -kBT * np.log(P)
    F -= F[np.isfinite(F)].min()
    return centers, F


def integrate_chi(f, chi_vals):
    """Cumulative trapezoid of the mean force over chi
    (reference ``src/utils/freeenergy.jl:207-216``)."""
    f = np.asarray(f)
    chi_vals = np.asarray(chi_vals)
    F = np.zeros(len(f))
    F[1:] = np.cumsum(0.5 * (f[1:] + f[:-1]) * np.diff(chi_vals))
    return F


def constrained_free_energy(iso, xs, steps=2000, key=None):
    """Thermodynamic integration: orthogonally-projected underdamped
    dynamics on each chi levelset, mean force integrated over chi, Fixman
    correction (reference ``src/utils/freeenergy.jl:59-124``).

    ``xs``: (n_states, 3N) well-distributed starting points.
    Returns (chi_vals_sorted, F_std)."""
    from .minimumpath import _chifun

    sim = iso.data.sim
    xs = jnp.asarray(xs, jnp.float32)
    n_states, D = xs.shape
    dt = sim.step
    gamma = sim.friction
    kBT = KB * sim.temp
    m3 = jnp.repeat(jnp.asarray(sim.masses()), 3)

    chi1 = _chifun(iso)
    chiN = jax.vmap(chi1)
    dchiN = jax.vmap(jax.grad(chi1))
    chi_levels = chiN(xs)

    if key is None:
        key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))

    def step(carry, k):
        x, v = carry
        F = sim.force(x)                                   # (n, D)
        dchi = dchiN(x)
        n2 = jnp.sum(dchi * dchi, axis=1, keepdims=True)
        F_proj = jnp.sum(F * dchi, axis=1, keepdims=True) / n2
        F = F - F_proj * dchi                              # orthogonal force
        db = jax.random.normal(k, x.shape, x.dtype)
        v = v + ((F - gamma * m3 * v) * dt
                 + jnp.sqrt(2 * gamma * kBT * dt * m3) * db) / m3
        x = x + v * dt
        # drift correction back onto the levelset
        dchi = dchiN(x)
        n2 = jnp.sum(dchi * dchi, axis=1, keepdims=True)
        err = (chiN(x) - chi_levels)[:, None]
        x = x - err / n2 * dchi
        # Fixman factor Z = sum(1/m * dchi^2)
        Z = jnp.sum(dchi * dchi / m3, axis=1)
        return (x, v), (-F_proj[:, 0], Z)

    @jax.jit
    def run(x0, key):
        v0 = jnp.zeros_like(x0)
        keys = jax.random.split(key, steps)
        _, (lambdas, Zs) = jax.lax.scan(step, (x0, v0), keys)
        return (jnp.mean(lambdas, axis=0),
                jnp.mean(1.0 / jnp.sqrt(Zs), axis=0))

    mean_forces, mean_Z = run(xs, key)
    mean_forces = np.asarray(mean_forces)
    mean_Z = np.asarray(mean_Z)
    chi_vals = np.asarray(chi_levels)

    order = np.argsort(chi_vals)
    chi_sorted = chi_vals[order]
    F_rgd = integrate_chi(mean_forces[order], chi_sorted)
    F_std = F_rgd - kBT * np.log(mean_Z[order])
    return chi_sorted, F_std


def local_mean_force(iso, xs, nbins, return_centers=True):
    """Binned local mean-force estimate along chi
    (reference ``src/utils/freeenergy.jl:140-194``)."""
    from .minimumpath import _chifun

    sim = iso.data.sim
    xs = jnp.asarray(xs, jnp.float32)
    chi1 = _chifun(iso)
    chi_vals = np.asarray(jax.vmap(chi1)(xs))
    order = np.argsort(chi_vals)
    xs_sorted = xs[order]
    chi_sorted = chi_vals[order]

    F = sim.force(xs_sorted)
    dchi = jax.vmap(jax.grad(chi1))(xs_sorted)
    n2 = jnp.sum(dchi * dchi, axis=1)
    lambdas = -np.asarray(jnp.sum(F * dchi, axis=1) / n2)

    n = len(chi_sorted)
    splits = np.array_split(np.arange(n), nbins)
    mean_forces = np.array([lambdas[s].mean() for s in splits])
    mean_chi = np.array([chi_sorted[s].mean() for s in splits])
    F_rgd = integrate_chi(mean_forces, mean_chi)
    return (mean_chi, F_rgd) if return_centers else F_rgd


def delta_G(PMF, chi_vals):
    """Free energy difference between the chi<0.5 and chi>=0.5 basins
    (reference ``src/utils/freeenergy.jl:222-230``)."""
    PMF = np.asarray(PMF)
    chi_vals = np.sort(np.asarray(chi_vals))
    G0 = PMF[chi_vals < 0.5].min()
    G1 = PMF[chi_vals >= 0.5].min()
    return G0 - G1


def sample_uniform_chi_coords(iso, n_points, xs=None):
    """n_points coordinates whose chi values are ~uniformly spaced
    (reference ``sample_coords``, ``src/utils/freeenergy.jl:236-252``)."""
    if xs is None:
        from ..data import values
        xs = np.concatenate([np.asarray(iso.data.coords),
                             np.asarray(values(iso.data.propcoords))[:, 0, :]])
    chi_vals = np.asarray(iso.chicoords(xs)).ravel()
    targets = np.linspace(chi_vals.min(), chi_vals.max(), n_points)
    idx = [int(np.argmin(np.abs(chi_vals - t))) for t in targets]
    return np.asarray(xs)[idx]
