"""Energy minimization (batched, device-side).

Replaces ``simulation.minimizeEnergy()`` (OpenMM L-BFGS, reference
``src/simulators/mopenmm.py:96-97``) with a FIRE descent — robust for
batched use and jit/scan-friendly (no line searches with data-dependent
trip counts).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def minimize_energy(energy_fn, x0, maxiter: int = 500, dt0: float = 1e-4,
                    dtmax: float = 1e-2, tol: float = 10.0):
    """FIRE minimization of ``energy_fn`` (flat coords (..., D) -> (...)).

    Returns minimized coordinates of the same shape.  ``tol`` is the
    max-force (kJ/mol/nm) convergence target (soft; fixed trip count)."""
    x0 = jnp.asarray(x0)
    squeeze = x0.ndim == 1
    x = x0[None, :] if squeeze else x0

    grad = jax.grad(lambda z: jnp.sum(energy_fn(z)))

    alpha0 = 0.1
    f_inc, f_dec, f_alpha = 1.1, 0.5, 0.99
    n_min = 5

    def step(carry, _):
        x, v, dt, alpha, npos = carry
        f = -grad(x)
        power = jnp.sum(f * v, axis=-1, keepdims=True)
        fnorm = jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-12
        vnorm = jnp.linalg.norm(v, axis=-1, keepdims=True)
        v = (1.0 - alpha) * v + alpha * f / fnorm * vnorm
        uphill = power <= 0
        v = jnp.where(uphill, 0.0, v)
        npos = jnp.where(uphill[:, 0], 0, npos + 1)
        grow = (npos > n_min)[:, None]
        dt = jnp.where(uphill, dt * f_dec, jnp.where(grow, jnp.minimum(dt * f_inc, dtmax), dt))
        alpha = jnp.where(uphill, alpha0, jnp.where(grow, alpha * f_alpha, alpha))
        v = v + dt * f
        # cap displacement for stability
        dx = dt * v
        dxn = jnp.linalg.norm(dx, axis=-1, keepdims=True)
        dx = jnp.where(dxn > 0.05, dx / dxn * 0.05, dx)
        x = x + dx
        return (x, v, dt, alpha, npos), None

    v = jnp.zeros_like(x)
    dt = jnp.full((x.shape[0], 1), dt0, x.dtype)
    alpha = jnp.full((x.shape[0], 1), alpha0, x.dtype)
    npos = jnp.zeros((x.shape[0],), jnp.int32)
    (x, *_), _ = jax.lax.scan(step, (x, v, dt, alpha, npos), None, length=maxiter)
    return x[0] if squeeze else x
