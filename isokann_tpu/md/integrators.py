"""Batched stochastic integrators for molecular dynamics in pure JAX.

Replaces OpenMM's LangevinMiddle/Brownian integrators and the reference's
custom Julia integrators over OpenMM forces
(``src/simulators/openmm.jl:420-637``):

- ``langevin_middle``     : OpenMM LangevinMiddleIntegrator scheme (BAOAB-
                            middle); the reference's production default
- ``aboba_girsanov``      : underdamped ABOBA splitting with Girsanov
                            reweighting (ref ``langevin_girsanov!`` :569-637)
- ``brownian`` / ``brownian_girsanov`` : overdamped Euler-Maruyama,
                            optionally with Girsanov weights
                            (ref ``integrate_girsanov`` :510-536)
- ``langevin_em``         : naive underdamped EM (ref ``integrate_langevin``
                            :440-464)

All integrators advance a whole batch of walkers (B, 3N) in one
``lax.scan`` over steps — the reference's per-walker serial loops
(``src/simulators/openmm.jl:291-299``) become a single device program.

Units: nm, ps, amu, kJ/mol; velocities nm/ps.  kB in kJ/mol/K.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

KB = 0.00831446261815324


def maxwell_boltzmann(key, masses3, T, shape):
    """Velocities from the Maxwell-Boltzmann distribution.

    ``masses3``: (3N,) per-coordinate masses; ``shape``: batch shape + (3N,).
    (reference ``src/simulators/openmm.jl:446``)."""
    std = jnp.sqrt(KB * T / masses3)
    return jax.random.normal(key, shape) * std


def constants(masses3, T, gamma, overdamped: bool):
    """Noise amplitudes for over/underdamped Langevin
    (reference ``constants``/``sigma``, ``src/simulators/openmm.jl:467-484``).

    overdamped: sigma = sqrt(2 kB T / (gamma M))   [position noise scale]
    underdamped: sigma = sqrt(2 kB T gamma M)      [momentum noise scale]"""
    if overdamped:
        return jnp.sqrt(2 * KB * T / (gamma * masses3))
    return jnp.sqrt(2 * KB * T * gamma * masses3)


# ==========================================================================
# Core steppers.  force_fn: (B, 3N) -> (B, 3N).
# ==========================================================================

def langevin_middle_step(force_fn, x, v, masses3, T, gamma, dt, key,
                         constraints=None):
    """One LangevinMiddle step (exposed for flat single-level scans)."""
    a = math.exp(-gamma * dt)
    b = math.sqrt(1.0 - a * a)
    vstd = jnp.sqrt(KB * T / masses3)
    h = 0.5 * dt

    def drift(x, v):
        xn = x + h * v
        if constraints is None:
            return xn, v
        xn = constraints.shake(x, xn)
        return xn, (xn - x) / h

    f = force_fn(x)
    v = v + dt * f / masses3
    if constraints is not None:
        v = constraints.rattle(x, v)
    x, v = drift(x, v)
    v = a * v + b * vstd * jax.random.normal(key, v.shape, v.dtype)
    if constraints is not None:
        v = constraints.rattle(x, v)
    x, v = drift(x, v)
    return x, v


def langevin_middle(force_fn: Callable, x0, v0, masses3, T, gamma, dt,
                    nsteps: int, key, save_every: Optional[int] = None,
                    constraints=None):
    """OpenMM LangevinMiddleIntegrator scheme, batched.

    One step: v += dt f/m;  x += dt/2 v;  v = a v + b sqrt(kBT/m) R;
    x += dt/2 v   with a = exp(-gamma dt), b = sqrt(1 - a^2).

    With ``constraints`` (a ``md.constraints.ConstraintSet``), follows the
    constrained variant (OpenMM's scheme): RATTLE after the kick and after
    the random stage; SHAKE after each drift with the velocity recovered
    from the constrained displacement.

    Returns (x, v) after nsteps, or (xs_saved, (x, v)) if save_every."""
    def step(carry, k):
        x, v = carry
        x, v = langevin_middle_step(force_fn, x, v, masses3, T, gamma, dt,
                                    k, constraints=constraints)
        return (x, v), None

    def step_save(carry, k):
        (x, v), _ = step(carry, k)
        return (x, v), x

    keys = jax.random.split(key, nsteps)
    if save_every is None:
        (x, v), _ = jax.lax.scan(step, (x0, v0), keys)
        return x, v

    nblocks = nsteps // save_every
    keys = keys[:nblocks * save_every].reshape(nblocks, save_every, -1)

    def block(carry, ks):
        carry, _ = jax.lax.scan(step, carry, ks)
        return carry, carry[0]

    (x, v), saves = jax.lax.scan(block, (x0, v0), keys)
    return saves, (x, v)


def langevin_em(force_fn, x0, v0, masses3, T, gamma, dt, nsteps, key,
                perturbation=None):
    """Naive underdamped Euler-Maruyama
    (reference ``integrate_langevin``/``langevin_step!``,
    ``src/simulators/openmm.jl:440-464``)."""
    amp = jnp.sqrt(2 * gamma * KB * T * dt * masses3)

    def step(carry, k):
        x, v = carry
        f = force_fn(x)
        if perturbation is not None:
            f = f + perturbation(x)
        db = jax.random.normal(k, x.shape, x.dtype)
        v = v + ((f - gamma * masses3 * v) * dt + amp * db) / masses3
        x = x + v * dt
        return (x, v), None

    keys = jax.random.split(key, nsteps)
    (x, v), _ = jax.lax.scan(step, (x0, v0), keys)
    return x, v


def brownian(force_fn, x0, masses3, T, gamma, dt, nsteps, key):
    """Overdamped EM: x += F/(gamma m) dt + sigma dB."""
    sig = constants(masses3, T, gamma, overdamped=True)
    sqdt = math.sqrt(dt)

    def step(x, k):
        f = force_fn(x)
        db = jax.random.normal(k, x.shape, x.dtype)
        x = x + f / (gamma * masses3) * dt + sig * sqdt * db
        return x, None

    keys = jax.random.split(key, nsteps)
    x, _ = jax.lax.scan(step, x0, keys)
    return x


def brownian_girsanov(force_fn, bias_fn, x0, masses3, T, gamma, dt, nsteps,
                      key, sigmascaled=True):
    """Overdamped EM with Girsanov reweighting
    (reference ``integrate_girsanov``/``od_langevin_step_girsanov!``,
    ``src/simulators/openmm.jl:510-541``):

        dX = [F/(gamma m) + sigma u] dt + sigma dB
        dlogw = -(|u|^2/2 dt + u . dB)

    Returns (x, logw) with logw per walker."""
    sig = constants(masses3, T, gamma, overdamped=True)
    sqdt = math.sqrt(dt)

    def step(carry, kt):
        x, logw, t = carry
        k = kt
        f = force_fn(x)
        u = bias_fn(x, t=t, sigma=sig, F=f)
        if not sigmascaled:
            u = u / sig
        db = jax.random.normal(k, x.shape, x.dtype) * sqdt
        x = x + (f / (gamma * masses3) + sig * u) * dt + sig * db
        dlogw = -(jnp.sum(u * u, axis=-1) / 2 * dt + jnp.sum(u * db, axis=-1))
        return (x, logw + dlogw, t + dt), None

    keys = jax.random.split(key, nsteps)
    (x, logw, _), _ = jax.lax.scan(
        step, (x0, jnp.zeros(x0.shape[:-1], x0.dtype), 0.0), keys)
    return x, logw


def aboba_girsanov(force_fn, bias_fn, x0, p0, masses3, T, gamma, dt,
                   nsteps: int, key, save_every: Optional[int] = None,
                   sigmascaled=True, constraints=None):
    """Underdamped ABOBA splitting with Girsanov weights
    (reference ``langevin_girsanov!``, ``src/simulators/openmm.jl:569-637``,
    following the scheme of JPC B 2024, 10.1021/acs.jpcb.4c01702).

    State: positions q, momenta p.  Per step:
        q += dt/2 p/m                                   (A)
        B = bias(q); [B *= sigma]; Deltaeta = (d+1)/f dt/2 B
        logw -= eta . Deltaeta + |Deltaeta|^2 / 2
        p += dt/2 (F + B)                                (B)
        p = d p + f eta                                  (O)
        p += dt/2 (F + B)                                (B)
        q += dt/2 p/m                                    (A)
    with d = exp(-gamma dt), f = sqrt(kB T m (1 - d^2)).

    Returns final (q, p, logw), or (qs, logws, (q, p, logw)) if save_every.
    """
    sig = constants(masses3, T, gamma, overdamped=False)
    d = math.exp(-gamma * dt)
    famp = jnp.sqrt(KB * T * masses3 * (1.0 - d * d))
    t2 = dt / 2.0

    def drift(q, p):
        qn = q + t2 * p / masses3
        if constraints is None:
            return qn, p
        qn = constraints.shake(q, qn)
        return qn, (qn - q) / t2 * masses3

    def step(carry, inp):
        q, p, logw, t = carry
        k = inp
        eta = jax.random.normal(k, p.shape, p.dtype)
        q, p = drift(q, p)                             # A
        F = force_fn(q)
        if bias_fn is not None:
            B = bias_fn(q, t=t, sigma=sig, F=F)
            if sigmascaled:
                B = B * sig
            if constraints is not None:
                # project the bias onto the constraint tangent space
                # (mass-metric RATTLE projection): the constrained
                # dynamics only realizes the tangential component, so the
                # Girsanov weight must be computed from it as well
                B = constraints.rattle(q, B / masses3) * masses3
            deta = (d + 1.0) / famp * t2 * B
            logw = logw - (jnp.sum(eta * deta, axis=-1)
                           + jnp.sum(deta * deta, axis=-1) / 2)
            F = F + B
        b = t2 * F
        p = p + b                                      # B
        p = d * p + famp * eta                         # O
        p = p + b                                      # B
        if constraints is not None:
            p = constraints.rattle(q, p / masses3) * masses3
        q, p = drift(q, p)                             # A
        return (q, p, logw, t + dt), None

    logw0 = jnp.zeros(x0.shape[:-1], x0.dtype)
    keys = jax.random.split(key, nsteps)

    if save_every is None:
        (q, p, logw, _), _ = jax.lax.scan(step, (x0, p0, logw0, 0.0), keys)
        return q, p, logw

    nblocks = nsteps // save_every
    keys = keys[:nblocks * save_every].reshape(nblocks, save_every, -1)

    def block(carry, ks):
        carry, _ = jax.lax.scan(step, carry, ks)
        q, p, logw, t = carry
        return carry, (q, logw)

    (q, p, logw, _), (qs, logws) = jax.lax.scan(block, (x0, p0, logw0, 0.0), keys)
    return qs, logws, (q, p, logw)


# ==========================================================================
# Optimal-control bias (reference ``optcontrol``, openmm.jl:640-667)
# ==========================================================================

def shift_and_scale(xs, ys):
    """Affine fit ys ~ bias + scale*xs; returns (bias, scale, limit)
    (reference ``src/simulators/openmm.jl:669-683``)."""
    import numpy as np
    xs = np.asarray(xs, dtype=float).ravel()
    ys = np.asarray(ys, dtype=float).ravel()
    X = np.stack([np.ones_like(xs), xs], axis=1)
    beta = np.linalg.pinv(X) @ ys
    bias, scale = beta[0], beta[1]
    return bias, scale, bias / (1.0 - scale)


# floor for the value function psi = lam_t*(chi - b) + b inside the
# optimal-control bias (XLA and fused-kernel paths must agree so the
# noiseless-parity tests keep passing)
PSI_FLOOR = 1e-2


def optcontrol(iso, forcescale=1.0):
    """chi-derived optimal importance-sampling bias for OVERDAMPED dynamics
    (reference ``optcontrol``, ``src/simulators/openmm.jl:640-667``).

    Returns ``bias_fn(x, t, sigma, F) -> u`` (sigma-scaled convention)."""
    import numpy as np

    sim = iso.data.sim
    chi1 = np.asarray(iso.chis()).ravel()
    kchi = np.asarray(iso.koopman()).ravel()
    shift, scale, limit = shift_and_scale(chi1, kchi)
    lam = scale
    Tmax = sim.lagtime
    if not (0.0 < lam <= 1.0):
        from ..targets import DomainError
        raise DomainError(
            f"expected contracting Koopman operator (fitted lambda={lam:.4g}"
            " outside (0, 1]; chi is not yet converged enough for a"
            " well-defined optimal-control bias)")
    q = math.log(lam) / Tmax
    b = shift / (1.0 - lam) if abs(1.0 - lam) > 1e-12 else 0.5

    featurizer = iso.data.featurizer
    apply, params = iso.model.apply, iso.model.params

    def chifun(x):
        return apply(params, jnp.asarray(featurizer(x[None, :]),
                                         jnp.float32)[0])[0]

    def bias_fn(x, t, sigma, F):
        lam_t = jnp.exp(q * (Tmax - t))

        def logpsi(z):
            # psi can go nonpositive where the (identity-output) chi
            # net strays below b*(1 - 1/lam_t); the optimal control
            # diverges there and log would NaN the trajectory AND its
            # Girsanov weight.  Floor psi (same constant as the fused
            # kernel, PSI_FLOOR): the clamped bias is still a valid IS
            # proposal — the weights account for the force actually
            # applied.  The reference has no such guard (openmm.jl:
            # 640-667) and NaNs instead.
            return jnp.log(jnp.maximum(lam_t * (chifun(z) - b) + b,
                                       PSI_FLOOR))

        grad = jax.vmap(jax.grad(logpsi))(x)
        return forcescale * sigma * grad

    # structured description of the bias: lets MDSimulation.propagate run
    # the whole biased trajectory inside the fused Pallas kernel
    # (md/pallas_md.aboba_girsanov_fused) when the system qualifies
    bias_fn.optcontrol_spec = dict(
        model=iso.model.with_params(params), featurizer=featurizer,
        forcescale=float(forcescale), b=float(b), qrate=float(q),
        Tmax=float(Tmax))
    return bias_fn
