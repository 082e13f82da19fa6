"""Minimum-energy reaction paths along the chi gradient.

TPU-native rebuild of ``src/utils/minimumpath.jl``: integrate grad(chi)
normalized to unit chi-speed, with chi-levelset-constrained energy
minimization between steps.  The reference uses Optim.jl manifold LBFGS and
OrdinaryDiffEq Tsit5; here both are fixed-trip-count jax loops (projected
gradient descent with levelset retraction; RK4 integration) — shapes stay
static and everything jits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _chifun(iso):
    featurizer = iso.data.featurizer
    apply, params = iso.model.apply, iso.model.params

    def chi1(x):
        return apply(params, jnp.asarray(featurizer(x[None, :]),
                                         jnp.float32)[0])[0]

    return chi1


def dchidx(iso, x):
    """grad chi at raw coordinates (reference ``src/utils/minimumpath.jl:3-7``)."""
    return jax.grad(_chifun(iso))(jnp.asarray(x))


def minimize_levelset(x0, chi_fn, energy_fn, iterations=20, lr=1e-5,
                      retract_every=1):
    """Projected gradient descent on the levelset {chi = chi(x0)}
    (reference ``minimize_levelset``/``Levelset`` manifold,
    ``src/utils/minimumpath.jl:155-207``):

    - gradient step on U projected orthogonal to grad(chi)
    - retraction x += (target - chi(x)) grad(chi)/|grad(chi)|^2
    """
    x0 = jnp.asarray(x0)
    target = chi_fn(x0)
    dchi = jax.grad(chi_fn)
    dU = jax.grad(energy_fn)

    def step(x, _):
        g = dU(x)
        u = dchi(x)
        un = u / (jnp.linalg.norm(u) + 1e-12)
        g = g - jnp.dot(g, un) * un            # tangent projection
        x = x - lr * g
        # retract back to the levelset
        u = dchi(x)
        h = target - chi_fn(x)
        x = x + h * u / (jnp.sum(u * u) + 1e-12)
        return x, None

    x, _ = jax.lax.scan(step, x0, None, length=iterations)
    return x


def energyminimization_chilevel(iso, x0, iterations=20, lr=1e-5, **kw):
    """Energy minimization constrained to the current chi levelset
    (reference ``src/utils/minimumpath.jl:155-171``)."""
    sim = iso.data.sim
    chi1 = _chifun(iso)
    energy1 = lambda x: sim.potential(x[None, :])[0] if hasattr(sim, "potential") \
        else sim.potential_batch(x[None, :])[0]
    x = minimize_levelset(jnp.asarray(x0), chi1, energy1,
                          iterations=iterations, lr=lr)
    if not bool(jnp.all(jnp.isfinite(x))):
        raise FloatingPointError("chi-levelset minimization diverged")
    return x


def reactionintegrator(iso, x0, steps=10, stepsize=0.01, direction=1,
                       miniter=20, maxstep=0.5):
    """March along grad(chi)/|grad(chi)|^2 with levelset minimization
    (reference ``src/utils/minimumpath.jl:63-75``).  ``maxstep`` caps the
    per-move displacement (trust region) so saturated chi regions
    (grad -> 0) don't blow up the 1/|grad|^2 step."""
    chi1 = _chifun(iso)
    sim = iso.data.sim
    energy1 = (lambda x: sim.potential(x[None, :])[0]) if hasattr(sim, "potential") \
        else (lambda x: sim.potential_batch(x[None, :])[0])
    dchi = jax.grad(chi1)

    x = jnp.asarray(x0)
    out = []
    for _ in range(steps):
        g = dchi(x)
        dx = direction * stepsize * g / (jnp.sum(g * g) + 1e-12)
        nrm = jnp.linalg.norm(dx)
        dx = jnp.where(nrm > maxstep, dx / nrm * maxstep, dx)
        x = x + dx
        x = minimize_levelset(x, chi1, energy1, iterations=miniter)
        out.append(x)
    if not out:
        return jnp.zeros((0,) + x.shape)
    return jnp.stack(out)


def reactionpath_minimum(iso, x0=None, steps=101, miniter=20, extrasteps=0):
    """Full reaction path through x0: integrate -grad chi to chi~0 and
    +grad chi to chi~1 with orthogonal energy minimization
    (reference ``src/utils/minimumpath.jl:31-49``).  Returns (nframes, 3N)."""
    if x0 is None:
        c = np.asarray(iso.data.coords)
        x0 = c[np.random.randint(len(c))]
    chi1 = _chifun(iso)
    sim = iso.data.sim
    energy1 = (lambda x: sim.potential(x[None, :])[0]) if hasattr(sim, "potential") \
        else (lambda x: sim.potential_batch(x[None, :])[0])

    xs = minimize_levelset(jnp.asarray(x0), chi1, energy1, iterations=miniter)
    chi = float(chi1(xs))
    steps2 = max(int(steps * (1 - chi)) + extrasteps, 0)
    steps1 = max(int(steps * chi) + extrasteps, 0)
    stepsize = 1.0 / steps

    x1 = reactionintegrator(iso, xs, steps=steps1, stepsize=stepsize,
                            direction=-1, miniter=miniter)
    x2 = reactionintegrator(iso, xs, steps=steps2, stepsize=stepsize,
                            direction=1, miniter=miniter)
    return jnp.concatenate([x1[::-1], xs[None, :], x2], axis=0)


def reactionforce(iso, sim, x, direction, orth=0.01):
    """Force with unit chi-speed colinear part + orth * F in the orthogonal
    space (reference ``src/utils/minimumpath.jl:148-160``)."""
    x = jnp.asarray(x)
    f = sim.force(x[None, :])[0] if hasattr(sim, "force") else sim.force(x)
    dchi = dchidx(iso, x)
    n2 = jnp.sum(dchi * dchi) + 1e-12
    f = f - dchi * (jnp.dot(f, dchi) / n2)
    return f * orth + (direction / n2) * dchi


def reactionpath_ode(iso, x0, steps=101, minimize=False, extrapolate=0.0,
                     orth=0.01, substeps=20, maxspeed=50.0):
    """Integrate the reaction force with fixed-step RK4 in chi-time
    (TPU-friendly replacement of the reference's Tsit5 integration,
    ``src/utils/minimumpath.jl:96-144``).  ``maxspeed`` caps |dx/dchi|
    (trust region: grad(chi) -> 0 in saturated regions makes the exact
    reaction force blow up).  Returns (steps, 3N)."""
    sim = iso.data.sim
    x0 = jnp.asarray(x0)
    if minimize:
        x0 = energyminimization_chilevel(iso, x0)
    t0 = float(_chifun(iso)(x0))

    lo, hi = -extrapolate, 1 + extrapolate
    ts = np.linspace(lo, hi, steps)

    def rk4_to(x, t_from, t_to, direction):
        h = (t_to - t_from) / substeps

        def f(z):
            v = reactionforce(iso, sim, z, direction, orth)
            n = jnp.linalg.norm(v)
            return jnp.where(n > maxspeed, v / n * maxspeed, v)

        def body(x, _):
            k1 = f(x)
            k2 = f(x + h / 2 * k1)
            k3 = f(x + h / 2 * k2)
            k4 = f(x + h * k3)
            return x + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4), None

        x, _ = jax.lax.scan(body, x, None, length=substeps)
        return x

    # backward from t0 down to lo, forward from t0 up to hi
    frames = {}
    x = x0
    prev_t = t0
    for t in ts[ts <= t0][::-1]:
        x = rk4_to(x, prev_t, t, direction=1)   # rk4 handles sign via h
        frames[t] = x
        prev_t = t
    x = x0
    prev_t = t0
    for t in ts[ts > t0]:
        x = rk4_to(x, prev_t, t, direction=1)
        frames[t] = x
        prev_t = t
    return jnp.stack([frames[t] for t in ts])
