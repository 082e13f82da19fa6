"""Overdamped Langevin dynamics in analytic potentials — pure JAX.

TPU-native rebuild of ``src/simulators/langevin.jl``: the reference integrates
each walker serially with StochasticDiffEq.EM under ``Threads.@threads``
(``src/simulators/langevin.jl:21-28``); here all (n x k) walkers advance
together in one jitted ``lax.scan`` over Euler–Maruyama steps with the force
``-grad V`` computed by ``jax.grad`` (the reference uses ForwardDiff,
``src/simulators/langevin.jl:17-19``).

Includes the reference's toy systems: ``Doublewell``, ``Triplewell``
(Metzner/Schuette/Vanden-Eijnden 2006) and ``MuellerBrown``
(``src/simulators/langevin.jl:88-143``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Union

import jax
import jax.numpy as jnp
import numpy as np

from .base import IsoSimulation


# ==========================================================================
# Potentials (reference src/simulators/langevin.jl:96-143)
# ==========================================================================

def doublewell(x):
    """V(x) = (x^2 - 1)^2."""
    return (x[0] ** 2 - 1.0) ** 2


def triplewell(x):
    """Metzner/Schuette/Vanden-Eijnden (2006) 2-D triple well."""
    X, y = x[0], x[1]
    return (3 * jnp.exp(-X**2 - (y - 1/3)**2)
            - 3 * jnp.exp(-X**2 - (y - 5/3)**2)
            - 5 * jnp.exp(-(X - 1)**2 - y**2)
            - 5 * jnp.exp(-(X + 1)**2 - y**2)
            + 0.2 * X**4 + 0.2 * (y - 1/3)**4)


def mueller_brown(x):
    """Mueller-Brown potential, three metastable basins."""
    X, y = x[0], x[1]
    return (-200 * jnp.exp(-(X - 1)**2 - 10 * y**2)
            - 100 * jnp.exp(-X**2 - 10 * (y - 0.5)**2)
            - 170 * jnp.exp(-6.5 * (X + 0.5)**2 + 11 * (X + 0.5) * (y - 1.5)
                            - 6.5 * (y - 1.5)**2)
            + 15 * jnp.exp(0.7 * (X + 1)**2 + 0.6 * (X + 1) * (y - 1)
                           + 0.7 * (y - 1)**2))


def _supportbox(support, dim):
    s = np.asarray(support, dtype=np.float64)
    if s.ndim == 0:
        s = np.array([-float(s), float(s)])
    if s.ndim == 1:
        s = np.tile(s[None, :], (dim, 1))
    return s  # (dim, 2)


# ==========================================================================
# Generic diffusion
# ==========================================================================

@dataclass
class Diffusion(IsoSimulation):
    """Overdamped Langevin diffusion dX = -grad V(X) dt + sigma dW in an
    analytic potential (reference ``Diffusion``, ``src/simulators/langevin.jl:63-77``)."""

    potential: Callable
    dim_: int = 1
    sigma: Union[float, Any] = 1.0
    dt: float = 0.01
    lagtime_: float = 1.0
    support: Any = 1.0
    bias: Any = None

    def __post_init__(self):
        self._supportbox = _supportbox(self.support, self.dim_)
        self._jit_cache = {}

    def __getstate__(self):
        d = self.__dict__.copy()
        d["_jit_cache"] = {}   # jitted closures are not picklable
        d["bias"] = None       # bias closures likewise; rebuilt per run
        return d

    # -- interface ------------------------------------------------------

    @property
    def dim(self):
        return self.dim_

    @property
    def lagtime(self):
        return self.lagtime_

    @property
    def steps(self):
        return int(round(self.lagtime_ / self.dt))

    @property
    def coords(self):
        return jnp.asarray((self._supportbox[:, 0] + self._supportbox[:, 1]) / 2,
                           jnp.float32)

    def force(self, x):
        """-grad V, vectorized over leading batch dims."""
        g = jax.grad(self.potential)
        for _ in range(max(x.ndim - 1, 0)):
            g = jax.vmap(g)
        return -g(x)

    def potential_batch(self, x):
        """V over leading batch dims; x: (..., d)."""
        v = self.potential
        for _ in range(max(x.ndim - 1, 0)):
            v = jax.vmap(v)
        return v(x)

    def randx0(self, n, key=None):
        """Uniform samples in the support box
        (reference ``src/simulators/langevin.jl:47-52``)."""
        key = _key(key)
        lo = jnp.asarray(self._supportbox[:, 0], jnp.float32)
        hi = jnp.asarray(self._supportbox[:, 1], jnp.float32)
        u = jax.random.uniform(key, (n, self.dim_), jnp.float32)
        return lo + u * (hi - lo)

    def defaultmodel(self, n=None, nout=1, key=None, **kwargs):
        from ..models import smallnet
        return smallnet(self.dim_, nout=nout, key=key, **kwargs)

    # -- integration ------------------------------------------------------

    def _stepper(self, nsteps: int):
        """Jitted EM integrator advancing a whole batch by ``nsteps`` steps."""
        if ("step", nsteps) in self._jit_cache:
            return self._jit_cache[("step", nsteps)]

        dt = self.dt
        sig = jnp.asarray(self.sigma, jnp.float32)
        sqdt = math.sqrt(dt)
        pot = self.potential
        force1 = lambda x: -jax.grad(pot)(x)
        forceN = jax.vmap(force1)

        @jax.jit
        def run(x, key):
            # x: (m, d)
            def step(carry, k):
                x = carry
                w = jax.random.normal(k, x.shape, x.dtype)
                x = x + forceN(x) * dt + sig * sqdt * w
                return x, None
            keys = jax.random.split(key, nsteps)
            x, _ = jax.lax.scan(step, x, keys)
            return x

        self._jit_cache[("step", nsteps)] = run
        return run

    def _stepper_girsanov(self, nsteps: int):
        """Biased EM with Girsanov weights through the package integrator
        (``md.integrators.brownian_girsanov`` wired to the analytic
        convention dX = F dt + sigma dB: gamma = m = 1,
        T = sigma^2/(2 kB)).

        For an ``optcontrol`` bias (``bias.optcontrol_spec`` present) the
        compiled program reads the chi parameters and the per-generation
        (b, qrate, Tmax) scalars as runtime inputs — optcontrol refreshes
        between ``run_girsanov`` generations reuse one executable, the
        same design as the fused MD path (``mdsim._girsanov_fused_fn``).
        Arbitrary bias callables fall back to one program per callable."""
        from ..md import integrators as I

        masses = jnp.ones((self.dim_,), jnp.float32)
        Tnoise = jnp.asarray(self.sigma, jnp.float32) ** 2 / (2.0 * I.KB)
        dt = self.dt
        force = self.force

        spec = getattr(self.bias, "optcontrol_spec", None)
        if spec is None:
            key_ = ("girsanov_generic", nsteps, id(self.bias))
            if key_ not in self._jit_cache:
                bias_fn = self.bias

                @jax.jit
                def run(x, key):
                    xT, logw = I.brownian_girsanov(
                        force, bias_fn, x, masses, Tnoise, 1.0, dt,
                        nsteps, key)
                    return xT, jnp.exp(logw)

                self._jit_cache[key_] = run
            return self._jit_cache[key_]

        mspec = spec["model"]
        apply, featurizer = mspec.apply, spec["featurizer"]
        fs = float(spec["forcescale"])
        # key on the model's static architecture (apply is determined by
        # it; per-generation with_params copies get fresh ids) — same
        # assumption as mdsim._girsanov_fused_fn's key
        key_ = ("girsanov", nsteps, getattr(mspec, "sizes", None),
                getattr(mspec, "layernorm", None), id(featurizer), fs)
        if key_ not in self._jit_cache:

            @jax.jit
            def core(x, key, params, b, qrate, tmax):
                def bias_fn(z, t, sigma, F):
                    # chi-derived optimal control, psi floored exactly as
                    # in integrators.optcontrol / pallas_md's fused kernel
                    lam_t = jnp.exp(qrate * (tmax - t))

                    def logpsi(zz):
                        feats = featurizer(zz[None, :])[0]
                        chi = apply(params, feats)[0]
                        return jnp.log(jnp.maximum(
                            lam_t * (chi - b) + b, I.PSI_FLOOR))

                    return fs * sigma * jax.vmap(jax.grad(logpsi))(z)

                xT, logw = I.brownian_girsanov(
                    force, bias_fn, x, masses, Tnoise, 1.0, dt, nsteps, key)
                return xT, jnp.exp(logw)

            self._jit_cache[key_] = core

        core = self._jit_cache[key_]

        def run(x, key):
            s = self.bias.optcontrol_spec
            return core(x, key, s["model"].params, jnp.float32(s["b"]),
                        jnp.float32(s["qrate"]), jnp.float32(s["Tmax"]))

        return run

    def propagate(self, x0, nk, key=None, steps=None):
        """(n, d) -> (n, nk, d): one lagtime of EM for nk replicas per start
        point, all walkers in a single device computation
        (replaces the reference's threaded loop ``src/simulators/langevin.jl:21-28``).
        ``steps`` overrides the lag length (used by ``lag_sweep``).  With
        ``self.bias`` set (e.g. by ``run_girsanov``), integrates under the
        bias and returns Girsanov-weighted samples
        (reference dispatch ``src/simulators/openmm.jl:546``)."""
        key = _key(key)
        x0 = jnp.asarray(x0, jnp.float32)
        n, d = x0.shape
        xs = jnp.repeat(x0, nk, axis=0)            # (n*nk, d)
        nsteps = self.steps if steps is None else int(steps)
        if self.bias is not None:
            from ..data import WeightedSamples
            run = self._stepper_girsanov(nsteps)
            ys, w = run(xs, key)
            return WeightedSamples(ys.reshape(n, nk, d),
                                   w.reshape(n, nk))
        run = self._stepper(nsteps)
        ys = run(xs, key)
        return ys.reshape(n, nk, d)

    def trajectory(self, T=None, x0=None, saveat=None, key=None, save_start=False):
        """Trajectory of physical length T saved every ``saveat``
        (reference ``src/simulators/langevin.jl:33-40``).  Returns (nsave, d)."""
        key = _key(key)
        T = self.lagtime_ if T is None else T
        saveat = self.dt if saveat is None else saveat
        if x0 is None:
            x0 = self.randx0(1, key=key)[0]
            key, = jax.random.split(key, 1)
        x0 = jnp.asarray(x0, jnp.float32).reshape(-1)
        inner = int(round(saveat / self.dt))
        nsave = int(round(T / saveat))
        run = self._traj_fn(inner, nsave)
        out = run(x0[None, :], key)[:, 0, :]
        if save_start:
            out = jnp.concatenate([x0[None, :], out], axis=0)
        return out

    def _traj_fn(self, inner: int, nsave: int):
        if ("traj", inner, nsave) in self._jit_cache:
            return self._jit_cache[("traj", inner, nsave)]
        dt = self.dt
        sig = jnp.asarray(self.sigma, jnp.float32)
        sqdt = math.sqrt(dt)
        pot = self.potential
        forceN = jax.vmap(lambda x: -jax.grad(pot)(x))

        @jax.jit
        def run(x, key):
            # x: (m, d) -> (nsave, m, d) saving every `inner` steps
            def save_block(x, k):
                def step(xc, kk):
                    w = jax.random.normal(kk, xc.shape, xc.dtype)
                    return xc + forceN(xc) * dt + sig * sqdt * w, None
                x, _ = jax.lax.scan(step, x, jax.random.split(k, inner))
                return x, x
            _, saves = jax.lax.scan(save_block, x, jax.random.split(key, nsave))
            return saves

        self._jit_cache[("traj", inner, nsave)] = run
        return run

    def laggedtrajectory(self, lags, x0=None, lagtime=None, key=None):
        """Trajectory saved every lagtime, ``lags`` frames
        (reference ``src/simulators/langevin.jl:42``)."""
        lagtime = self.lagtime_ if lagtime is None else lagtime
        return self.trajectory(T=lags * lagtime, x0=x0, saveat=lagtime, key=key)


# ==========================================================================
# Toy systems
# ==========================================================================

def Doublewell(**kwargs):
    """1-D doublewell diffusion (reference ``src/simulators/langevin.jl:88-93``)."""
    kw = dict(potential=doublewell, dim_=1, support=1.5)
    kw.update(kwargs)
    return Diffusion(**kw)


def Triplewell(**kwargs):
    """2-D triplewell diffusion (reference ``src/simulators/langevin.jl:103-118``)."""
    kw = dict(potential=triplewell, dim_=2, sigma=1.0,
              support=np.array([[-2.0, 2.0], [-1.5, 2.5]]))
    kw.update(kwargs)
    return Diffusion(**kw)


def MuellerBrown(**kwargs):
    """2-D Mueller-Brown diffusion (reference ``src/simulators/langevin.jl:128-143``)."""
    kw = dict(potential=mueller_brown, dim_=2, sigma=7.0,
              support=np.array([[-1.4, 1.1], [-0.25, 2.0]]),
              dt=0.0001, lagtime_=0.001)
    kw.update(kwargs)
    return Diffusion(**kw)


def _key(key):
    if key is None:
        return jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
    if isinstance(key, int):
        return jax.random.PRNGKey(key)
    return key
