"""Multi-chip scaling: walker/data sharding over a jax.sharding.Mesh.

The reference has no distributed computing at all (SURVEY.md §2.11); its
parallelism is shared-memory threads over independent walkers
(``src/simulators/langevin.jl:24``, ``src/simulators/mopenmm.py:148-152``).
The TPU-native equivalent implemented here:

- **walker axis = data-parallel mesh axis.**  Koopman burst propagation and
  the chi/Kchi forward passes shard the walker (leading) dimension across
  chips; each chip integrates its shard of walkers with zero communication.
- **training**: minibatch SGD with batch sharding; XLA GSPMD inserts the
  gradient psum.  The shift-scale target needs only global min/max
  (lax pmin/pmax equivalents, inserted automatically for sharded inputs).
- Collectives ride ICI; nothing latency-critical crosses chips except the
  per-episode normalization reductions (SURVEY.md §5).

All functions work with any device set (real TPUs or the virtual CPU mesh
used in tests / dryrun).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_default_devices = None


def set_default_devices(devices) -> None:
    """Pin the device list that ``make_mesh()``/``device_count()`` use when
    no explicit devices are given (``None`` restores ``jax.devices()``).

    Needed when the default backend is not the mesh backend: the axon TPU
    plugin claims the default backend at first use, so a process that
    touched the TPU before building a virtual CPU mesh (e.g. the driver's
    ``entry()`` compile check before ``dryrun_multichip``) would otherwise
    shard-gate on ``jax.device_count() == 1``."""
    global _default_devices
    _default_devices = None if devices is None else list(devices)


def default_devices():
    """The device list sharded paths use: the ``set_default_devices``
    override if set, else ``jax.devices()``."""
    return (list(_default_devices) if _default_devices is not None
            else jax.devices())


def device_count() -> int:
    """``len(default_devices())`` — the shard-condition device count."""
    return len(default_devices())


def make_mesh(n_devices: Optional[int] = None, axis: str = "data",
              devices=None) -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices (or an explicit
    device list)."""
    devices = default_devices() if devices is None else list(devices)
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, x, axis: str = "data"):
    """Place ``x`` with its leading (walker/batch) dim sharded over the mesh."""
    spec = P(axis, *([None] * (jnp.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, opt state) over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def _batch_spec(mesh, ndim, axis="data"):
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


# ==========================================================================
# Sharded propagation
# ==========================================================================

def sharded_propagate(mesh: Mesh, step_fn, x0, key, axis: str = "data"):
    """Run a batched propagation ``step_fn(x0, key) -> y`` with walkers
    sharded over the mesh.  ``x0``: (nwalkers, d); embarrassingly parallel —
    zero cross-chip traffic."""
    x0 = shard_batch(mesh, x0, axis)
    fn = jax.jit(step_fn,
                 in_shardings=(_batch_spec(mesh, 2, axis), NamedSharding(mesh, P())),
                 out_shardings=_batch_spec(mesh, 2, axis))
    return fn(x0, key)


# ==========================================================================
# Sharded ISOKANN training step
# ==========================================================================

def sharded_train_step(mesh: Mesh, apply, opt, axis: str = "data",
                       weighted: bool = False):
    """Build a jitted, mesh-sharded single Koopman iteration:

        kchi = mean_k apply(params, ys)      (walker-sharded forward)
        target = shiftscale(kchi)            (global pmin/pmax reduction)
        grads  = d/dparams sum((apply(params, xs) - target)^2)  (psum)
        params = opt.update(...)

    xs: (n, f) / ys: (n, k, f) sharded on the walker axis; params/opt_state
    replicated.  Returns ``step(params, opt_state, xs, ys, yw, key)``.
    """
    bspec2 = _batch_spec(mesh, 2, axis)
    bspec3 = _batch_spec(mesh, 3, axis)
    rep = NamedSharding(mesh, P())

    def step(params, opt_state, xs, ys, yw, key):
        chi_y = apply(params, ys)                      # (n, k, d)
        if weighted:
            kchi = jnp.sum(chi_y * yw[..., None], axis=1) / ys.shape[1]
        else:
            kchi = jnp.mean(chi_y, axis=1)
        lo = jnp.min(kchi)
        hi = jnp.max(kchi)
        target = (kchi - lo) / (hi - lo)

        def lossf(p):
            pred = apply(p, xs)
            return jnp.sum((pred - target) ** 2) / xs.shape[0]

        loss, grads = jax.value_and_grad(lossf)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(rep, rep, bspec2, bspec3, bspec2, rep),
        out_shardings=(rep, rep, rep))


def shardmap_train_step(mesh: Mesh, apply, opt, axis: str = "data"):
    """Explicitly-collective variant of ``sharded_train_step`` via
    ``shard_map``: every cross-chip reduction is written out —
    ``lax.pmin``/``lax.pmax`` for the shift-scale normalization and
    ``lax.pmean`` for the gradients (SURVEY.md §2.11: the only
    latency-critical collectives of the algorithm, riding ICI).

    Numerically identical to the GSPMD version; exists to make the
    communication pattern explicit and hand-tunable."""
    from jax.experimental.shard_map import shard_map

    def step(params, opt_state, xs, ys, yw, key):
        # xs/ys/yw are the local shards; params/opt_state replicated
        chi_y = apply(params, ys)
        kchi = jnp.mean(chi_y, axis=1)
        lo = jax.lax.pmin(jnp.min(kchi), axis)
        hi = jax.lax.pmax(jnp.max(kchi), axis)
        target = (kchi - lo) / (hi - lo)

        n_local = xs.shape[0]

        def lossf(p):
            pred = apply(p, xs)
            return jnp.sum((pred - target) ** 2) / n_local

        loss, grads = jax.value_and_grad(lossf)(params)
        grads = jax.tree_util.tree_map(lambda g: jax.lax.pmean(g, axis), grads)
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    pspec = P()
    bspec = P(axis)
    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(pspec, pspec, bspec, bspec, bspec, pspec),
        out_specs=(pspec, pspec, pspec),
        check_rep=False))


# ==========================================================================
# Full distributed ISOKANN step: propagate + featurize + train
# ==========================================================================

def distributed_iso_step(mesh: Mesh, sim, apply, opt, nk: int,
                         featurizer=None, axis: str = "data"):
    """One full data-generation + training iteration, jitted over the mesh.

    Returns ``step(params, opt_state, x0, key) -> (params, opt_state, loss,
    ys)`` where ``x0`` (n, d) is walker-sharded:  each chip propagates its
    walkers (sim's batched stepper), featurizes, computes the Koopman
    expectation, the shift-scale target (global reduction) and the SGD
    update (gradient psum).  This is the "episode fusion" of SURVEY.md §7.6
    extended across the mesh.
    """
    featurizer = featurizer or getattr(sim, "featurizer", None) or (lambda x: x)
    bspec2 = _batch_spec(mesh, 2, axis)
    rep = NamedSharding(mesh, P())

    nsteps = getattr(sim, "steps", None) or max(
        1, int(round(sim.lagtime / sim.dt)))

    # build a pure batched propagation closure (avoid sim's internal jit
    # cache so sharding is controlled here)
    if hasattr(sim, "system"):   # MDSimulation
        from ..md import integrators as I
        from ..md.forces import force_flat
        system = sim.system
        masses3, T, gamma, dt = sim.masses3, sim.temp, sim.friction, sim.step

        def propagate(xk, key):
            kv, ki = jax.random.split(key)
            v0 = I.maxwell_boltzmann(kv, masses3, T, xk.shape)
            x, _ = I.langevin_middle(lambda z: force_flat(system, z), xk, v0,
                                     masses3, T, gamma, dt, nsteps, ki)
            return x
    else:                        # analytic Langevin diffusion
        import math as _math
        pot = sim.potential
        dt = sim.dt
        sig = jnp.asarray(sim.sigma, jnp.float32)
        sq = _math.sqrt(dt)
        forceN = jax.vmap(lambda x: -jax.grad(pot)(x))

        def propagate(xk, key):
            def stepf(x, k):
                w = jax.random.normal(k, x.shape, x.dtype)
                return x + forceN(x) * dt + sig * sq * w, None
            x, _ = jax.lax.scan(stepf, xk, jax.random.split(key, nsteps))
            return x

    def step(params, opt_state, x0, key):
        n, d = x0.shape
        kprop, ktrain = jax.random.split(key)
        xr = jnp.repeat(x0, nk, axis=0)                 # (n*nk, d) sharded
        ys = propagate(xr, kprop)
        fys = jnp.asarray(featurizer(ys), jnp.float32).reshape(n, nk, -1)
        fxs = jnp.asarray(featurizer(x0), jnp.float32)

        kchi = jnp.mean(apply(params, fys), axis=1)
        lo, hi = jnp.min(kchi), jnp.max(kchi)
        target = (kchi - lo) / (hi - lo)

        def lossf(p):
            pred = apply(p, fxs)
            return jnp.sum((pred - target) ** 2) / n

        loss, grads = jax.value_and_grad(lossf)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, ys.reshape(n, nk, d)

    return jax.jit(
        step,
        in_shardings=(rep, rep, bspec2, rep),
        out_shardings=(rep, rep, rep, _batch_spec(mesh, 3, axis)))
