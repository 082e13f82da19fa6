"""The ISOKANN learner: ``Iso`` object and training loops.

TPU-native rebuild of the reference core (``src/iso.jl``, 420 LoC).

Key design departure from the reference: where the reference alternates
host-side target computation with Flux minibatch SGD (``src/iso.jl:72-94``),
here the whole Koopman iteration — Kchi forward pass, shift-scale target,
and the epoch of minibatch SGD — is a single jitted computation, and
``run()`` fuses *all* n iterations into one ``lax.scan`` device program when
the target transform is fusable (TransformShiftscale) and no logger needs
per-iteration host access.  Host-side transforms (ISA & friends) fall back
to a per-iteration loop with a jitted training epoch.
"""

from __future__ import annotations

import pickle
import time
from dataclasses import dataclass, field
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import targets as T
from .data import SimulationData, WeightedSamples, values
from .models import MLP
from .optim import NesterovRegularized
from .targets import DomainError, TransformShiftscale, TransformISA, isotarget


def _key(key):
    if key is None:
        return jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
    if isinstance(key, int):
        return jax.random.PRNGKey(key)
    return key


# ==========================================================================
# Fused training program builder
# ==========================================================================

def bucket_capacity(n: int) -> int:
    """Round a dataset size up to the next capacity bucket (two buckets per
    octave: 8, 12, 16, 24, 32, 48, 64, 96, ...).

    Adaptive sampling grows the dataset a few rows per generation; without
    bucketing every growth step recompiles the fused trainer, which dominates
    wall-clock under remote-compile backends.  Padding to a <=50% (average
    ~17%) larger capacity caps recompiles at 2 per dataset doubling."""
    if n <= 8:
        return 8
    p = 1 << (n - 1).bit_length()      # next power of two >= n
    return 3 * p // 4 if 3 * p // 4 >= n else p


def make_fused_run(apply, opt, fused_target, d, minibatch,
                   nx, nk, n, epochs, weighted):
    """Build the jitted whole-run program: n Koopman iterations x epochs of
    minibatch SGD, all in one lax.scan.

    ``nx`` is the (bucketed) array capacity; the true dataset size enters at
    runtime via ``mask`` (1 for real rows, 0 for padding duplicates) and
    ``n_true`` so one compiled program serves every dataset size in the
    bucket.  Padding rows repeat real rows, which keeps the shift-scale
    min/max of the fused target exact."""
    mb = minibatch
    bs = nx if (mb == 0 or nx < mb) else mb
    nb = nx // bs
    # transforms may take (kchi) or (kchi, mask, n_true) — the masked form
    # lets quantile bounds ignore the padding duplicates (trace-time check)
    import inspect
    _ft_masked = len(inspect.signature(fused_target).parameters) >= 3

    def epoch_fn(params, opt_state, xs, target, w, mask, scale, n_true, key):
        # ALL targets optimize the per-observation MEAN, matching the
        # reference (src/iso.jl:185-192 differentiates l / numobs(x)).
        # Round 4 unified d>1 (the raw sum-loss step is ~batchsize x
        # larger, collapsing ISA); round 5 unified d=1 too, removing the
        # last objective-scale divergence from the reference AND the
        # single-chip/sharded inconsistency (parallel/mesh.py always
        # mean-normalized).  See docs/migration.md "loss normalization".
        if nb == 1 and bs == nx:
            # full batch: shuffling is a no-op for the gradient; skipping
            # the permutation also avoids a gather (keeps sharded data
            # local under data parallelism).  The mask zeroes the padding
            # duplicates, so the loss equals the unpadded sum exactly.
            def lossf(p):
                pred = apply(p, xs)
                l = jnp.sum(((pred - target) * w) ** 2 * mask[:, None])
                return l / n_true

            l, g = jax.value_and_grad(lossf)(params)
            updates, opt_state = opt.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, l

        perm = jax.random.permutation(key, nx)[:nb * bs].reshape(nb, bs)

        def batch_step(carry, idx):
            params, opt_state = carry
            x, y, m = xs[idx], target[idx], mask[idx]

            # scale = nx/n_true restores the expected per-batch gradient
            # magnitude to the unpadded sum over bs real rows
            def lossf(p):
                pred = apply(p, x)
                l = jnp.sum(((pred - y) * w) ** 2 * m[:, None]) * scale
                return l / bs

            l, g = jax.value_and_grad(lossf)(params)
            updates, opt_state = opt.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), l

        (params, opt_state), ls = jax.lax.scan(batch_step, (params, opt_state), perm)
        loss_rep = jnp.sum(ls) * bs / nx
        return params, opt_state, loss_rep

    @jax.jit
    def run(params, opt_state, xs, ys, yw, mask, n_true, key):
        scale = nx / n_true

        def iteration(carry, k):
            params, opt_state = carry
            chi_y = apply(params, ys)                       # (nx, nk, d)
            if weighted:
                kchi = jnp.sum(chi_y * yw[..., None], axis=1) / nk
            else:
                kchi = jnp.mean(chi_y, axis=1)
            target = (fused_target(kchi, mask, n_true) if _ft_masked
                      else fused_target(kchi))
            if d > 1:
                # masked std: exact over the real rows only
                mu = jnp.sum(target * mask[:, None], axis=0) / n_true
                var = jnp.sum((target - mu) ** 2 * mask[:, None], axis=0) / n_true
                w = 1.0 / (jnp.sqrt(var) + 1e-12)
            else:
                w = jnp.ones((1,))
            ks = jax.random.split(k, epochs)

            def ep(carry, kk):
                params, opt_state = carry
                params, opt_state, loss = epoch_fn(
                    params, opt_state, xs, target, w, mask, scale, n_true, kk)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(ep, (params, opt_state), ks)
            return (params, opt_state), losses

        keys = jax.random.split(key, n)
        (params, opt_state), losses = jax.lax.scan(iteration, (params, opt_state), keys)
        return params, opt_state, losses.reshape(-1)

    return run


def _pad_rows(a, cap):
    """Pad the leading (batch) axis to ``cap`` by repeating rows from the
    front (duplicates keep batch statistics like min/max exact).

    numpy inputs pad in numpy: the source shape changes every generation,
    and a device concat per new shape is a fresh remote compile."""
    n = a.shape[0]
    if n == cap:
        return a
    if n == 0:
        raise ValueError("cannot pad an empty batch")
    xp = np if isinstance(a, np.ndarray) else jnp
    pad = cap - n
    reps = [a[:min(pad, n)]]
    while sum(r.shape[0] for r in reps) < pad:
        reps.append(a[:min(pad - sum(r.shape[0] for r in reps), n)])
    return xp.concatenate([a] + list(reps), axis=0)


# ==========================================================================
# Loggers (reference src/iso.jl:99-177)
# ==========================================================================

@dataclass
class FunctionLogger:
    """Call ``f(iso)`` every ``logevery`` iterations
    (reference ``src/iso.jl:99-124``)."""

    f: Callable
    name: str = "logger"
    values: list = field(default_factory=list)
    iters: list = field(default_factory=list)
    logevery: int = 1

    def log(self, iso):
        last = self.iters[-1] if self.iters else 0
        if last + self.logevery > len(iso.losses):
            return
        self.values.append(self.f(iso))
        self.iters.append(len(iso.losses))

    def diagnostic(self):
        return (self.name, self.values[-1] if self.values else None)


@dataclass
class ValidationLossLogger:
    """Validation loss vs held-out data; the shift-scale is estimated on the
    full training data (reference ``src/iso.jl:132-177``)."""

    data: Any
    losses: list = field(default_factory=list)
    iters: list = field(default_factory=list)
    logevery: int = 10

    def log(self, iso):
        if len(iso.losses) % self.logevery != 0:
            return
        self.losses.append(validationloss(iso, self.data))
        self.iters.append(len(iso.losses))

    def diagnostic(self):
        return ("validation loss", self.losses[-1] if self.losses else None)


def ValidationLogger(valdata, logevery=1):
    """FunctionLogger wrapper reporting the validation loss
    (reference ``ValidationLogger``, ``src/iso.jl:126-130``)."""
    return FunctionLogger(f=lambda iso: validationloss(iso, valdata),
                          name="validation loss", logevery=logevery)


def validationloss(iso, valdata):
    """Reference ``src/iso.jl:160-170``.

    Every evaluation routes through the capacity buckets so validation
    sets of any size reuse the same compiled forward pass."""
    from .data import model_bucketed

    vx, vy = T.features(valdata), T.propfeatures(valdata)
    c = model_bucketed(iso.chifun, np.asarray(vx)).ravel()
    k1 = np.asarray(T.expectation_bucketed(iso.chifun, vy)).ravel()
    k2 = np.asarray(T.expectation_bucketed(
        iso.chifun, T.propfeatures(iso.data))).ravel()
    ks = np.concatenate([k1, k2])
    lo, hi = ks.min(), ks.max()
    skc = ((ks - lo) / (hi - lo))[:len(c)]
    return float(np.mean((c - skc) ** 2))


# ==========================================================================
# Iso
# ==========================================================================

class Iso:
    """Model + optimizer + data + target transform + training loop
    (reference ``Iso``, ``src/iso.jl:3-57``).

    Construct from a ``SimulationData`` or directly from a simulation::

        iso = Iso(data)                     # or
        iso = Iso(sim, nx=100, nk=5)
        iso.run(100)
    """

    def __init__(self, data=None, sim=None, nx=100, nk=2, model=None, opt=None,
                 target=None, minibatch=100, loggers=None, validation=None,
                 nout=1, key=None, transform=None, shard=True):
        key = _key(key)
        kd, km, self.key = jax.random.split(key, 3)
        if data is None:
            if sim is None:
                raise ValueError("Iso needs data or sim")
            data = SimulationData.from_sim(sim, nx=nx, nk=nk, key=kd)
        self.data = data

        if model is None:
            sim_ = getattr(data, "sim", None)
            if sim_ is not None and hasattr(sim_, "defaultmodel"):
                model = sim_.defaultmodel(n=data.featuredim, nout=nout, key=km)
            else:
                from .models import autonet
                model = autonet(data.featuredim, nout=nout, key=km)
        self.model = model

        self.opt = opt if opt is not None else NesterovRegularized()
        self.opt_state = self.opt.init(self.model.params)

        if target is None and transform is not None:
            target = transform
        if target is None:
            target = TransformShiftscale() if model.outputdim == 1 else TransformISA()
        self.target = target

        self.minibatch = minibatch
        # automatic data parallelism over all visible devices (fused path)
        self.shard = shard
        self.losses: List[float] = []
        self.loggers = list(loggers) if loggers else []
        if validation is not None:
            self.loggers.append(ValidationLossLogger(data=validation))

        self._jit_cache = {}

    # ---- functional views ------------------------------------------------

    @property
    def params(self):
        return self.model.params

    @params.setter
    def params(self, p):
        self.model.params = p

    @property
    def chifun(self):
        """Pure chi closure over the current params.

        The forward pass is jitted with the params as a *traced* argument
        (one compile per input shape, reused across training updates) —
        unjitted op-by-op dispatch is seconds-slow on remote-device
        backends."""
        jitted = self._jit_cache.get("chifun_apply")
        if jitted is None:
            jitted = jax.jit(self.model.apply)
            self._jit_cache["chifun_apply"] = jitted
        params = self.model.params
        return lambda x: jitted(params, x)

    # ---- evaluation accessors (reference src/iso.jl:203-226) -------------

    def chis(self, data=None):
        """chi at the starting points, (n, d) (bucketed evaluation: one
        compiled forward pass per dataset size class)."""
        from .data import model_bucketed
        data = self.data if data is None else data
        return model_bucketed(self.chifun, T.features(data))

    def chicoords(self, xs):
        """chi at raw coordinates (featurize first)
        (reference ``src/iso.jl:211``)."""
        xs = jnp.asarray(xs)
        return self.chifun(self.data.features_of(xs))

    def koopman(self):
        return T.expectation_bucketed(self.chifun, T.propfeatures(self.data))

    def chi_kchi(self):
        return T.chi_kchi(self.chifun, self.data)

    @property
    def coords(self):
        return self.data.coords

    @property
    def features(self):
        return self.data.features

    @property
    def propcoords(self):
        return self.data.propcoords

    @property
    def propfeatures(self):
        return self.data.propfeatures

    # ---- training ---------------------------------------------------------

    def run(self, n=1, epochs=1, showprogress=False):
        """n outer Koopman iterations x inner SGD epochs
        (reference ``run!``, ``src/iso.jl:72-94``)."""
        t0 = time.time()
        fused = getattr(self.target, "fused", False)
        if fused:
            chunk = n if not self.loggers else min(
                [getattr(l, "logevery", 1) for l in self.loggers] + [n])
            done = 0
            while done < n:
                c = min(chunk, n - done)
                self._run_fused(c, epochs)
                done += c
                for logger in self.loggers:
                    logger.log(self)
                if showprogress:
                    self._progress(done, n, t0)
        else:
            for i in range(n):
                target = isotarget(self)
                self._train_iteration(target, epochs)
                for logger in self.loggers:
                    logger.log(self)
                if showprogress:
                    self._progress(i + 1, n, t0)
        return self

    def _progress(self, done, n, t0):
        dt = time.time() - t0
        print(f"\r[run] {done}/{n} loss={self.losses[-1]:.4g} "
              f"n_data={len(self.data)} {done / max(dt, 1e-9):.1f} it/s",
              end="\n" if done == n else "", flush=True)

    # -- fused path: everything in one lax.scan ----------------------------

    def _fused_run_fn(self, nx, nk, nfeat, n, epochs, weighted, cache_key):
        if cache_key in self._jit_cache:
            return self._jit_cache[cache_key]
        run = make_fused_run(self.model.apply, self.opt,
                             self.target.fused_target, self.model.outputdim,
                             self.minibatch, nx, nk, n, epochs, weighted)
        self._jit_cache[cache_key] = run
        return run

    def precompile_fused(self, nx, nk, n, epochs=1, weighted=False):
        """AOT-compile the fused training program for the given data shape
        (e.g. on a thread, overlapping with data generation — remote-compile
        backends don't serialize concurrent compilations).  ``nx`` is rounded
        up to its capacity bucket, matching what ``_run_fused`` will request."""
        nfeat = self.model.inputdim
        cap = bucket_capacity(nx)
        cache_key = ("fused", cap, nk, nfeat, n, epochs, weighted)
        run = make_fused_run(self.model.apply, self.opt,
                             self.target.fused_target, self.model.outputdim,
                             self.minibatch, cap, nk, n, epochs, weighted)
        sds = lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))
        args = (jax.tree_util.tree_map(sds, self.model.params),
                jax.tree_util.tree_map(sds, self.opt_state),
                jax.ShapeDtypeStruct((cap, nfeat), jnp.float32),
                jax.ShapeDtypeStruct((cap, nk, nfeat), jnp.float32),
                jax.ShapeDtypeStruct((cap, nk), jnp.float32),
                jax.ShapeDtypeStruct((cap,), jnp.float32),
                jax.ShapeDtypeStruct((), jnp.float32),
                jax.ShapeDtypeStruct((2,), jnp.uint32))
        self._jit_cache[cache_key] = run.lower(*args).compile()
        return self._jit_cache[cache_key]

    def _run_fused(self, n, epochs):
        ysf = self.data.propfeatures
        weighted = isinstance(ysf, WeightedSamples)
        ys, yw = ((ysf.values, ysf.weights) if weighted
                  else (ysf, np.zeros(values(ysf).shape[:2], np.float32)))
        xs = self.data.features
        nx, nk = ys.shape[0], ys.shape[1]
        # pad to the capacity bucket with repeated rows: one compiled
        # program per bucket instead of one per dataset size (ROADMAP 3b);
        # padding/mask built on host so no per-generation device shapes
        cap = bucket_capacity(nx)
        xs, ys, yw = _pad_rows(xs, cap), _pad_rows(ys, cap), _pad_rows(yw, cap)
        mask = np.concatenate([np.ones(nx, np.float32),
                               np.zeros(cap - nx, np.float32)])
        n_true = jnp.float32(nx)
        cache_key = ("fused", cap, nk, xs.shape[-1], n, epochs, weighted)
        run = self._fused_run_fn(cap, nk, xs.shape[-1], n, epochs, weighted, cache_key)
        self.key, sub = jax.random.split(self.key)
        params, opt_state = self.model.params, self.opt_state
        from .parallel import device_count as _mesh_device_count
        if self.shard and _mesh_device_count() > 1 \
                and cap % _mesh_device_count() == 0:
            # automatic data parallelism: batch dims sharded over all
            # devices, params replicated; XLA GSPMD inserts the gradient
            # psum and the global min/max shift-scale reductions
            from .parallel import make_mesh, shard_batch, replicate
            mesh = make_mesh()
            xs = shard_batch(mesh, xs)
            ys = shard_batch(mesh, ys)
            yw = shard_batch(mesh, yw)
            mask = shard_batch(mesh, mask)
            params = replicate(mesh, params)
            opt_state = replicate(mesh, opt_state)
        params, opt_state, losses = run(params, opt_state, xs, ys, yw, mask, n_true, sub)
        losses = np.asarray(losses)
        if not np.all(np.isfinite(losses)):
            raise DomainError(
                "The ISOKANN model collapsed under training. "
                "Try reducing the learning rate or increasing regularization")
        self.model.params = params
        self.opt_state = opt_state
        self.losses.extend(losses.tolist())

    # -- host-target path ----------------------------------------------------

    def _epoch_fn(self, nx, cache_key):
        """``nx`` is the bucketed capacity; mask/n_true arrive at runtime
        (same one-program-per-bucket scheme as the fused path)."""
        if cache_key in self._jit_cache:
            return self._jit_cache[cache_key]
        apply = self.model.apply
        opt = self.opt
        mb = self.minibatch
        bs = nx if (mb == 0 or nx < mb) else mb
        nb = nx // bs

        @jax.jit
        def epoch(params, opt_state, xs, target, w, mask, n_true, key):
            scale = nx / n_true
            # all targets optimize the per-observation mean (matches the
            # reference src/iso.jl:185-192; see make_fused_run)
            if nb == 1 and bs == nx:
                def lossf(p):
                    pred = apply(p, xs)
                    l = jnp.sum(((pred - target) * w) ** 2 * mask[:, None])
                    return l / n_true

                l, g = jax.value_and_grad(lossf)(params)
                updates, opt_state = opt.update(g, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, l

            perm = jax.random.permutation(key, nx)[:nb * bs].reshape(nb, bs)

            def batch_step(carry, idx):
                params, opt_state = carry
                x, y, m = xs[idx], target[idx], mask[idx]

                def lossf(p):
                    pred = apply(p, x)
                    l = jnp.sum(((pred - y) * w) ** 2 * m[:, None]) * scale
                    return l / bs

                l, g = jax.value_and_grad(lossf)(params)
                updates, opt_state = opt.update(g, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), l

            (params, opt_state), ls = jax.lax.scan(batch_step, (params, opt_state), perm)
            loss_rep = jnp.sum(ls) * bs / nx
            return params, opt_state, loss_rep

        self._jit_cache[cache_key] = epoch
        return epoch

    def _train_iteration(self, target, epochs):
        """Train ``epochs`` epochs against a fixed target
        (reference ``train_batch!``, ``src/iso.jl:179-194``)."""
        xs = self.data.features
        target = np.asarray(target, np.float32)
        nx = xs.shape[0]
        d = target.shape[-1]
        if d > 1:
            w = 1.0 / (np.std(target, axis=0) + 1e-12)
        else:
            w = np.ones((1,), np.float32)
        cap = bucket_capacity(nx)
        xs_p, target_p = _pad_rows(np.asarray(xs), cap), _pad_rows(target, cap)
        mask = np.concatenate([np.ones(nx, np.float32),
                               np.zeros(cap - nx, np.float32)])
        epoch = self._epoch_fn(cap, ("epoch", cap, xs.shape[-1], d))
        params, opt_state = self.model.params, self.opt_state
        for _ in range(epochs):
            self.key, sub = jax.random.split(self.key)
            params, opt_state, loss = epoch(params, opt_state, xs_p, target_p,
                                            w, mask, jnp.float32(nx), sub)
            loss = float(loss)
            if not np.isfinite(loss):
                raise DomainError(
                    "The ISOKANN model collapsed under training. "
                    "Try reducing the learning rate or increasing regularization")
            self.losses.append(loss)
        self.model.params = params
        self.opt_state = opt_state

    # ---- adaptive sampling (reference src/iso.jl:238-307) ----------------

    def addcoords(self, coords_or_n):
        """Extend data with new start points, or with an n-step lagged
        trajectory from the last frame (reference ``src/iso.jl:238-249``)."""
        self.key, sub = jax.random.split(self.key)
        if isinstance(coords_or_n, int):
            traj = self.data.sim.laggedtrajectory(
                coords_or_n, x0=self.data.coords[-1], key=sub)
            self.key, sub = jax.random.split(self.key)
            self.data = self.data.addcoords(traj, key=sub)
        else:
            self.data = self.data.addcoords(jnp.asarray(coords_or_n), key=sub)
        return self

    def resample_kde(self, ny, **kwargs):
        self.key, sub = jax.random.split(self.key)
        self.data = self.data.resample_kde(self.chifun, ny, key=sub, **kwargs)
        return self

    def resample_strat(self, ny, **kwargs):
        self.key, sub = jax.random.split(self.key)
        self.data = self.data.resample_strat(self.chifun, ny, key=sub, **kwargs)
        return self

    def run_kde(self, generations=1, iter=100, cutoff=np.inf, kde=1,
                unique=True, showprogress=False):
        """Adaptive training: generations x (kde resample -> cutoff -> train)
        with per-generation timing/rate diagnostics
        (reference ``run_kde!``, ``src/iso.jl:278-307``)."""
        t_kde = t_train = 0.0
        for g in range(generations):
            t0 = time.time()
            self.resample_kde(kde, unique=unique)
            t_kde += time.time() - t0
            if len(self.data) > cutoff:
                self.data = self.data[len(self.data) - int(cutoff):]
            t0 = time.time()
            self.run(iter)
            t_train += time.time() - t0
            if showprogress:
                try:
                    # progress display only: suppress the per-generation
                    # unresolved-lag warning (run lag_sweep once instead)
                    import warnings as _w
                    with _w.catch_warnings():
                        _w.filterwarnings(
                            "ignore", message="fitted Koopman matrix.*")
                        macrorates = np.round(self.exit_rates(), 4).tolist()
                except Exception:
                    macrorates = None
                print(f"[run_kde] gen {g + 1}/{generations} "
                      f"loss={self.losses[-1]:.4g} n={len(self.data)} "
                      f"t_train={t_train:.1f}s t_kde={t_kde:.1f}s "
                      f"simtime={self.simulationtime():.3g} "
                      f"macrorates={macrorates}", flush=True)
        return self

    # ---- rates & diagnostics (reference src/iso.jl:322-373) ---------------

    def rates(self):
        """Coarse-grained rate matrix Q with Kchi = exp(tau*Q) chi
        (reference ``src/iso.jl:339-351``)."""
        x = np.asarray(self.chis(), dtype=np.float64)
        y = np.asarray(self.koopman(), dtype=np.float64)
        return rates(x, y) / self.data.sim.lagtime

    def exit_rates(self):
        return -np.diag(self.rates())

    def chi_exit_rate(self):
        """Exit rate per Ernst/Weber (2017) chap 3.3
        (reference ``src/iso.jl:322-330``)."""
        x, Kx = self.chi_kchi()
        return chi_exit_rate(np.asarray(x), np.asarray(Kx), self.data.sim.lagtime)

    def lag_sweep(self, **kwargs):
        """Sweep candidate lags and report fitted Koopman spectra /
        implied timescales; see ``workflows.lag_sweep``.  Use before
        trusting ``rates()`` on slow systems."""
        from .workflows import lag_sweep
        return lag_sweep(self, **kwargs)

    def cktest(self, **kwargs):
        """Chapman-Kolmogorov validation ``K(tau)^k == K(k*tau)`` of the
        chi-coarse Koopman model; see ``workflows.cktest``.  Passing at
        the production lag means the macro-rates are lag-consistent."""
        from .workflows import cktest
        return cktest(self, **kwargs)

    def koopman_variance(self):
        """Variance of chi over the Koopman samples (reference ``src/iso.jl:355-359``)."""
        from .data import model_bucketed
        ys = self.data.propfeatures
        vals = np.asarray(ys.values if isinstance(ys, WeightedSamples) else ys)
        n, k = vals.shape[:2]
        chi = model_bucketed(self.chifun, vals.reshape(n * k, -1)).reshape(n, k, -1)
        d = chi.shape[-1]
        return float(np.sum((chi - chi.mean(axis=1, keepdims=True)) ** 2) / d / n)

    def simulationtime(self):
        """Total simulated physical time in the dataset
        (reference ``src/iso.jl:366-373``)."""
        n, k = values(self.data.propfeatures).shape[:2]
        return n * k * self.data.sim.lagtime

    # ---- persistence (reference src/iso.jl:405-420) -----------------------

    def save(self, path):
        save(path, self)

    def __repr__(self):
        s = [f"Iso(model={self.model.sizes}, target={type(self.target).__name__},"
             f" minibatch={self.minibatch}, data={self.data!r}"]
        if self.losses:
            s.append(f" loss={self.losses[-1]:.3g} (n={len(self.losses)})")
        return "".join(s) + ")"


# ==========================================================================
# Free functions mirroring the reference API
# ==========================================================================

def run(iso: Iso, n=1, epochs=1, **kw):
    return iso.run(n, epochs, **kw)


def run_kde(iso: Iso, **kw):
    return iso.run_kde(**kw)


def chis(iso: Iso, data=None):
    return iso.chis(data)


def chicoords(iso: Iso, xs):
    return iso.chicoords(xs)


def koopman(iso: Iso):
    return iso.koopman()


def rates(x: np.ndarray, y: np.ndarray):
    """K from least squares chi @ K = kchi, then matrix log
    (reference ``src/iso.jl:344-351``; x, y are (n, d) row-major).

    For processes much slower than the lag, finite-sample noise can push
    the fitted K spectrum to >= 1, which flips the sign structure of
    log(K).  Eigenvalues are clamped into (0, 1) with a warning — the
    resulting rates are then upper bounds set by the sampling resolution,
    not converged estimates (increase the lag or the data)."""
    import scipy.linalg
    if x.shape[1] == 1:
        x = np.hstack([x, 1.0 - x])
        y = np.hstack([y, 1.0 - y])
    K, *_ = np.linalg.lstsq(x, y, rcond=None)
    K = K.T
    w, V = np.linalg.eig(K)
    # the dominant eigenvalue ~1 is structural (the constant mode is
    # reproduced exactly by the augmented least squares): map it just
    # inside the unit interval so logm gives it rate ~0.  Only the
    # NON-dominant spectrum escaping (0, 1) means the slow process is
    # unresolved at this lag (use Iso.lag_sweep to pick a lag).
    order = np.argsort(np.real(w))[::-1]
    rest = w[order[1:]]
    dom_ok = np.real(w[order[0]]) <= 1.0 + 1e-6
    rest_ok = np.all(np.abs(rest) < 1.0) and np.all(np.real(rest) > 0.0)
    if not (dom_ok and rest_ok):
        import warnings
        warnings.warn(
            "fitted Koopman matrix has eigenvalues outside (0, 1) "
            f"({np.real(w).round(5).tolist()}): the slow process is not "
            "resolved at this lag; rates are clamped upper bounds "
            "(sweep lags with Iso.lag_sweep)")
    if rest_ok and np.real(w[order[0]]) >= 1.0:
        # common resolved case: only the structural constant mode sits at
        # or just above 1.  Clamp IT alone — the resolved (possibly
        # complex) non-dominant spectrum passes through untouched, so the
        # returned rate matrix is not perturbed beyond the one mode.
        w = w.copy()
        w[order[0]] = 1.0 - 1e-9
        K = np.real(V @ np.diag(w) @ np.linalg.inv(V))
    elif not rest_ok or np.any(np.real(w) >= 1.0):
        # genuinely unresolved: clamp the whole spectrum (upper-bound
        # rates, warned above)
        w = np.clip(np.real(w), 1e-12, 1.0 - 1e-9) + 0j
        K = np.real(V @ np.diag(w) @ np.linalg.inv(V))
    return np.real(scipy.linalg.logm(K))


def chi_exit_rate(x, Kx, tau):
    """Affine fit Kx ~ g1*x + g2 (linear least squares; the reference uses
    LsqFit for the same affine model, ``src/iso.jl:322-330``)."""
    x = np.asarray(x, dtype=np.float64).ravel()
    Kx = np.asarray(Kx, dtype=np.float64).ravel()
    A = np.stack([x, np.ones_like(x)], axis=1)
    (g1, g2), *_ = np.linalg.lstsq(A, Kx, rcond=None)
    alpha = -np.log(g1) / tau
    beta = alpha * g2 / (g1 - 1.0)
    return alpha + beta


def simulationtime(iso: Iso):
    return iso.simulationtime()


# ==========================================================================
# Save / load (reference src/iso.jl:405-420: JLD2 snapshot -> here pickle)
# ==========================================================================

def _to_numpy(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)


def save(path: str, iso: Iso):
    """Snapshot (model+opt+data+losses) to disk; device arrays go to host
    (mirrors reference ``src/iso.jl:405-411``)."""
    import cloudpickle
    state = dict(
        opt=iso.opt,
        model_spec=dict(sizes=iso.model.sizes, activation=iso.model.activation,
                        lastactivation=iso.model.lastactivation,
                        layernorm=iso.model.layernorm),
        params=_to_numpy(iso.model.params),
        opt_state=_to_numpy(iso.opt_state),
        losses=iso.losses,
        minibatch=iso.minibatch,
        target=iso.target,
        key=np.asarray(iso.key),
        data=dict(
            features=_to_numpy(iso.data.features),
            propfeatures=_to_numpy(iso.data.propfeatures),
            coords=_to_numpy(iso.data.coords),
            propcoords=_to_numpy(iso.data.propcoords),
            sim=iso.data.sim,
            featurizer=iso.data.featurizer,
        ),
    )
    with open(path, "wb") as f:
        cloudpickle.dump(state, f)


def load(path: str, sim=None):
    """Load an Iso snapshot; optionally re-attach a freshly constructed
    simulation (mirrors reference ``src/iso.jl:413-420``)."""
    with open(path, "rb") as f:
        state = pickle.load(f)
    model = MLP(**state["model_spec"])
    model.params = jax.tree_util.tree_map(jnp.asarray, state["params"])
    d = state["data"]
    data = SimulationData(
        sim if sim is not None else d["sim"],
        jnp.asarray(d["features"]),
        (d["propfeatures"] if isinstance(d["propfeatures"], WeightedSamples)
         else jnp.asarray(d["propfeatures"])),
        jnp.asarray(d["coords"]),
        (d["propcoords"] if isinstance(d["propcoords"], WeightedSamples)
         else jnp.asarray(d["propcoords"])),
        d["featurizer"])
    iso = Iso(data=data, model=model, target=state["target"], opt=state["opt"],
              minibatch=state["minibatch"], key=jnp.asarray(state["key"]))
    iso.losses = list(state["losses"])
    iso.opt_state = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
        state["opt_state"])
    return iso
