"""Deep-ensemble chi uncertainty (beyond the reference).

The reference trains a single chi network and its adaptive sampling is
driven by chi *density* (KDE) or stratification; neither sees where the
model itself is UNSURE.  This module trains E independently-initialized
chi replicas simultaneously and uses their disagreement as a pointwise
epistemic-uncertainty estimate, enabling uncertainty-targeted adaptive
sampling (``resample_uncertainty``).

TPU-first design: the whole ensemble trains in ONE compiled program —
``jax.vmap`` over the existing fused whole-run ``lax.scan``
(``iso.make_fused_run``) adds a leading member axis to every parameter
tensor, so each MLP layer becomes one batched matmul on the MXU instead
of E small ones, and the per-generation dispatch cost stays that of a
single model (critical under remote-dispatch backends: tens of ms per
call).  Evaluation is likewise a single vmapped forward pass.

chi is only defined up to the 1-chi relabeling, so raw member spread
overestimates disagreement; ``chi_members(aligned=True)`` flips members
anticorrelated with the first before any statistic (1-output models).

Reference context: adaptive sampling family ``src/iso.jl:229-276`` —
this estimator has no counterpart there.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .data import WeightedSamples, values
from .iso import bucket_capacity, make_fused_run, _pad_rows, _key
from .models import init_mlp_params
from .targets import DomainError


class ChiEnsemble:
    """E chi replicas sharing an ``Iso``'s data, architecture, optimizer
    and target, trained simultaneously via one vmapped fused program.

    >>> ens = ChiEnsemble(iso, n_members=8, key=0)
    >>> ens.run(100)                   # all members, one device program
    >>> ens.chi_std(xs).max()          # where the ensemble disagrees
    """

    def __init__(self, iso, n_members=8, key=None):
        if not getattr(iso.target, "fused", False):
            raise ValueError(
                "ChiEnsemble requires a fusable target transform "
                "(TransformShiftscale); host-target transforms train "
                "member-by-member — loop over Iso instances instead.")
        self.iso = iso
        self.n_members = int(n_members)
        key = _key(key)
        keys = jax.random.split(key, self.n_members)
        model = iso.model
        self.params = jax.vmap(
            lambda k: init_mlp_params(k, model.sizes, model.layernorm))(keys)
        self.opt_state = jax.vmap(iso.opt.init)(self.params)
        self.key = jax.random.fold_in(key, 1)
        self.losses: list = []          # flat list of (E,) arrays
        self._jit_cache: dict = {}

    # ---- training --------------------------------------------------------

    def run(self, n=1, epochs=1):
        """n Koopman iterations x epochs for EVERY member — one jitted
        vmapped lax.scan; members differ only in init and shuffle keys."""
        iso = self.iso
        ysf = iso.data.propfeatures
        weighted = isinstance(ysf, WeightedSamples)
        ys, yw = ((ysf.values, ysf.weights) if weighted
                  else (ysf, np.zeros(values(ysf).shape[:2], np.float32)))
        xs = iso.data.features
        nx, nk = ys.shape[0], ys.shape[1]
        cap = bucket_capacity(nx)
        xs, ys, yw = _pad_rows(xs, cap), _pad_rows(ys, cap), _pad_rows(yw, cap)
        mask = np.concatenate([np.ones(nx, np.float32),
                               np.zeros(cap - nx, np.float32)])
        ck = ("ens_fused", self.n_members, cap, nk, xs.shape[-1], n, epochs,
              weighted)
        run = self._jit_cache.get(ck)
        if run is None:
            base = make_fused_run(
                iso.model.apply, iso.opt, iso.target.fused_target,
                iso.model.outputdim, iso.minibatch, cap, nk, n, epochs,
                weighted)
            run = jax.jit(jax.vmap(
                base, in_axes=(0, 0, None, None, None, None, None, 0)))
            self._jit_cache[ck] = run
        self.key, sub = jax.random.split(self.key)
        keys = jax.random.split(sub, self.n_members)
        params, opt_state, losses = run(
            self.params, self.opt_state, jnp.asarray(xs), jnp.asarray(ys),
            jnp.asarray(yw), jnp.asarray(mask), jnp.float32(nx), keys)
        losses = np.asarray(losses)                     # (E, n)
        if not np.any(np.all(np.isfinite(losses), axis=1)):
            raise DomainError(
                "every ensemble member collapsed under training — reduce "
                "the learning rate or increase regularization")
        self.params = params
        self.opt_state = opt_state
        self.losses.extend(np.swapaxes(losses, 0, 1).tolist())
        return self

    @property
    def finite_members(self):
        """Boolean (E,) mask of members whose loss history stayed finite."""
        if not self.losses:
            return np.ones(self.n_members, bool)
        return np.all(np.isfinite(np.asarray(self.losses)), axis=0)

    # ---- evaluation ------------------------------------------------------

    def _apply_members(self, feats):
        fn = self._jit_cache.get("apply_members")
        if fn is None:
            fn = jax.jit(jax.vmap(self.iso.model.apply, in_axes=(0, None)))
            self._jit_cache["apply_members"] = fn
        return fn(self.params, jnp.asarray(feats))      # (E, n, d)

    def chi_members(self, xs=None, aligned=True):
        """Per-member chi at raw coordinates (default: the dataset's
        start points), (E, n, d).  ``aligned`` resolves the 1-chi
        relabeling freedom by flipping members anticorrelated with the
        first finite member (1-output models only); collapsed members
        are dropped."""
        iso = self.iso
        feats = (iso.data.features if xs is None
                 else iso.data.features_of(jnp.asarray(xs)))
        chi = np.asarray(self._apply_members(feats))
        chi = chi[self.finite_members]
        if aligned and chi.shape[-1] == 1 and len(chi) > 1:
            c0 = chi[0, :, 0]
            for e in range(1, len(chi)):
                if np.corrcoef(c0, chi[e, :, 0])[0, 1] < 0:
                    chi[e] = 1.0 - chi[e]
        return chi

    def chi_mean(self, xs=None):
        return self.chi_members(xs).mean(axis=0)

    def chi_std(self, xs=None):
        """Pointwise epistemic uncertainty: member std of aligned chi,
        (n, d)."""
        return self.chi_members(xs).std(axis=0)


def resample_uncertainty(iso, ensemble, ny=1, explore=0.0, key=None):
    """Uncertainty-targeted adaptive sampling: add ``ny`` new burst
    start points where the chi ensemble disagrees most.

    Candidates are the pooled dataset start points; the top-``ny`` by
    ``ensemble.chi_std`` are re-seeded (their NEW Koopman bursts shrink
    the Kchi variance exactly where the model family is unsure — the
    epistemic complement of the reference's density-driven
    ``resample_kde``).  ``explore`` in [0, 1) replaces that fraction of
    picks with uniform draws to avoid mode-locking.  Returns ``iso``.
    """
    key = _key(key)
    std = np.asarray(ensemble.chi_std()).max(axis=-1)   # (n,)
    ny = min(int(ny), len(std))
    n_explore = int(round(explore * ny))
    n_top = ny - n_explore
    order = np.argsort(-std)
    picks = list(order[:n_top])
    if n_explore:
        pool = np.setdiff1d(np.arange(len(std)), picks)
        idx = jax.random.choice(key, len(pool), (n_explore,), replace=False)
        picks.extend(pool[np.asarray(idx)])
    xs_new = np.asarray(iso.data.coords)[np.asarray(picks, np.int64)]
    iso.addcoords(xs_new)
    return iso
