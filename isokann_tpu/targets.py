"""ISOKANN target transforms — the algorithmic heart.

TPU-native rebuild of ``src/isotarget.jl`` (reference, 824 LoC).  The hot-path
transform (``TransformShiftscale``) is pure jnp and jit/scan-fusable into the
training episode.  The multi-dimensional transforms (ISA, pseudo-inverse,
Schur/eigen families) operate on tiny (d x d, d <= ~5) matrices; following the
survey's guidance they run on host in float64 numpy/scipy, which mirrors the
reference's own device->host roundtrip (``src/isotarget.jl:101-104``).

Array convention (row-major): chi/Kchi matrices are ``(n, d)`` — batch
leading, chi-dimension last.  The reference's ``(d, n)`` layout is the
transpose; host transforms below transpose at the boundary and keep the
reference's matrix algebra verbatim in ``(d, n)`` space.

A "model" argument below is any callable ``x -> chi`` mapping features
``(..., f)`` to chi values ``(..., d)`` (e.g. a closure over fixed params).
"""

from __future__ import annotations

import itertools
import logging
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

_log = logging.getLogger(__name__)

# times a transform missed the precomputed stacked chi evaluation in
# ``isotarget`` and fell back to a per-call bucketed evaluation
stacked_fallback_count = 0


class DomainError(ValueError):
    """Raised when a target transform degenerates (constant chi, singular
    subspace, model collapse) — mirrors the Julia DomainError contract used by
    the reference (``src/isotarget.jl:39,94-97,159-162``, ``src/iso.jl:186-189``)."""


# ==========================================================================
# Core expectation / koopman
# ==========================================================================

def expectation(model, ys):
    """Monte-Carlo Koopman expectation: mean of ``model`` over the k-axis.

    ``ys``: features of propagated samples, shape (n, k, f) (or a
    WeightedSamples for Girsanov reweighting). Returns (n, d).
    Host (numpy) model outputs stay on host — the reduction must not
    become a per-shape device op in adaptive loops.
    Reference: ``src/isotarget.jl:18``, weighted variant ``src/data.jl:215``.
    """
    from .data import WeightedSamples

    if isinstance(ys, WeightedSamples):
        vals = model(ys.values)
        xp = np if isinstance(vals, np.ndarray) else jnp
        w = xp.asarray(ys.weights)
        return xp.sum(vals * w[..., None], axis=-2) / vals.shape[-2]
    vals = model(ys)
    xp = np if isinstance(vals, np.ndarray) else jnp
    return xp.mean(vals, axis=-2)


def expectation_bucketed(model, ys):
    """``expectation`` evaluated through capacity-bucketed model calls
    (host in/out) — adaptive loops call this on ever-growing sample pools,
    and bucketing keeps it at one compiled forward pass per size class."""
    from .data import WeightedSamples, model_bucketed

    vals = np.asarray(ys.values if isinstance(ys, WeightedSamples) else ys)
    n, k = vals.shape[:2]
    chi = model_bucketed(model, vals.reshape(n * k, -1)).reshape(n, k, -1)
    if isinstance(ys, WeightedSamples):
        return np.sum(chi * np.asarray(ys.weights)[..., None], axis=1) / k
    return chi.mean(axis=1)


def koopman(iso, data=None):
    data = iso.data if data is None else data
    return expectation_bucketed(iso.chifun, propfeatures(data))


def bucketed_model(model):
    """Wrap a chi model so every evaluation pads its batch to a capacity
    bucket (one compiled forward pass per size class; adaptive datasets
    grow every generation).  Handles arbitrary leading batch dims;
    returns numpy."""
    from .data import model_bucketed

    def f(x):
        x = np.asarray(x)
        lead = x.shape[:-1]
        out = model_bucketed(model, x.reshape(-1, x.shape[-1]))
        return out.reshape(lead + (out.shape[-1],))

    return f


def chi_kchi(model, data):
    model = bucketed_model(model)
    return model(features(data)), expectation(model, propfeatures(data))


def features(data):
    if isinstance(data, tuple):
        return data[0]
    return data.features


def propfeatures(data):
    if isinstance(data, tuple):
        return data[1]
    return data.propfeatures


# ==========================================================================
# 1D shift-scale (the production default for 1-D chi)
# ==========================================================================

def shiftscale(ks, quantile=0.0):
    """Empirical shift-scale: (ks - min) / (max - min).

    Raises DomainError on constant chi (reference ``src/isotarget.jl:36-42``).

    ``quantile`` > 0 selects the robust variant: bounds are the
    (q, 1-q) order statistics and the normalized target is clipped to
    [0, 1].  The min/max normalization (the reference's, and the
    default) lets a SINGLE rarely-visited state with near-unit
    self-transition own one end of the scale, collapsing chi to a
    rare-event indicator on equilibrium trajectory data (observed on
    the deca-alanine 632 ns ensemble: chi = 0.013 on 31/32 walkers
    with spikes on one rare visit).  Quantile bounds make the power
    iteration normalize on the bulk modes instead; rare extremes
    saturate at 0/1."""
    ks = jnp.asarray(ks)
    if ks.ndim > 1 and ks.shape[-1] != 1:
        raise DomainError("TransformShiftscale only works with one dimensional chi functions")
    if quantile:
        out = shiftscale_jit(ks, quantile=quantile)
        if not bool(jnp.isfinite(out).all()):
            raise DomainError("Could not compute the shift-scale. chi function is constant")
        return out
    lo, hi = jnp.min(ks), jnp.max(ks)
    if not bool(hi > lo):
        raise DomainError("Could not compute the shift-scale. chi function is constant")
    return (ks - lo) / (hi - lo)


def shiftscale_jit(ks, mask=None, n_true=None, quantile=0.0):
    """Jit-safe variant (no host check); degenerate case yields NaN/Inf which
    the training loop's finite-loss guard catches.

    With ``quantile`` > 0 the bounds are masked order statistics: the
    capacity-bucketed fused path pads the dataset with REPEATED rows,
    which keeps min/max exact but would bias quantiles, so invalid rows
    sort to +inf and the order-statistic indices use the runtime
    ``n_true``."""
    if quantile:
        v = ks.ravel()
        if mask is None:
            nt = jnp.float32(v.shape[0])
            srt = jnp.sort(v)
        else:
            nt = n_true
            srt = jnp.sort(jnp.where(mask.ravel() > 0, v, jnp.inf))
        i_lo = jnp.clip(jnp.floor(quantile * (nt - 1.0)),
                        0, v.shape[0] - 1).astype(jnp.int32)
        i_hi = jnp.clip(jnp.ceil((1.0 - quantile) * (nt - 1.0)),
                        0, v.shape[0] - 1).astype(jnp.int32)
        lo, hi = srt[i_lo], srt[i_hi]
        return jnp.clip((ks - lo) / (hi - lo), 0.0, 1.0)
    lo, hi = jnp.min(ks), jnp.max(ks)
    return (ks - lo) / (hi - lo)


@dataclass
class TransformShiftscale:
    """Classical 1-D shift-scale power iteration (ISOKANN 1).

    This transform is pure jnp (``fused=True``): the training loop fuses it
    into the jitted episode scan (see ``iso.py``).

    ``quantile`` > 0 uses robust (q, 1-q) order-statistic bounds with
    clipping instead of min/max — see :func:`shiftscale` for when the
    classical normalization collapses chi onto a rare-event indicator
    (heavy-tailed Kchi on equilibrium trajectory data)."""

    quantile: float = 0.0
    fused = True

    def __call__(self, model, xs, ys):
        return shiftscale(expectation(model, ys), self.quantile)

    def fused_target(self, kchi, mask=None, n_true=None):
        return shiftscale_jit(kchi, mask, n_true, self.quantile)


# ==========================================================================
# Multidimensional ISA
# ==========================================================================

def indexmap(X: np.ndarray) -> np.ndarray:
    """Inner-simplex vertex search (PCCA+ ``indexmap``): greedily pick the d
    rows of X (n x d) spanning the largest simplex."""
    X = np.asarray(X, dtype=np.float64)
    n, d = X.shape
    inds = np.zeros(d, dtype=int)
    ortho = X.copy()
    for j in range(d):
        norms = np.linalg.norm(ortho, axis=1)
        inds[j] = int(np.argmax(norms))
        v = ortho[inds[j]].copy()
        if j == 0:
            ortho = ortho - v  # translate so first vertex is origin
        else:
            nv = np.linalg.norm(v)
            if nv > 0:
                v /= nv
                ortho = ortho - np.outer(ortho @ v, v)
    return inds


def myisa(X: np.ndarray, whitening: bool = False) -> np.ndarray:
    """Inner simplex transform (without feasibilization), f64 on host.

    ``X``: (n, d) Kchi matrix; returns the (d, d) simplex transform A such
    that ``X @ A`` are simplex memberships.  Reference: ``src/isotarget.jl:81-98``.
    """
    X = np.asarray(X, dtype=np.float64)
    try:
        if whitening:
            C = (X.T @ X) / X.shape[0]
            evals, evecs = np.linalg.eigh(C)
            W = evecs @ np.diag(evals ** -0.5) @ evecs.T
            i = indexmap(X @ W)
        else:
            i = indexmap(X)
        return np.linalg.inv(X[i, :])
    except np.linalg.LinAlgError as e:
        raise DomainError(
            "Could not compute the simplex transformation. "
            "The subspace might be singular/collapsed") from e


def fixperm(new, old):
    """Permute chi-dims (columns) of ``new`` (n, d) to minimize L1 distance to
    ``old`` (reference ``src/isotarget.jl:120-127``; brute force, d! small)."""
    new = np.asarray(new)
    old = np.asarray(old)
    d = new.shape[-1]
    best, bestp = np.inf, tuple(range(d))
    for p in itertools.permutations(range(d)):
        dist = np.abs(new[:, list(p)] - old).sum()
        if dist < best:
            best, bestp = dist, p
    return new[:, list(bestp)]


@dataclass
class TransformISA:
    """Multi-dim target via the inner simplex algorithm
    (reference ``src/isotarget.jl:74-107``)."""

    fused = False
    permute: bool = True
    whitening: bool = False

    def __call__(self, model, xs, ys):
        chi = np.asarray(model(xs), dtype=np.float64)
        if chi.shape[-1] <= 1:
            raise DomainError("TransformISA does not work with one dimensional chi functions")
        ks = np.asarray(expectation(model, ys), dtype=np.float64)   # (n, d)
        target = ks @ myisa(ks, self.whitening)
        if self.permute:
            target = fixperm(target, chi)
        return jnp.asarray(target, dtype=jnp.float32)


# ==========================================================================
# PseudoInverse transform
# ==========================================================================

@dataclass
class TransformPseudoInv:
    """Target by approximately inverting K with the Moore-Penrose
    pseudoinverse (reference ``src/isotarget.jl:145-179``).

    Internally uses the reference's (d, n) layout verbatim."""

    fused = False
    normalize: bool = True
    direct: bool = True
    eigenvecs: bool = True
    permute: bool = True

    def __call__(self, model, xs, ys):
        chi = np.asarray(model(xs), dtype=np.float64).T       # (d, n)
        if chi.shape[0] <= 1:
            raise DomainError("TransformPseudoInv does not work with one dimensional chi functions")
        kchi = np.asarray(expectation(model, ys), dtype=np.float64).T  # (d, n)

        try:
            kchi_inv = np.linalg.pinv(kchi)
        except np.linalg.LinAlgError as e:
            raise DomainError(
                "Could not compute the pseudoinverse. "
                "The subspace might be singular/collapsed") from e

        if self.direct:
            Kinv = chi @ kchi_inv
            T = scipy.linalg.schur(Kinv)[1] if self.eigenvecs else np.eye(Kinv.shape[0])
            target = T @ Kinv @ kchi
        else:
            K = kchi @ kchi_inv
            T = scipy.linalg.schur(K)[1] if self.eigenvecs else np.eye(K.shape[0])
            target = T @ np.linalg.inv(K) @ kchi

        if self.normalize:
            norms = np.abs(target).sum(axis=1, keepdims=True)
            target = target / norms * target.shape[1]
        target = target.T                                      # back to (n, d)
        if self.permute:
            target = fixperm(target, chi.T)
        return jnp.asarray(target, dtype=jnp.float32)


# ==========================================================================
# Stabilization wrapper
# ==========================================================================

@dataclass
class Stabilize:
    """Wraps another transform, flipping (1-D) or permuting (N-D) the target
    to match the previous one (reference ``src/isotarget.jl:190-208``)."""

    target: Any
    last: Any = None
    fused = False

    def __call__(self, model, xs, ys):
        t = self.target(model, xs, ys)
        if self.last is None:
            self.last = t
        if isinstance(self.target, TransformShiftscale):
            if float(jnp.abs(t - self.last).sum()) > t.size / 2:
                t = 1.0 - t
            self.last = t
            return t
        t = jnp.asarray(fixperm(np.asarray(t), np.asarray(self.last)))
        self.last = t
        return t


# ==========================================================================
# Experimental transform family (Gram-Schmidt / LeftRight / SVD / Pinv / Cross)
# All operate on host in f64; (n, d) at the boundary, reference layout inside.
# ==========================================================================

@dataclass
class TransformGramSchmidt:
    """Orthonormalize Kchi dims via thin QR with sign fix
    (reference TransformGramSchmidt2, ``src/isotarget.jl:236-270``)."""

    fused = False

    def __call__(self, model, xs, ys):
        kchi = np.asarray(expectation(model, ys), dtype=np.float64)  # (n, d)
        q, r = np.linalg.qr(kchi)
        t = q * np.sign(np.diag(r))[None, :]
        return jnp.asarray(t, dtype=jnp.float32)


def realsubspace(V: np.ndarray) -> np.ndarray:
    """Real invariant subspace from complex eigenvector pairs
    (reference ``src/isotarget.jl:525-538``)."""
    V = V.copy()
    i = 0
    while i + 1 < V.shape[1]:
        if np.allclose(V[:, i], np.conj(V[:, i + 1])):
            re = np.real(V[:, i]).copy()
            im = np.imag(V[:, i + 1]).copy()
            V[:, i] = re
            V[:, i + 1] = im
            i += 2
        else:
            i += 1
    return np.real(V)


def _domsubspace_eigen(A: np.ndarray):
    vals, vecs = np.linalg.eig(A)
    order = np.argsort(-np.abs(np.real(vals)))
    vals, vecs = vals[order], vecs[:, order]
    return realsubspace(vecs), vals


def _transformleftright(L: np.ndarray, R: np.ndarray):
    """Krylov-style subspace map eigen-decomposition.  ``L``, ``R``: (n, D)
    column-per-function matrices (reference ``src/isotarget.jl:318-373``)."""
    D = L.shape[1]
    LR = np.hstack([R, L])
    q, r = np.linalg.qr(LR)
    qR = r[:, :D]
    qL = r[:, D:]
    A = np.linalg.lstsq(qL.T, qR.T, rcond=None)[0].T  # A = qR / qL
    vecs, vals = _domsubspace_eigen(A)
    vals = vals[:D]
    vecs = vecs[:, :D]
    target = q @ vecs
    s = np.sum(L * target, axis=0, keepdims=True)
    target = target * np.sign(s)
    scaling = np.real(vals)[None, :]
    target = target * scaling
    target = target * np.sqrt(target.shape[0])
    return target


def _addones(x: np.ndarray) -> np.ndarray:
    c = np.full((x.shape[0], 1), 1.0 / np.sqrt(x.shape[0]))
    return np.hstack([c, x])


@dataclass
class TransformLeftRight:
    """Dominant-eigenvector targets from the <L, R> Krylov space
    (reference ``src/isotarget.jl:274-287``)."""

    fused = False

    def __call__(self, model, xs, ys):
        L = np.asarray(model(xs), dtype=np.float64)              # (n, d)
        R = np.asarray(expectation(model, ys), dtype=np.float64)
        d = L.shape[1]
        t = _transformleftright(_addones(L), _addones(R))[:, 1:d + 1]
        return jnp.asarray(t, dtype=jnp.float32)


def updatehistory(L: np.ndarray, l: np.ndarray) -> np.ndarray:
    """Insert newest observations into columns 1..d of the history matrix;
    column 0 stays the constant vector (reference ``src/isotarget.jl:546-566``)."""
    n, d = l.shape
    m, h = L.shape
    if n > m:
        Lnew = np.zeros((n, h))
        Lnew[:m, :] = L
        L = Lnew
    elif n < m:
        raise ValueError("automated shrinking is not supported")
    L = L.copy()
    L[:, 0] = 1.0 / np.sqrt(L.shape[0])
    L[:, 1 + d:] = L[:, 1:-d] if d > 0 else L[:, 1:]
    L[:, 1:d + 1] = l
    return L


@dataclass
class TransformLeftRightHistory:
    """LeftRight with a history matrix of width ``hist``
    (reference TransformLeftRightHistory5, ``src/isotarget.jl:289-316``)."""

    hist: int = 5
    L: np.ndarray = field(default=None)
    R: np.ndarray = field(default=None)
    fused = False

    def __call__(self, model, xs, ys):
        l = np.asarray(model(xs), dtype=np.float64)              # (n, d)
        r = np.asarray(expectation(model, ys), dtype=np.float64)
        n, d = l.shape
        if self.L is None:
            self.L = np.ones((0, self.hist))
            self.R = np.ones((0, self.hist))
        assert self.L.shape[1] == self.R.shape[1] >= d + 1
        self.L = updatehistory(self.L, l)
        self.R = updatehistory(self.R, r)
        t = _transformleftright(self.L, self.R)[:, 1:d + 1]
        return jnp.asarray(t, dtype=jnp.float32)


@dataclass
class TransformSVD:
    """DMD-like reduced operator via SVD of chi
    (reference ``src/isotarget.jl:377-393``)."""

    fused = False

    def __call__(self, model, xs, ys):
        L = np.asarray(model(xs), dtype=np.float64)              # (n, d)
        R = np.asarray(expectation(model, ys), dtype=np.float64)
        d = L.shape[1]
        U, S, Vt = np.linalg.svd(L, full_matrices=False)
        H = U.T @ R @ Vt.T @ np.diag(1.0 / S)
        vals, vecs = np.linalg.eig(H)
        order = np.argsort(-np.real(vals))
        target = U @ np.real(vecs[:, order][:, :d])
        return jnp.asarray(target, dtype=jnp.float32)


@dataclass
class TransformSVDRev:
    """DMD-like variant using the SVD of Kchi
    (reference ``src/isotarget.jl:396-411``)."""

    fused = False

    def __call__(self, model, xs, ys):
        L = np.asarray(model(xs), dtype=np.float64)
        R = np.asarray(expectation(model, ys), dtype=np.float64)
        d = L.shape[1]
        U, S, Vt = np.linalg.svd(R, full_matrices=False)
        H = U.T @ R @ Vt.T @ np.diag(1.0 / S)
        vals, vecs = np.linalg.eig(H)
        target = U @ np.real(vecs[:, :d])
        return jnp.asarray(target, dtype=jnp.float32)


def rownormalize(x: np.ndarray, p: int = 2) -> np.ndarray:
    norms = np.linalg.norm(x, ord=p, axis=1, keepdims=True)
    return x / norms


def target_pseudoinverse(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Inverse-Koopman target in rowspace; ``x``, ``y``: (d, n) reference
    layout (reference ``src/isotarget.jl:614-635``)."""
    assert x.shape[0] < x.shape[1]
    kinv = x @ np.linalg.pinv(y)

    def mysort_key(c):
        a = np.real(c)
        return np.inf if a < 0.9 else a

    vals, vecs = np.linalg.eig(kinv)
    order = sorted(range(len(vals)), key=lambda i: mysort_key(vals[i]))
    vals, vecs = vals[order], vecs[:, order]
    Q = realsubspace(vecs)
    target = np.linalg.solve(Q, y)
    target = target / np.sqrt((target ** 2).sum(axis=1, keepdims=True)) * 50
    target = target * np.sign((x * target).sum(axis=1, keepdims=True))
    return target


@dataclass
class TransformPinv:
    """Pinv-in-rowspace transform with history and optional fixed constant row
    (reference TransformPinv3, ``src/isotarget.jl:570-635``)."""

    d: int = 1
    hist: int = 2
    fixedone: bool = False
    L: np.ndarray = field(default=None)
    R: np.ndarray = field(default=None)
    fused = False

    def __post_init__(self):
        assert self.hist >= self.d
        rows = self.d + 1 if self.fixedone else self.d
        if self.L is None:
            self.L = np.ones((rows, self.hist))
            self.R = np.ones((rows, self.hist))

    def _updatehistory(self, x, y):
        d = x.shape[0]
        if self.L.shape[1] != x.shape[1]:
            rows = self.L.shape[0]
            self.L = np.ones((rows, x.shape[1]))
            self.R = np.ones((rows, x.shape[1]))
        if self.fixedone:
            self.L[d + 1:, :] = self.L[1:-d, :]
            self.R[d + 1:, :] = self.L[1:-d, :]
            self.L[1:d + 1, :] = x
            self.R[1:d + 1, :] = y
        else:
            self.L[d:, :] = self.L[:-d, :]
            self.R[d:, :] = self.L[:-d, :]
            self.L[:d, :] = x
            self.R[:d, :] = y

    def __call__(self, model, xs, ys):
        x = np.asarray(model(xs), dtype=np.float64).T            # (d, n)
        y = np.asarray(expectation(model, ys), dtype=np.float64).T
        d = x.shape[0]
        self._updatehistory(x, y)
        target = target_pseudoinverse(self.L, self.R)
        target = target[1:d + 1, :] if self.fixedone else target[:d, :]
        return jnp.asarray(target.T, dtype=jnp.float32)


# --- Rayleigh-Ritz cross-transform family (reference Oct-25 experiments) ---

def rr_svd(X, Y):
    """Rayleigh-Ritz via SVD basis (reference ``src/isotarget.jl:658-665``)."""
    U, S, Vt = np.linalg.svd(X, full_matrices=False)
    Kh = U.T @ Y @ Vt.T @ np.diag(1.0 / S)
    vals, vecs = np.linalg.eig(Kh)
    order = np.argsort(-np.real(vals))
    return vals[order], U @ vecs[:, order]


def rr_svd_i(X, Y):
    vals, vecs = rr_svd(Y, X)
    vals = 1.0 / vals[::-1]
    vecs = vecs[:, ::-1]
    return vals, vecs


def rr_svd_si(X, Y):
    vals, vecs = rr_svd(X - Y, X)
    vals = 1.0 - 1.0 / vals
    return vals, vecs


def rr_gev(X, Y):
    """Generalized eigenvalue Rayleigh-Ritz (reference ``src/isotarget.jl:684-689``)."""
    C = X.T @ X
    M = X.T @ Y
    vals, vecs = scipy.linalg.eig(M, C)
    order = np.argsort(-np.real(vals))
    return vals[order], Y @ vecs[:, order]


def rr_cross(X, Y, alpha=1e-8, tau=1e-3, p=2.0, wmin=1e-3, clip_s=(1e-2, 10.0)):
    """Tikhonov-regularized Rayleigh-Ritz over accumulated (chi, Kchi) columns
    with residual weights (reference ``src/isotarget.jl:691-725``)."""
    Q, R = np.linalg.qr(Y)
    C = X.T @ X + alpha * np.eye(X.shape[1])
    M = X.T @ Q
    T = R @ np.linalg.solve(C, M)
    vals, vecs = np.linalg.eig(T)
    order = np.argsort(-np.real(vals))
    vals, vecs = vals[order], vecs[:, order]
    V = Q @ vecs

    Lam = np.diag(vals)
    Rres = X @ vecs - (Y @ vecs) @ Lam
    residuals = np.sqrt((np.abs(Rres) ** 2).sum(axis=0))
    Ynorms = np.sqrt((np.abs(Y @ vecs) ** 2).sum(axis=0))
    Xnorms = np.sqrt((np.abs(X @ vecs) ** 2).sum(axis=0))
    denom = np.abs(vals) * (Ynorms + np.finfo(float).eps) + Xnorms + np.finfo(float).eps
    relres = residuals / denom
    w = 1.0 / (1 + (relres / tau) ** p)
    w = np.clip(np.real(w), wmin, 1.0)
    s = np.clip(np.sqrt(w), clip_s[0], clip_s[1])
    return dict(vals=vals, vecs=V, res=residuals, relres=relres, weights=w, vecs0=V, s=s)


@dataclass
class TransformCross:
    """Accumulate past (chi, Kchi) columns, Rayleigh-Ritz target
    (reference ``src/isotarget.jl:650-767``)."""

    npoints: int = 0
    maxcols: int = 10
    X: np.ndarray = field(default=None)
    Y: np.ndarray = field(default=None)
    fused = False

    def __post_init__(self):
        if self.X is None:
            self.X = np.zeros((self.npoints, 0))
            self.Y = np.zeros((self.npoints, 0))

    def reset(self):
        self.X = np.zeros((self.X.shape[0], 0))
        self.Y = np.zeros((self.Y.shape[0], 0))

    def __call__(self, model, xs, ys):
        x = np.asarray(model(xs), dtype=np.float64)              # (n, d)
        y = np.asarray(expectation(model, ys), dtype=np.float64)
        N, M = y.shape
        if self.X.shape[0] != N:
            self.X = np.zeros((N, 0))
            self.Y = np.zeros((N, 0))
        if self.X.shape[1] < M or not np.array_equal(self.X[:, -M:], x):
            self.X = np.hstack([self.X, x])[:, -self.maxcols:]
            self.Y = np.hstack([self.Y, y])[:, -self.maxcols:]
        z = rr_cross(self.X, self.Y)
        t = np.real(z["vecs"][:, :M])
        t = t * np.sqrt(N)
        t = t * np.sign((t * x).sum(axis=0, keepdims=True))
        return jnp.asarray(t, dtype=jnp.float32)


# ==========================================================================
# Residual diagnostics
# ==========================================================================

def residual_linear(iso, data=None):
    """Columnwise lambda-fit residual (reference ``src/isotarget.jl:776-786``).

    chi/kchi treated per chi-dimension; returns per-dim relative residuals."""
    data = iso.data if data is None else data
    f = np.asarray(bucketed_model(iso.chifun)(features(data)),
                   dtype=np.float64).T                               # (d, n)
    g = np.asarray(expectation_bucketed(iso.chifun, propfeatures(data)),
                   dtype=np.float64).T
    lam = np.mean(g / f, axis=1, keepdims=True)
    res = g - lam * f
    relres = np.linalg.norm(res, axis=1) / np.linalg.norm(g, axis=1)
    return dict(res=res, relres=relres, **{"lambda": lam})


def qr_thin(A: np.ndarray):
    return np.linalg.qr(A)


def residual_ritz(iso, data=None):
    """Ritz residuals of the approximate invariant subspace
    (reference ``src/isotarget.jl:787-801``)."""
    data = iso.data if data is None else data
    V = np.asarray(bucketed_model(iso.chifun)(features(data)),
                   dtype=np.float64)                                 # (n, d)
    KV = np.asarray(expectation_bucketed(iso.chifun, propfeatures(data)),
                    dtype=np.float64)
    Q, R = qr_thin(V)
    KQ = KV @ np.linalg.inv(R)
    Kr = Q.T @ KQ
    vals, vecs = np.linalg.eig(Kr)
    order = np.argsort(np.abs(1 - vals))
    vals, vecs = vals[order], vecs[:, order]
    residues = KQ @ vecs - (Q @ vecs) * vals[None, :]
    relres = np.linalg.norm(residues, axis=0) / np.linalg.norm(KQ @ vecs, axis=0)
    return dict(residues=residues, relres=relres, vals=vals, vecs=vecs, Q=Q)


def residual_subspace(V, KV=None, V_norms=False, iso=None):
    """Projection residual of KV onto span(V)
    (reference ``src/isotarget.jl:804-821``)."""
    if KV is None:  # called with an Iso
        iso = V
        V = np.asarray(bucketed_model(iso.chifun)(features(iso.data)),
                       dtype=np.float64)
        KV = np.asarray(expectation_bucketed(iso.chifun, propfeatures(iso.data)),
                        dtype=np.float64)
    V, KV = np.asarray(V, np.float64), np.asarray(KV, np.float64)
    Q, _ = qr_thin(V)
    PKV = Q @ (Q.T @ KV)
    res = KV - PKV
    denom = np.linalg.norm(V if V_norms else KV, axis=0)
    relres = np.linalg.norm(res, axis=0) / denom
    return dict(res=res, relres=relres)


# ==========================================================================
# Dispatch
# ==========================================================================

def isotarget(iso, target=None):
    """Compute the training target for ``iso`` (reference ``src/isotarget.jl:10-12``).

    The model is evaluated through capacity buckets (one compiled forward
    pass per dataset size class), and chi(xs) and chi(ys) are computed in
    a SINGLE stacked device call: on remote backends each dispatch costs
    tens of ms, and the host-transform path pays it every iteration."""
    from .data import WeightedSamples, model_bucketed

    t = iso.target if target is None else target
    xs = np.asarray(features(iso.data))
    ys_raw = propfeatures(iso.data)
    weighted = isinstance(ys_raw, WeightedSamples)
    vals = np.asarray(ys_raw.values if weighted else ys_raw)
    n, k = vals.shape[:2]
    out = model_bucketed(iso.chifun, np.concatenate(
        [xs, vals.reshape(n * k, -1)], axis=0))
    chi_x = out[:len(xs)]
    chi_y = out[len(xs):].reshape(n, k, -1)

    fallback = bucketed_model(iso.chifun)

    def model(z):
        # identity dispatch: transforms receive exactly the xs / ys
        # objects constructed above and must pass them through untouched
        # to hit the precomputed stacked results (every in-repo transform
        # does); any transformed view falls back to a correct — but
        # per-call — bucketed evaluation (counted + debug-logged so the
        # lost optimization is observable, see ``stacked_fallback_count``)
        if z is xs:
            return chi_x
        if z is vals:
            return chi_y
        global stacked_fallback_count
        stacked_fallback_count += 1
        _log.debug("isotarget stacked-evaluation fallback #%d: transform "
                   "%s passed a transformed view (shape %s) — per-call "
                   "bucketed evaluation", stacked_fallback_count,
                   type(t).__name__, np.shape(z))
        return fallback(z)

    ys = (WeightedSamples(vals, np.asarray(ys_raw.weights)) if weighted
          else vals)
    return t(model, xs, ys)
