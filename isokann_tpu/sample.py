"""Adaptive sampling primitives.

TPU-native rebuild of the reference adaptive-sampling machinery:
- chi-uniform stratified subsampling (``src/utils/subsample.jl:5-76``)
- KDE / average-shifted-histogram gap-filling (``src/utils/subsample.jl:106-177``)
- greedy farthest-point picking (``src/utils/picking.jl:16-54``)
- chi-extrapolation beyond the extrema (``legacy/extrapolate.jl:15-78``)

These are host-side selection algorithms operating on small 1-D chi arrays
(n ~ 1e3-1e5); the heavy parts (chi evaluation, propagation) run on device.
A C++ fast path for the inner loops is used when the native extension is
built (see ``native/``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    from .native import pickclosest_native, ash_resample_native  # noqa: F401
    _HAVE_NATIVE = True
except Exception:
    _HAVE_NATIVE = False


# ==========================================================================
# chi-stratified uniform-grid subsampling
# ==========================================================================

def subsample_uniformgrid(ys, n, keepedges=True, rng=None):
    """Indices such that ``ys[inds]`` approximates a uniform distribution:
    closest points to a randomly perturbed uniform grid in [0,1]
    (reference ``src/utils/subsample.jl:5-14``)."""
    rng = np.random.default_rng() if rng is None else rng
    ys = np.asarray(ys).ravel()
    if n <= 2:
        keepedges = False
    m = n - 2 if keepedges else n
    needles = (rng.random(m) + np.arange(m)) / m
    if keepedges:
        needles = np.concatenate([[0.0], needles, [1.0]])
    return pickclosest(ys, needles)


def pickclosest(haystack, needles):
    """Indices into haystack closest to needles, without duplicates
    (candidates are removed after a match).  O((n+m) log n) sorted sweep,
    reference ``pickclosestloop`` ``src/utils/subsample.jl:41-76``."""
    hs = np.asarray(haystack, dtype=np.float64).ravel()
    ns = np.asarray(needles, dtype=np.float64).ravel()
    ih = np.argsort(hs, kind="stable")
    rs = _pickclosest_sorted(hs[ih], np.sort(ns))
    return ih[rs]


def _pickclosest_sorted(hs: np.ndarray, ns: np.ndarray):
    """Linear sweep over sorted haystack/needles
    (reference ``_pickclosestloop`` ``src/utils/subsample.jl:52-76``)."""
    if _HAVE_NATIVE:
        return pickclosest_native(hs, ns)
    nh = len(hs)
    avail = np.ones(nh, dtype=bool)
    rs = []
    i = 0
    for needle in ns:
        di = abs(hs[i] - needle)
        while True:
            j = i + 1
            while j < nh and not avail[j]:
                j += 1
            if j < nh and abs(hs[j] - needle) <= di:
                di = abs(hs[j] - needle)
                i = j
            else:
                rs.append(i)
                avail[i] = False
                # step back to previous available
                k = i - 1
                while k >= 0 and not avail[k]:
                    k -= 1
                i = k
                break
        if i < 0:
            nxt = np.flatnonzero(avail)
            if len(nxt) == 0:
                break
            i = int(nxt[0])
    return np.asarray(rs, dtype=int)


# ==========================================================================
# Average Shifted Histogram density (reference: AverageShiftedHistograms.jl)
# ==========================================================================

class ASH:
    """1-D average-shifted-histogram density on a fixed grid: a histogram of
    bin width delta smoothed with a triangular kernel of half-width m bins.
    Supports O(1)-ish incremental point insertion (``ash!``)."""

    def __init__(self, xs, lo=-0.1, hi=1.1, step=0.001, m=20):
        self.lo, self.step = lo, step
        self.nbins = int(round((hi - lo) / step)) + 1
        self.m = m
        self.counts = np.zeros(self.nbins)
        self.n = 0
        self.add(np.asarray(xs, dtype=np.float64))

    def _binindex(self, x):
        idx = np.round((np.asarray(x, dtype=np.float64) - self.lo) / self.step).astype(int)
        return np.clip(idx, 0, self.nbins - 1)

    def add(self, xs):
        xs = np.atleast_1d(xs)
        np.add.at(self.counts, self._binindex(xs), 1.0)
        self.n += len(xs)
        self._density = None

    @property
    def density(self):
        if getattr(self, "_density", None) is None:
            m = min(self.m, self.nbins)
            kern = 1.0 - np.abs(np.arange(-m + 1, m)) / m
            h = m * self.step
            conv = np.convolve(self.counts, kern, mode="same")
            if len(conv) != self.nbins:      # kernel longer than grid
                lo = (len(conv) - self.nbins) // 2
                conv = conv[lo:lo + self.nbins]
            self._density = conv / (self.n * h)
        return self._density

    def pdf(self, x):
        return self.density[self._binindex(x)]

    @property
    def grid(self):
        return self.lo + np.arange(self.nbins) * self.step


def resample_kde_ash(xs, ys, n=10, m=20, bandwidth=None, target=None):
    """Pick n indices of ``ys`` such that ``[xs; ys[iys]]`` approaches the
    target (default uniform) density.  Periodic closure of [0,1], adaptive
    window growth, greedy gap-filling
    (reference ``src/utils/subsample.jl:127-177``)."""
    xs = np.asarray(xs, dtype=np.float64).ravel()
    ys = np.asarray(ys, dtype=np.float64).ravel()
    target_pdf = target if callable(target) else (
        lambda y: ((0.0 <= y) & (y <= 1.0)).astype(np.float64))

    closure = np.concatenate([xs, -xs, 2.0 - xs])   # periodic closure of [0,1]
    kde = ASH(closure, m=m)
    # heuristic window growth for large gaps (reference :139-143); the
    # window is capped at half the grid so the estimate stays meaningful
    mmax = kde.nbins // 2
    while (kde.density[kde_interior(kde)].min() <= 0.1
           or kde.density.max() > 3) and m < mmax:
        m = min(int(round(m * 1.2)) + 1, mmax)
        kde = ASH(closure, m=m)

    p = target_pdf(ys)
    if _HAVE_NATIVE:
        counts = kde.counts.copy()
        return ash_resample_native(ys, p.copy(), counts, kde.lo, kde.step,
                                   kde.m, kde.n, n)
    iys = np.zeros(n, dtype=int)
    for i in range(n):
        delta = p - kde.pdf(ys)
        iy = int(np.argmax(delta))
        p[iy] = 0.0
        kde.add(ys[iy])
        iys[i] = iy
    return iys


def kde_interior(kde: ASH):
    """Mask of grid points inside [0, 1] (the resampling domain)."""
    g = kde.grid
    return (g >= 0.0) & (g <= 1.0)


def kde_needles(xs, n=10, bandwidth=0.02, target=None):
    """Gaussian-KDE variant: iteratively place needles at the density minimum
    (reference ``src/utils/subsample.jl:106-119``)."""
    from scipy.stats import gaussian_kde

    xs = list(np.asarray(xs, dtype=np.float64).ravel())
    target_pdf = target if callable(target) else (lambda y: np.ones_like(y))
    needles = []
    grid = np.linspace(min(xs), max(xs), 512)
    for _ in range(n):
        k = gaussian_kde(np.asarray(xs), bw_method=bandwidth / max(np.std(xs), 1e-9))
        delta = k(grid) - target_pdf(grid)
        c = grid[int(np.argmin(delta))]
        needles.append(c)
        xs.append(c)
    return np.asarray(needles)


def resample_kde_needles(xs, ys, n, **kwargs):
    """Fill gaps in the KDE of xs with points from ys
    (reference ``src/utils/subsample.jl:92-99``)."""
    needles = kde_needles(xs, n, **kwargs)
    return pickclosest(ys, needles)


# ==========================================================================
# Greedy farthest-point picking (reference src/utils/picking.jl)
# ==========================================================================

def picking(X, n, dists: Optional[Callable] = None):
    """Greedy max-min (farthest point) sampling of n rows of X (npts, d).

    Returns (picked rows, indices, distance matrix (npts, n)).
    Reference ``src/utils/picking.jl:16-43``."""
    X = np.asarray(X)
    npts = X.shape[0]
    assert npts >= n
    if dists is None:
        if _HAVE_NATIVE:
            from .native import picking_native
            qs, mins = picking_native(np.asarray(X, np.float64), n)
            # distance matrix on demand for API parity
            d = ((X[None, qs, :] - X[:, None, :]) ** 2).sum(-1)
            return X[qs], qs, d
        dists = lambda x, Xs: ((Xs - x) ** 2).sum(axis=-1)

    d = np.zeros((npts, n))
    mins = np.full(npts, np.inf)
    qs = []
    q = int(np.argmax(dists(np.zeros(X.shape[-1]), X)))
    for i in range(n):
        qs.append(q)
        d[:, i] = np.asarray(dists(X[q], X))
        mins = np.minimum(mins, d[:, i])
        q = int(np.argmax(mins))
    return X[qs], np.asarray(qs), d


def picking_aligned(x, m):
    """Picking with pairwise-aligned RMSD distances for molecular coords;
    rows of ``x`` are flat (3N,) structures
    (reference ``src/utils/picking.jl:50-60``)."""
    from .ops.align import aligned_rmsd_one_to_many

    x = np.asarray(x, dtype=np.float64).copy()
    npts = x.shape[0]
    xr = x.reshape(npts, -1, 3)
    xr -= xr.mean(axis=1, keepdims=True)
    x = xr.reshape(npts, -1)
    dists = lambda xi, Xs: np.asarray(aligned_rmsd_one_to_many(xi, Xs))
    picked, qs, d = picking(x, m, dists=dists)
    return picked, qs, d


# ==========================================================================
# chi-extrapolation (reference legacy/extrapolate.jl)
# ==========================================================================

def dchidx(iso, x):
    """Gradient of chi (through the featurizer) at raw coordinates ``x``
    (reference ``src/utils/minimumpath.jl:3-7``)."""
    x = jnp.asarray(x)
    featurizer = iso.data.featurizer
    apply, params = iso.model.apply, iso.model.params

    def chi1(xx):
        return apply(params, jnp.asarray(featurizer(xx[None, :]), jnp.float32)[0])[0]

    return jax.grad(chi1)(x)


def extrapolate_x(iso, x, step, steps):
    """x += grad(chi)/|grad(chi)|^2 * step, ``steps`` times
    (reference ``legacy/extrapolate.jl:80-88``)."""
    x = jnp.asarray(x)
    for _ in range(steps):
        g = dchidx(iso, x)
        x = x + g / (jnp.sum(g ** 2) + 1e-12) * step
    return x


def extrapolate(iso, n, stepsize=0.1, steps=1, minimize=True, maxskips=10):
    """Extrapolate the 2n most extreme chi points beyond the extrema
    (reference ``legacy/extrapolate.jl:15-78``)."""
    from .data import flattenfirst

    coords = np.asarray(flattenfirst(iso.data.propcoords))
    feats = flattenfirst(iso.data.propfeatures)
    chi = np.asarray(iso.chifun(feats))[:, 0]
    order = np.argsort(chi)

    xs = []
    skips = 0
    for perm, direction, N in [(order, -1, n), (order[::-1], 1, 2 * n)]:
        for i in perm:
            if skips > maxskips:
                break
            try:
                x = extrapolate_x(iso, coords[i], direction * stepsize, steps)
                if minimize:
                    from .analysis.minimumpath import energyminimization_chilevel
                    x = energyminimization_chilevel(iso, x)
                x = np.asarray(x)
                if not np.all(np.isfinite(x)):
                    raise FloatingPointError("non-finite extrapolate")
                xs.append(x)
            except (FloatingPointError, ValueError, AssertionError):
                skips += 1
                continue
            if len(xs) == N:
                break
    if not xs:
        return np.zeros((0, coords.shape[-1]), dtype=coords.dtype)
    return np.stack(xs)


def addextrapolates(iso, n, stepsize=0.01, steps=1, minimize=True):
    """Attach extrapolated points to the iso data
    (reference ``legacy/extrapolate.jl:15-24``)."""
    if n == 0:
        return iso
    xs = extrapolate(iso, n, stepsize, steps, minimize=minimize)
    if len(xs):
        iso.addcoords(xs)
    return iso
