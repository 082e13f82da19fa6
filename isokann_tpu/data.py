"""Data layer: SimulationData, trajectory pairing, merging, subsampling.

TPU-native rebuild of the reference data layer (``src/data.jl``,
``src/simulation.jl:71-298``).

Array convention (row-major, batch leading):
- ``xs``  : (n, d)      — n start points of dimension d
- ``ys``  : (n, k, d)   — k Koopman samples per start point
- features: (n, f) and (n, k, f)

(The reference stores the transposes ``(d, n)`` / ``(d, k, n)``,
``src/data.jl:5-12``; the logical content is identical.)

Data lives as jax arrays on device; growth (merging new samples) happens on
host between jitted episodes — the jitted training/propagation kernels only
ever see fixed-shape arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def identity(x):
    """Default featurizer (picklable, unlike a lambda)."""
    return x


# ==========================================================================
# WeightedSamples (Girsanov reweighting)
# ==========================================================================

@jax.tree_util.register_pytree_node_class
@dataclass
class WeightedSamples:
    """(values, weights) pair for Girsanov-reweighted Koopman samples.

    ``values``: (n, k, f); ``weights``: (n, k).
    Reference: ``src/data.jl:187-215``.
    """

    values: Any
    weights: Any

    def tree_flatten(self):
        return (self.values, self.weights), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.values.shape

    def __getitem__(self, i):
        return WeightedSamples(self.values[i], self.weights[i])

    def astype(self, dtype):
        return WeightedSamples(jnp.asarray(self.values, dtype),
                               jnp.asarray(self.weights, dtype))

    def ess(self):
        """Per-start effective sample size (sum w)^2 / sum w^2 over the
        walker axis, shape (n,): equals k for uniform weights and -> 1
        when one walker dominates.  Host-side numpy (a diagnostic must
        not cost a device round-trip per new shape).  Girsanov weight
        degeneracy is quantified in tools/girsanov_variance.py /
        tools/optcontrol_analytic.py."""
        w = np.asarray(self.weights, dtype=np.float64)
        return (w.sum(-1) ** 2) / ((w * w).sum(-1) + 1e-300)


def values(ys):
    return ys.values if isinstance(ys, WeightedSamples) else ys


def weights(ys):
    return ys.weights if isinstance(ys, WeightedSamples) else None


# ==========================================================================
# Small array utilities
# ==========================================================================

def lastcat(x, y):
    """Concatenate along the batch (leading) axis — the row-major counterpart
    of the reference's last-dim cat (``src/data.jl:61-62``).

    Concatenation happens on HOST (numpy): dataset growth produces a new
    array shape every generation, and each new-shape device op is a fresh
    mini-program compile on remote-device backends (seconds each).  Data
    re-enters the device only through the stable bucketed shapes of the
    jitted training/eval programs."""
    if isinstance(x, WeightedSamples) or isinstance(y, WeightedSamples):
        return WeightedSamples(
            np.concatenate([np.asarray(values(x)), np.asarray(values(y))],
                           axis=0),
            np.concatenate([np.asarray(_weights_or_ones(x)),
                            np.asarray(_weights_or_ones(y))], axis=0))
    return np.concatenate([np.asarray(x), np.asarray(y)], axis=0)


def _weights_or_ones(ys):
    w = weights(ys)
    if w is None:
        v = values(ys)
        return np.ones(v.shape[:-1], np.asarray(v).dtype)
    return w


def flattenfirst(A):
    """Collapse the (n, k) batch dims of a (n, k, ...) tensor into one
    (reference ``flattenlast``, ``src/simulation.jl:148``)."""
    A = values(A)
    return A.reshape((-1,) + A.shape[2:])


def flattenlast(A):
    """Keep the first dim, flatten the rest (literal counterpart of the
    reference export ``flattenlast``, ``src/simulation.jl:149``; with the
    batch-leading layout here, ``flattenfirst`` is usually what you want)."""
    A = values(A)
    return A.reshape((A.shape[0], -1))


def getobs(x, idx):
    if isinstance(x, WeightedSamples):
        return x[idx]
    if isinstance(x, tuple):
        return tuple(getobs(xi, idx) for xi in x)
    return x[idx]


# ==========================================================================
# Trajectory -> (x, y) pairs
# ==========================================================================

def bootstrap(sim, nx, ny, key=None):
    """Initial data by propagating the sim's start state
    (reference ``src/data.jl:27-31``)."""
    key = _key(key)
    k1, k2 = jax.random.split(key)
    xs = sim.randx0(nx, key=k1)
    ys = sim.propagate(xs, ny, key=k2)
    return xs, ys


def data_from_trajectory(xs, reverse=True, stride=1, lag=1):
    """(x, y) pairs from a trajectory ``xs``: (T, d).

    With ``reverse`` also adds the time-reversed transitions (both neighbours
    become Koopman samples, k=2).  Reference: ``src/data.jl:88-100``.
    """
    xs = jnp.asarray(xs)
    n = xs.shape[0]
    if reverse:
        rng = np.arange(lag, n - lag, stride)
        ys = jnp.stack([xs[rng - lag], xs[rng + lag]], axis=1)
        return xs[rng], ys
    rng = np.arange(0, n - lag, stride)
    ys = xs[rng + lag][:, None, :]
    return xs[rng], ys


def data_from_trajectories(xss, **kwargs):
    """Concatenate ``data_from_trajectory`` over a list of trajectories
    (reference ``src/data.jl:113-130``)."""
    datas = [data_from_trajectory(xs, **kwargs) for xs in xss]
    xs = jnp.concatenate([d[0] for d in datas], axis=0)
    ys = jnp.concatenate([d[1] for d in datas], axis=0)
    return xs, ys


# ==========================================================================
# Subsampling
# ==========================================================================

def model_bucketed(model, xs):
    """Evaluate ``model`` on a batch padded to its capacity bucket.

    Adaptive loops evaluate chi on ever-growing pools; without bucketing
    every growth step retraces/recompiles the jitted forward pass.
    Padding happens in numpy (one stable-shape device transfer)."""
    from .iso import bucket_capacity, _pad_rows

    xs = np.asarray(xs)
    m = xs.shape[0]
    return np.asarray(model(_pad_rows(xs, bucket_capacity(m))))[:m]


def subsample_inds(model, xs, n, keepedges=True, key=None):
    """Indices such that ``model(xs[inds])`` is approximately uniform, per
    chi-dimension (reference ``src/data.jl:38-42``).  A (near-)constant chi
    degrades to uniform random selection instead of failing.

    ``key``: optional PRNG key; with the same key the selection is
    deterministic (grid perturbation + degenerate fallback both seeded)."""
    from .sample import subsample_uniformgrid

    rng = np.random.default_rng(_seed(key))
    chi = model_bucketed(model, xs)      # (m, d)
    inds = []
    for j in range(chi.shape[-1]):
        col = chi[:, j]
        lo, hi = col.min(), col.max()
        if hi - lo < 1e-12:
            inds.extend(rng.choice(
                len(col), size=min(n, len(col)), replace=False))
            continue
        inds.extend(subsample_uniformgrid((col - lo) / (hi - lo), n,
                                          keepedges=keepedges, rng=rng))
    return np.asarray(inds, dtype=int)


def subsample(model, data, n, key=None):
    """Subsample `n` points of `data` uniformly in `model`
    (reference ``src/data.jl:49-58``)."""
    if isinstance(data, tuple):
        return getobs(data, subsample_inds(model, data[0], n, key=key))
    data = jnp.asarray(data)
    if data.ndim == 3:
        data = flattenfirst(data)
    return data[subsample_inds(model, data, n, key=key)]


def subsample_random(data, nx, key=None):
    """Random subsample of nx observations (reference ``src/data.jl:141-146``)."""
    n = len(data) if hasattr(data, "__len__") else values(data).shape[0]
    idx = np.random.default_rng(_seed(key)).choice(n, size=nx, replace=False)
    return getobs(data, idx) if isinstance(data, tuple) else data[idx]


# ==========================================================================
# SimulationData
# ==========================================================================

@dataclass
class SimulationData:
    """Simulation + coordinates + features bundle
    (reference ``src/simulation.jl:71-114``).

    - ``sim``: the simulation object (provides propagate/featurizer/...)
    - ``coords``: (xs (n,d), ys (n,k,d)) raw coordinates
    - ``features``/``propfeatures``: featurized f32 arrays (n,f), (n,k,f)
    - ``featurizer``: coords -> features, vmappable over leading batch dims
    """

    sim: Any
    _features: Any       # (n, f)
    _propfeatures: Any   # (n, k, f) or WeightedSamples
    coords: Any          # (n, d)
    propcoords: Any      # (n, k, d) or WeightedSamples
    featurizer: Callable

    # ---- constructors ------------------------------------------------

    @classmethod
    def from_sim(cls, sim, nx: int = None, nk: int = None, xs=None,
                 featurizer=None, key=None):
        """SimulationData(sim, nx, nk) / (sim, xs, nk)
        (reference ``src/simulation.jl:92-98``)."""
        key = _key(key)
        k1, k2 = jax.random.split(key)
        if xs is None:
            if hasattr(sim, "bootstrap_data") and getattr(sim, "bias", None) is None:
                # fused single-program data generation (MD sims)
                feat = featurizer or getattr(sim, "featurizer", None) or identity
                xs, ys, fxs, fys = sim.bootstrap_data(nx, nk, featurizer=feat,
                                                      key=key)
                return cls(sim, fxs, fys, xs, ys, feat)
            xs = sim.randx0(nx, key=k1)
        xs = jnp.asarray(xs)
        ys = sim.propagate(xs, nk, key=k2)
        return cls.from_coords(sim, xs, ys, featurizer=featurizer)

    @classmethod
    def from_coords(cls, sim, xs, ys, featurizer=None, features=None):
        """SimulationData(sim, (xs, ys)) (reference ``src/simulation.jl:110-114``).

        ``features``: optional precomputed (fxs, fys).  Stored arrays live
        on HOST (numpy): growth-driven shapes would otherwise trigger one
        remote mini-compile per new-shape device op; data re-enters the
        device through stable bucketed program shapes."""
        if featurizer is None:
            featurizer = getattr(sim, "featurizer", None) or identity
        xs = np.asarray(xs)
        if features is not None:
            fxs, fys = features
            if isinstance(fys, WeightedSamples):
                fys = WeightedSamples(np.asarray(fys.values, np.float32),
                                      np.asarray(fys.weights, np.float32))
            else:
                fys = np.asarray(fys, np.float32)
            if not isinstance(ys, WeightedSamples):
                ys = np.asarray(ys)
            return cls(sim, np.asarray(fxs, np.float32), fys, xs, ys,
                       featurizer)
        fxs = np.asarray(featurizer(xs), np.float32)
        if isinstance(ys, WeightedSamples):
            fys = WeightedSamples(np.asarray(featurizer(ys.values), np.float32),
                                  np.asarray(ys.weights, np.float32))
        else:
            ys = np.asarray(ys)
            fys = np.asarray(featurizer(ys), np.float32)
        return cls(sim, fxs, fys, xs, ys, featurizer)

    @classmethod
    def from_trajectory(cls, xs, sim=None, featurizer=None, **kwargs):
        """Build from a (T, d) trajectory via ``data_from_trajectory``."""
        from .simulators.base import ExternalSimulation
        sim = sim or ExternalSimulation()
        x, y = data_from_trajectory(jnp.asarray(xs), **kwargs)
        return cls.from_coords(sim, x, y, featurizer=featurizer)

    # ---- accessors (reference src/simulation.jl:121-151) --------------

    @property
    def features(self):
        return self._features

    @property
    def propfeatures(self):
        return self._propfeatures

    @property
    def featuredim(self):
        return self._features.shape[-1]

    @property
    def nk(self):
        return values(self._propfeatures).shape[1]

    @property
    def dim(self):
        return self.coords.shape[-1]

    def __len__(self):
        return self._features.shape[0]

    def __getitem__(self, i):
        if isinstance(i, int):
            i = slice(i, i + 1)
        return SimulationData(self.sim, self._features[i],
                              getobs(self._propfeatures, i),
                              self.coords[i], getobs(self.propcoords, i),
                              self.featurizer)

    def features_of(self, coords):
        """Featurize raw coordinates with this data's featurizer
        (reference ``features(d, coords)``, ``src/simulation.jl:121-124``)."""
        return jnp.asarray(self.featurizer(jnp.asarray(coords)), jnp.float32)

    @property
    def pdbfile(self):
        return getattr(self.sim, "pdbfile", None)

    def __repr__(self):
        return (f"SimulationData(sim={type(self.sim).__name__}, "
                f"n={len(self)}, nk={self.nk}, dim={self.dim}, "
                f"featuredim={self.featuredim})")

    # ---- merging & growth ---------------------------------------------

    def merge(self, other: "SimulationData") -> "SimulationData":
        """Concatenate two datasets, keeping self's sim/featurizer;
        re-featurizes ``other`` if featurizers differ
        (reference ``mergedata``, ``src/simulation.jl:162-171``)."""
        if other.featurizer is self.featurizer or other.featurizer == self.featurizer:
            f2, fy2 = other._features, other._propfeatures
        else:
            f2 = self.features_of(other.coords)
            ycoords = other.propcoords
            if isinstance(ycoords, WeightedSamples):
                fy2 = WeightedSamples(self.features_of(ycoords.values), ycoords.weights)
            else:
                fy2 = self.features_of(ycoords)
        return SimulationData(
            self.sim,
            lastcat(self._features, f2),
            lastcat(self._propfeatures, fy2),
            lastcat(self.coords, other.coords),
            lastcat(self.propcoords, other.propcoords),
            self.featurizer)

    def addcoords(self, coords, key=None) -> "SimulationData":
        """Propagate new start coords under sim and append the pairs
        (reference ``src/simulation.jl:183-185``)."""
        new = SimulationData.from_sim(self.sim, xs=jnp.asarray(coords),
                                      nk=self.nk, featurizer=self.featurizer,
                                      key=key)
        return self.merge(new)

    # ---- adaptive resampling (delegates to sample.py) ------------------

    def resample_strat(self, model, n, keepedges=False, key=None):
        """chi-stratified resampling (reference ``src/simulation.jl:193-207``)."""
        if n == 0:
            return self
        if key is not None:
            ksel, key = jax.random.split(key)
        else:
            ksel = None
        xs = self.chistratcoords(model, n, keepedges=keepedges, key=ksel)
        return self.addcoords(xs, key=key)

    def chistratcoords(self, model, n, keepedges=False, key=None):
        fs = flattenfirst(self._propfeatures)
        cs = flattenfirst(self.propcoords)
        idxs = subsample_inds(model, fs, n, keepedges=keepedges, key=key)
        return cs[idxs]

    def resample_kde(self, model, n, bandwidth=0.02, unique=True, key=None):
        """KDE gap-filling resampling (reference ``src/simulation.jl:217-242``)."""
        from .sample import resample_kde_ash

        if n == 0:
            return self
        ycoords = np.asarray(flattenfirst(self.propcoords))
        if unique:
            sampled = {c.tobytes() for c in np.asarray(self.coords)}
            selinds = np.asarray([i for i, c in enumerate(ycoords)
                                  if c.tobytes() not in sampled], dtype=int)
            if len(selinds) == 0:
                return self
        else:
            selinds = np.arange(ycoords.shape[0])

        chix = model_bucketed(model, self._features)[:, 0]
        chiy = model_bucketed(model, flattenfirst(self._propfeatures)[selinds])[:, 0]
        m1 = min(chix.min(), chiy.min())
        m2 = max(chix.max(), chiy.max())
        chix = (chix - m1) / (m2 - m1)
        chiy = (chiy - m1) / (m2 - m1)

        iy = resample_kde_ash(chix, chiy, n, bandwidth=bandwidth)
        ys = ycoords[selinds[iy]]
        return self.addcoords(ys, key=key)

    def laggedtrajectory(self, n, key=None):
        """n-step lagged trajectory continuing from the last data point
        (reference ``src/simulation.jl:267``)."""
        return self.sim.laggedtrajectory(n, x0=self.coords[-1], key=key)


def mergedata(d1: SimulationData, d2: SimulationData) -> SimulationData:
    return d1.merge(d2)


def addcoords(d: SimulationData, coords, key=None) -> SimulationData:
    return d.addcoords(coords, key=key)


def resample_strat(d, model, n, **kw):
    return d.resample_strat(model, n, **kw)


def resample_kde(d, model, n, **kw):
    return d.resample_kde(model, n, **kw)


# ==========================================================================
# Trajectory-based dataset constructors (reference src/simulation.jl:278-298)
# ==========================================================================

def trajectorydata_linear(sim, steps, reverse=False, key=None, **kwargs):
    """Single long trajectory -> chain data
    (reference ``src/simulation.jl:278-283``)."""
    key = _key(key)
    xs = sim.laggedtrajectory(steps, key=key)
    x, y = data_from_trajectory(xs, reverse=reverse)
    return SimulationData.from_coords(sim, x, y, **kwargs)


def trajectorydata_bursts(sim, steps, nk, x0=None, key=None, **kwargs):
    """Single long trajectory with nk burst samples per frame
    (reference ``src/simulation.jl:291-298``)."""
    key = _key(key)
    k1, k2 = jax.random.split(key)
    if x0 is None:
        x0 = sim.coords
    xs = sim.laggedtrajectory(steps, x0=x0, key=k1)
    ys = sim.propagate(xs, nk, key=k2)
    return SimulationData.from_coords(sim, xs, ys, **kwargs)


# ==========================================================================
# Data export (reference src/data.jl:159-183)
# ==========================================================================

def exportdata(data, model, sim, path="out/data.pdb"):
    """Sort coords by chi, dedupe, save as PDB trajectory
    (reference ``src/data.jl:159-170``)."""
    from .md.pdbio import write_pdb_traj

    dd = np.asarray(values(data))
    dd = dd.reshape(-1, dd.shape[-1])
    ks = np.asarray(model(dd))[:, 0]
    order = np.argsort(ks)
    dd = dd[order]
    _, uniq = np.unique(dd[:, 0], return_index=True)
    dd = dd[np.sort(uniq)]
    write_pdb_traj(path, sim.pdbfile, dd)
    return dd


def exportsorted(iso, path="out/sorted.pdb"):
    """Save all data coords sorted by chi (reference ``src/data.jl:176-183``)."""
    from .md.pdbio import write_pdb_traj
    from .ops.align import aligntrajectory

    chi = np.asarray(iso.chis())[:, 0]
    order = np.argsort(chi)
    xs = np.asarray(iso.data.coords)[order]
    traj = aligntrajectory(xs)
    write_pdb_traj(path, iso.data.pdbfile, np.asarray(traj))
    return path


# ==========================================================================
# helpers
# ==========================================================================

def _key(key):
    if key is None:
        return jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
    if isinstance(key, int):
        return jax.random.PRNGKey(key)
    return key


def _seed(key):
    return None if key is None else int(np.asarray(key)[-1])
