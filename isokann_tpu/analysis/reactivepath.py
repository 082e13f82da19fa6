"""Reactive paths: Onsager-Machlup maximum-likelihood path through samples.

TPU-native rebuild of ``src/utils/reactivepath.jl``: the pairwise aligned
RMSDs run as batched Kabsch on device (``isokann_tpu.ops.align``), the
shortest path via either scipy's sparse Bellman-Ford (host) or a dense
min-plus Bellman-Ford iteration on device — the TPU-natural formulation of
the reference's CUDA kernel (``src/utils/reactivepath.jl:228-296``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.align import aligned_rmsd, aligntrajectory


# ---- endpoint selection methods (reference :82-107) -----------------------

@dataclass
class FromToPath:
    s1: int
    s2: int


@dataclass
class QuantilePath:
    q: float = 0.05


@dataclass
class FullPath:
    pass


@dataclass
class MaxPath:
    pass


def fromto(method, xi):
    xi = np.asarray(xi)
    if isinstance(method, QuantilePath):
        lo = np.quantile(xi, method.q)
        hi = np.quantile(xi, 1 - method.q)
        return np.flatnonzero(xi < lo), np.flatnonzero(xi > hi)
    if isinstance(method, FromToPath):
        return np.asarray([method.s1]), np.asarray([method.s2])
    if isinstance(method, FullPath):
        return np.asarray([0]), np.asarray([len(xi) - 1])
    if isinstance(method, MaxPath):
        return np.asarray([int(np.argmin(xi))]), np.asarray([int(np.argmax(xi))])
    raise TypeError(f"unknown path method {method}")


# ---- time-difference mask (reference :135-156) ------------------------------

def dtmask(xi, minjump=0.0, maxjump=1.0):
    """(i, j, dt) arrays for pairs with minjump < xi_j - xi_i <= maxjump.

    Sorted two-pointer sweep instead of the reference's per-i scan."""
    assert minjump >= 0
    xi = np.asarray(xi)
    p = np.argsort(xi, kind="stable")
    xs = xi[p]
    n = len(xs)
    I, J, V = [], [], []
    for a in range(n):
        # all b > a with dt in (minjump, maxjump]
        b = a
        while b < n:
            dt = xs[b] - xs[a]
            if dt > maxjump:
                break
            if dt > minjump:
                I.append(p[a])
                J.append(p[b])
                V.append(dt)
            b += 1
    return (np.asarray(I, dtype=int), np.asarray(J, dtype=int),
            np.asarray(V, dtype=float))


# ---- Onsager-Machlup log-likelihood (reference :160-169) --------------------

def fin_dim_loglikelihood(dx, dt, sigma, dim):
    dx = np.asarray(dx, dtype=np.float64)
    dt = np.asarray(dt, dtype=np.float64)
    v = dx / dt
    L = (v / sigma) ** 2 / 2
    s = (-dim / 2) * np.log(sigma ** 2 * dt * 2 * np.pi)
    return s - L * dt


# ---- shortest chain (reference :110-133) ------------------------------------

def shortestchain(xs, xi, from_, to, sigma=1.0, minjump=0.0, maxjump=1.0,
                  weights=None, device=False):
    """Maximum-likelihood chain through samples.

    ``xs``: (n, 3N) conformations (row-major); ``xi``: (n,) reaction coord."""
    xs = np.asarray(xs)
    xi = np.asarray(xi).ravel()
    n = len(xi)
    assert xs.shape[0] == n

    i, j, dts = dtmask(xi, minjump, maxjump)
    if len(i) == 0:
        return []

    natoms = xs.shape[1] // 3
    # batched aligned RMSD for the masked pairs (device)
    dxs = np.empty(len(i))
    batch = max(1, int(2e8 // max(xs.itemsize * natoms * 6, 1)))
    for lo in range(0, len(i), batch):
        sl = slice(lo, lo + batch)
        dxs[sl] = np.asarray(aligned_rmsd(
            jnp.asarray(xs[i[sl]].reshape(-1, natoms, 3)),
            jnp.asarray(xs[j[sl]].reshape(-1, natoms, 3)),
            weights=None if weights is None else jnp.asarray(weights),
            flat=False))

    logp = fin_dim_loglikelihood(dxs, dts, sigma, xs.shape[1])
    # raw negative-log-likelihood edge costs, exactly as the reference
    # feeds Bellman-Ford (reactivepath.jl:160-187).  Costs may be
    # NEGATIVE (the per-edge entropy term); the chi-ordered graph is a
    # DAG, so Bellman-Ford is safe.  Do NOT shift to nonnegative: a
    # uniform shift penalizes each edge and biases the argmax-likelihood
    # chain toward degenerate few-frame paths (the round-2 2-frame bug).
    cost = -logp

    if device:
        A = np.full((n, n), np.inf)
        # order-preserving rescale (positive factor): keeps the argmin
        # path exact while conditioning the f32 min-plus iterations
        # (raw OM costs reach ~1e3-1e6 for protein-sized dim)
        A[i, j] = cost / max(np.abs(cost).max(), 1e-30)
        ids = shortestpath_dense_device(A, from_, to)
    else:
        ids = shortestpath_sparse(n, i, j, cost, from_, to)
    return ids


def shortestpath_sparse(n, i, j, w, sources, targets):
    """Host shortest path on the sparse DAG: native C++ CSR Bellman-Ford
    (the host analog of the reference's CUDA kernel, :252-296) with a
    scipy fallback."""
    from scipy.sparse import coo_matrix

    A = coo_matrix((w, (i, j)), shape=(n, n)).tocsr()
    sources = np.asarray(sources)
    targets = np.asarray(targets)
    try:
        from ..native import bellman_ford_csr_native
        dist, parent = bellman_ford_csr_native(
            A.indptr.astype(np.int64), A.indices.astype(np.int64),
            A.data.astype(np.float64), n, sources.astype(np.int64))
        t = int(targets[np.argmin(dist[targets])])
        if not np.isfinite(dist[t]):
            return []
        path = [t]
        while parent[path[-1]] >= 0:
            path.append(int(parent[path[-1]]))
        return path[::-1]
    except ImportError:
        pass

    # bellman_ford, not dijkstra: OM edge costs are legitimately negative
    from scipy.sparse.csgraph import bellman_ford
    dists, pred = bellman_ford(A, directed=True, indices=sources,
                               return_predecessors=True)
    # best (source, target) pair
    sub = dists[:, targets]
    si, ti = np.unravel_index(np.argmin(sub), sub.shape)
    if not np.isfinite(sub[si, ti]):
        return []
    path = [int(targets[ti])]
    while path[-1] != sources[si]:
        p = pred[si, path[-1]]
        if p < 0:
            break
        path.append(int(p))
    return path[::-1]


def bellman_ford_dense(A, sources):
    """Dense min-plus Bellman-Ford on device — the TPU formulation of the
    reference's GPU path (``src/utils/reactivepath.jl:228-245``).

    ``A``: (n, n) cost matrix with inf for missing edges (A[i, j] = cost
    i->j).  Returns (dists, parents)."""
    A = jnp.asarray(A, jnp.float32)
    n = A.shape[0]
    d0 = jnp.full((n,), jnp.inf, jnp.float32).at[jnp.asarray(sources)].set(0.0)
    par0 = jnp.zeros((n,), jnp.int32) - 1

    def body(state):
        d, par, changed, it = state
        nxt = d[:, None] + A                     # (n, n): via i to j
        dd = jnp.min(nxt, axis=0)
        pp = jnp.argmin(nxt, axis=0)
        new = dd + 1e-8 < d
        d = jnp.where(new, dd, d)
        par = jnp.where(new, pp.astype(jnp.int32), par)
        return d, par, jnp.any(new), it + 1

    def cond(state):
        d, par, changed, it = state
        return jnp.logical_and(changed, it < n)

    d, par, _, _ = jax.lax.while_loop(
        cond, body, (d0, par0, jnp.asarray(True), jnp.asarray(0)))
    return d, par


def shortestpath_dense_device(A, sources, targets):
    d, par = bellman_ford_dense(A, np.asarray(sources))
    d = np.asarray(d)
    par = np.asarray(par)
    targets = np.asarray(targets)
    t = int(targets[np.argmin(d[targets])])
    if not np.isfinite(d[t]):
        return []
    path = [t]
    while par[path[-1]] >= 0:
        path.append(int(par[path[-1]]))
    return path[::-1]


def shortestpath(A, sources, targets):
    """Shortest path through a dense cost matrix (inf = no edge)."""
    return shortestpath_dense_device(np.asarray(A), np.atleast_1d(sources),
                                     np.atleast_1d(targets))


# ---- public API (reference :31-78) ------------------------------------------

def _isincreasing(ids):
    ids = np.asarray(ids)
    return np.sum(np.diff(ids) > 0) > len(ids) / 2


def reactive_path(xi, coords, sigma=1.0, minjump=0.0, maxjump=1.0,
                  method=None, normalize=False, sortincreasing=True,
                  weights=None, device=False):
    """Maximum-likelihood path ids through ``coords`` ordered by chi
    (reference ``src/utils/reactivepath.jl:55-68``)."""
    method = method or QuantilePath(0.05)
    xi = np.asarray(xi).ravel()
    coords = np.asarray(coords)
    from_, to = fromto(method, xi)
    nco = coords / np.abs(coords).max() if normalize else coords
    ids = shortestchain(nco, xi, from_, to, sigma=sigma, minjump=minjump,
                        maxjump=maxjump, weights=weights, device=device)
    if sortincreasing and len(ids) > 1 and not _isincreasing(xi[ids]):
        ids = ids[::-1]
    return list(ids)


def save_reactive_path(iso, coords=None, sigma=1.0, maxjump=1.0,
                       out="out/reactive_path.pdb", source=None, chi=None,
                       weights=None, fullcoords=None, **kwargs):
    """Extract, align and save the reactive path
    (reference ``src/utils/reactivepath.jl:31-52``)."""
    import os
    from ..md.pdbio import write_pdb_traj

    if coords is None:
        coords = np.asarray(iso.data.coords)
    if chi is None:
        chi = np.asarray(iso.chicoords(coords)).ravel()
    if weights is None:
        sim = iso.data.sim
        weights = np.repeat(np.asarray(sim.masses()), 3) if hasattr(sim, "masses") else None
    if weights is not None:
        weights = np.asarray(weights)
        if len(weights) == coords.shape[1]:        # per-coordinate -> per-atom
            weights = weights.reshape(-1, 3)[:, 0]
    source = source or iso.data.pdbfile
    fullcoords = coords if fullcoords is None else fullcoords

    ids = reactive_path(chi, coords, sigma=sigma, maxjump=maxjump,
                        weights=weights, **kwargs)
    if len(ids) == 0:
        import warnings
        warnings.warn("The computed reactive path is empty. "
                      "Try adjusting the `sigma` parameter.")
        return ids
    path = aligntrajectory(np.asarray(fullcoords)[ids],
                           weights=None if weights is None else jnp.asarray(weights))
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    write_pdb_traj(out, source, np.asarray(path))
    return ids
