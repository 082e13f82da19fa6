"""Virtual interaction sites (massless particles), TPU-first.

Four-site water models (TIP4P-Ew et al.) and serialized OpenMM systems
place massless charge sites at weighted averages of parent atoms
(OpenMM ``TwoParticleAverageSite``/``ThreeParticleAverageSite``; the
reference inherits them through ``ForceField.createSystem`` whenever a
user passes e.g. ``amber14/tip4pew.xml`` — ``src/simulators/openmm.jl:
130`` forcefields pass-through).

Design (scatter-free, per CLAUDE.md TPU rules):
- *Placement* is an all-atom gather: every atom i carries parent indices
  ``vs_gather[i] = (p1, p2, p3)`` and weights ``vs_w[i]`` — identity
  ``(i, i, i), (1, 0, 0)`` for real atoms — so
  ``x <- w1 x[p1] + w2 x[p2] + w3 x[p3]`` replaces site rows in one
  vectorized pass with no scatter.
- *Force redistribution* is the transpose gather: site forces flow back
  to parents through host-precomputed reverse tables ``vs_rev[i, k]`` =
  k-th site owned by atom i (self-padded, weight 0), so
  ``F_real[i] = F[i] (1 - is_site[i]) + sum_k w_rev[i, k] F[rev[i, k]]``.
  For average sites the placement is linear, so this transpose IS the
  exact chain rule (J^T F) — no autodiff, no scatter-add VJPs.

Integration contract (see ``simulators/mdsim.py``): site masses are
replaced by 1e30 amu in ``masses3`` so integrators leave them in place
(zero Maxwell-Boltzmann velocity, zero force response); force/energy
entry points in ``md/forces.py`` re-place sites from the current parent
positions every evaluation, and propagate/trajectory outputs are
re-placed before returning.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def has_vsites(sys) -> bool:
    vi = getattr(sys, "vs_idx", None)
    return vi is not None and vi.shape[0] > 0


def attach_vsites(system, vs_idx, vs_parents, vs_weights):
    """Return a copy of ``system`` with average-site virtual particles.

    - ``vs_idx`` (nv,): atom index of each site (must be massless in
      spirit; their ``masses`` entries are forced to 0)
    - ``vs_parents`` (nv, <=3): parent atom indices (2 or 3 columns)
    - ``vs_weights`` (nv, same): averaging weights (sum to 1)

    Sites may not parent other sites (OpenMM allows it; unsupported
    here — raises).
    """
    vs_idx = np.asarray(vs_idx, np.int32).reshape(-1)
    vs_parents = np.asarray(vs_parents, np.int32).reshape(len(vs_idx), -1)
    vs_weights = np.asarray(vs_weights, np.float64).reshape(len(vs_idx), -1)
    n = int(system.masses.shape[0])
    nv = len(vs_idx)
    if vs_parents.shape[1] > 3:
        raise ValueError("at most 3 parents per average site")
    if np.isin(vs_parents, vs_idx).any():
        raise ValueError("virtual sites parenting other sites are not "
                         "supported")
    # pad to 3 parents
    pad = 3 - vs_parents.shape[1]
    if pad:
        vs_parents = np.concatenate(
            [vs_parents, np.repeat(vs_parents[:, :1], pad, axis=1)], axis=1)
        vs_weights = np.concatenate(
            [vs_weights, np.zeros((nv, pad))], axis=1)
    if not np.allclose(vs_weights.sum(axis=1), 1.0, atol=1e-6):
        raise ValueError("average-site weights must sum to 1")

    gather = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, 3))
    w = np.zeros((n, 3))
    w[:, 0] = 1.0
    gather[vs_idx] = vs_parents
    w[vs_idx] = vs_weights

    owned = [[] for _ in range(n)]
    for s, (ps, ws) in enumerate(zip(vs_parents, vs_weights)):
        seen = {}
        for p, wt in zip(ps, ws):
            seen[int(p)] = seen.get(int(p), 0.0) + float(wt)
        for p, wt in seen.items():
            if wt != 0.0:
                owned[p].append((int(vs_idx[s]), wt))
    kmax = max((len(o) for o in owned), default=0)
    kmax = max(kmax, 1)
    rev = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, kmax))
    rev_w = np.zeros((n, kmax))
    for i, o in enumerate(owned):
        for k, (s, wt) in enumerate(o):
            rev[i, k] = s
            rev_w[i, k] = wt

    masses = np.asarray(system.masses, np.float64).copy()
    masses[vs_idx] = 0.0
    fdt = system.charges.dtype
    return dataclasses.replace(
        system,
        masses=jnp.asarray(masses, fdt),
        vs_idx=jnp.asarray(vs_idx, jnp.int32),
        vs_gather=jnp.asarray(gather, jnp.int32),
        vs_w=jnp.asarray(w, fdt),
        vs_rev=jnp.asarray(rev, jnp.int32),
        vs_rev_w=jnp.asarray(rev_w, fdt),
    )


def place_vsites(sys, x):
    """Recompute site rows from parent positions; x: (..., n, 3)."""
    if not has_vsites(sys):
        return x
    g = sys.vs_gather
    w = sys.vs_w.astype(x.dtype)
    return (w[:, 0, None] * jnp.take(x, g[:, 0], axis=-2)
            + w[:, 1, None] * jnp.take(x, g[:, 1], axis=-2)
            + w[:, 2, None] * jnp.take(x, g[:, 2], axis=-2))


def place_vsites_flat(sys, xflat):
    if not has_vsites(sys):
        return xflat
    shape = xflat.shape
    x = xflat.reshape(shape[:-1] + (-1, 3))
    return place_vsites(sys, x).reshape(shape)


def redistribute_forces(sys, f):
    """J^T f for the (linear) placement map; f: (..., n, 3).

    Site rows of the result are zero: a site's force has been handed to
    its parents and the site itself carries no mass."""
    if not has_vsites(sys):
        return f
    rev = sys.vs_rev
    rw = sys.vs_rev_w.astype(f.dtype)
    # real atoms are exactly the identity rows of the placement gather
    # (a site never parents itself) — no scatter needed for the mask
    n = f.shape[-2]
    keep = (sys.vs_gather[:, 0] == jnp.arange(n)).astype(f.dtype)
    out = f * keep[:, None]
    for k in range(rev.shape[1]):
        out = out + rw[:, k, None] * jnp.take(f, rev[:, k], axis=-2)
    return out


def redistribute_forces_flat(sys, fflat):
    if not has_vsites(sys):
        return fflat
    shape = fflat.shape
    f = fflat.reshape(shape[:-1] + (-1, 3))
    return redistribute_forces(sys, f).reshape(shape)
