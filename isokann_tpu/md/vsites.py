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


def attach_vsites(system, vs_idx, vs_parents, vs_weights, vs_cross=None):
    """Return a copy of ``system`` with virtual interaction sites.

    - ``vs_idx`` (nv,): atom index of each site (must be massless in
      spirit; their ``masses`` entries are forced to 0)
    - ``vs_parents`` (nv, <=3): parent atom indices (2 or 3 columns)
    - ``vs_weights`` (nv, same): averaging weights (sum to 1 for average
      sites; for out-of-plane sites pass (1 - w12 - w13, w12, w13))
    - ``vs_cross`` (nv,) optional: out-of-plane cross weights [1/nm]
      (OpenMM ``OutOfPlaneSite`` weightCross):
      ``xv = w.x1 + w12 x2 + w13 x3 + wc (x2 - x1) x (x3 - x1)``

    Sites may not parent other sites (OpenMM allows it; unsupported
    here — raises).
    """
    vs_idx = np.asarray(vs_idx, np.int32).reshape(-1)
    vs_parents = np.asarray(vs_parents, np.int32).reshape(len(vs_idx), -1)
    vs_weights = np.asarray(vs_weights, np.float64).reshape(len(vs_idx), -1)
    n = int(system.masses.shape[0])
    nv = len(vs_idx)
    cross = (np.zeros(nv) if vs_cross is None
             else np.asarray(vs_cross, np.float64).reshape(-1))
    if vs_parents.shape[1] > 3:
        raise ValueError("at most 3 parents per average site")
    if np.isin(vs_parents, vs_idx).any():
        raise ValueError("virtual sites parenting other sites are not "
                         "supported")
    if (cross != 0.0).any() and vs_parents.shape[1] != 3:
        raise ValueError("out-of-plane sites need 3 parents")
    # pad to 3 parents
    pad = 3 - vs_parents.shape[1]
    if pad:
        vs_parents = np.concatenate(
            [vs_parents, np.repeat(vs_parents[:, :1], pad, axis=1)], axis=1)
        vs_weights = np.concatenate(
            [vs_weights, np.zeros((nv, pad))], axis=1)
    if not np.allclose(vs_weights.sum(axis=1), 1.0, atol=1e-6):
        raise ValueError("site weights must sum to 1 "
                         "(out-of-plane: pass 1 - w12 - w13 first)")

    gather = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, 3))
    w = np.zeros((n, 3))
    w[:, 0] = 1.0
    gather[vs_idx] = vs_parents
    w[vs_idx] = vs_weights
    has_oop = bool((cross != 0.0).any())
    wc = np.zeros(n)
    if has_oop:
        wc[vs_idx] = cross

    owned = [[] for _ in range(n)]
    for s, (ps, ws) in enumerate(zip(vs_parents, vs_weights)):
        if has_oop and cross[s] != 0.0:
            # keep slots distinct: the cross-term transpose needs to know
            # which parent position each reverse entry occupies
            for slot, (p, wt) in enumerate(zip(ps, ws), start=1):
                owned[int(p)].append((int(vs_idx[s]), float(wt), slot))
            continue
        seen = {}
        for p, wt in zip(ps, ws):
            seen[int(p)] = seen.get(int(p), 0.0) + float(wt)
        for p, wt in seen.items():
            if wt != 0.0:
                owned[p].append((int(vs_idx[s]), wt, 0))
    kmax = max((len(o) for o in owned), default=0)
    kmax = max(kmax, 1)
    rev = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, kmax))
    rev_w = np.zeros((n, kmax))
    rev_slot = np.zeros((n, kmax), np.int32)
    for i, o in enumerate(owned):
        for k, (s, wt, slot) in enumerate(o):
            rev[i, k] = s
            rev_w[i, k] = wt
            rev_slot[i, k] = slot

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
        vs_wc=jnp.asarray(wc if has_oop else np.zeros(0), fdt),
        vs_rev_slot=jnp.asarray(rev_slot if has_oop
                                else np.zeros((0, 0), np.int32), jnp.int32),
    )


def _has_oop(sys) -> bool:
    wc = getattr(sys, "vs_wc", None)
    return wc is not None and wc.shape[0] > 0


def place_vsites(sys, x):
    """Recompute site rows from parent positions; x: (..., n, 3)."""
    if not has_vsites(sys):
        return x
    g = sys.vs_gather
    w = sys.vs_w.astype(x.dtype)
    x1 = jnp.take(x, g[:, 0], axis=-2)
    x2 = jnp.take(x, g[:, 1], axis=-2)
    x3 = jnp.take(x, g[:, 2], axis=-2)
    out = w[:, 0, None] * x1 + w[:, 1, None] * x2 + w[:, 2, None] * x3
    if _has_oop(sys):
        # identity rows have x1 == x2 == x3 -> zero cross term
        wc = sys.vs_wc.astype(x.dtype)
        out = out + wc[:, None] * jnp.cross(x2 - x1, x3 - x1)
    return out


def place_vsites_flat(sys, xflat):
    if not has_vsites(sys):
        return xflat
    shape = xflat.shape
    x = xflat.reshape(shape[:-1] + (-1, 3))
    return place_vsites(sys, x).reshape(shape)


def redistribute_forces(sys, f, x=None):
    """J^T f of the placement map; f: (..., n, 3).

    Site rows of the result are zero: a site's force has been handed to
    its parents and the site itself carries no mass.  For average sites
    the map is linear and the precomputed reverse tables ARE the
    transpose; out-of-plane sites add the coordinate-dependent cross
    terms (``x`` required then — parent positions, placed or raw):

        F1 += (1-w12-w13) Fv - wc (d13 x Fv) - wc (Fv x d12)
        F2 += w12 Fv + wc (d13 x Fv)
        F3 += w13 Fv + wc (Fv x d12)
    """
    if not has_vsites(sys):
        return f
    rev = sys.vs_rev
    rw = sys.vs_rev_w.astype(f.dtype)
    # real atoms are exactly the identity rows of the placement gather
    # (a site never parents itself) — no scatter needed for the mask
    n = f.shape[-2]
    keep = (sys.vs_gather[:, 0] == jnp.arange(n)).astype(f.dtype)
    out = f * keep[:, None]
    oop = _has_oop(sys)
    if oop and x is None:
        raise ValueError("out-of-plane sites: redistribute_forces needs "
                         "the coordinates")
    if oop:
        g = sys.vs_gather
        wc = sys.vs_wc.astype(f.dtype)
        x1 = jnp.take(x, g[:, 0], axis=-2)
        d12_all = jnp.take(x, g[:, 1], axis=-2) - x1
        d13_all = jnp.take(x, g[:, 2], axis=-2) - x1
    for k in range(rev.shape[1]):
        s = rev[:, k]
        Fv = jnp.take(f, s, axis=-2)
        out = out + rw[:, k, None] * Fv
        if oop:
            slot = sys.vs_rev_slot[:, k]
            wcs = jnp.take(wc, s)
            d12 = jnp.take(d12_all, s, axis=-2)
            d13 = jnp.take(d13_all, s, axis=-2)
            c2 = jnp.cross(d13, Fv)
            c3 = jnp.cross(Fv, d12)
            term = jnp.where(
                (slot == 1)[:, None], -(c2 + c3),
                jnp.where((slot == 2)[:, None], c2,
                          jnp.where((slot == 3)[:, None], c3, 0.0)))
            out = out + wcs[:, None] * term
    return out


def redistribute_forces_flat(sys, fflat, xflat=None):
    if not has_vsites(sys):
        return fflat
    shape = fflat.shape
    f = fflat.reshape(shape[:-1] + (-1, 3))
    x = None if xflat is None else xflat.reshape(shape[:-1] + (-1, 3))
    return redistribute_forces(sys, f, x).reshape(shape)
