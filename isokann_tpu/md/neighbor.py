"""TPU-native cell-list neighbor engine for large periodic systems.

The dense all-pairs nonbonded path (``md/forces.py``) materializes (n, n)
tensors — ideal up to a few thousand atoms, impossible beyond.  This module
is the O(n) replacement the reference gets from OpenMM's neighbor-list
CutoffPeriodic kernels (``src/simulators/mopenmm.py:101-115``), redesigned
for XLA/TPU:

- **static shapes everywhere**: the box is tiled into cells of edge >=
  cutoff; each cell holds at most ``C`` atoms (padded, sentinel-indexed),
  and the 27-cell stencil is a precomputed (ncells, S) table.  Atom->cell
  assignment is one sort + one scatter per rebuild (rebuilt every step —
  cheap next to the pair math, and no skin bookkeeping).
- **cell-blocked pair sweep**: a ``fori_loop`` over the S stencil offsets
  processes (ncells, C, C) pair blocks — peak memory O(n * C), fully
  vectorized elementwise VPU work, no data-dependent shapes.
- **analytic forces** (no autodiff): gathers run forward-only, avoiding
  the scatter-heavy VJPs that are poison for the TPU compiler (the same
  reasoning as ``md/gbsa_force.py``).
- **exception corrections**: the pair sweep treats every pair as a full
  interaction; the sparse exception list (``MDSystem.excl_idx/qq/lj``)
  subtracts excluded/1-4 pairs and adds their scaled straight-Coulomb/LJ
  terms — numerically identical to the dense path's scale matrices.

Supported methods: CutoffPeriodic (minimum-image reaction field — what the
reference's "auto" rule selects for boxed systems), and the real-space part
of Ewald/PME/LJPME (erfc-damped Coulomb; the reciprocal-space sum runs as
structure-factor matmuls in ``md/ewald.py``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .system import MDSystem, COULOMB


def _round_up(x, m):
    return ((x + m - 1) // m) * m


class NeighborPlan:
    """Static cell-grid data for a (box, cutoff, natoms) combination.

    ``x0`` (optional, (natoms, 3)): coordinates used to size the per-cell
    capacity (1.5x the observed max occupancy; ``MDSimulation`` auto-regrows
    the plan if density drift ever overflows a cell — pair work scales with
    capacity^2, so tighter margins are faster but v5e showed kernel
    instability at some block geometries, keep the default unless measured);
    without it a density heuristic is used.  ``capacity`` overrides both.
    """

    def __init__(self, sys: MDSystem, x0=None, capacity: int = None,
                 margin: float = 1.5, cell_div: int = None,
                 cells=None, box_slack: float = 0.0, cutoff: float = None):
        # ``cutoff`` overrides the system cutoff — the Verlet-list mode
        # (md/verlet.py) builds its candidate grid at cutoff + skin
        # box_slack > 0 builds the stencil as if every cell edge were
        # (1 - box_slack) shorter, so the static offset table stays valid
        # while a traced NPT box shrinks up to that fraction
        # (docs/npt_design.md); capacity margins already absorb the
        # density change.
        self.box_slack = float(box_slack)
        if sys.method not in ("CutoffPeriodic", "Ewald", "PME", "LJPME") \
                or sys.box is None:
            raise ValueError("neighbor engine requires a periodic cutoff "
                             "method (CutoffPeriodic/Ewald/PME/LJPME) + box")
        self.box = np.asarray(sys.box, np.float64)
        self.cutoff = float(cutoff) if cutoff is not None else \
            float(sys.cutoff)
        if not self.cutoff < float(self.box.min()) / 2:
            # outside the minimum-image invariant the stencil dedupe can
            # silently drop cross-cell pairs or double-count the self cell
            raise ValueError(
                f"neighbor engine requires cutoff < min(box)/2 "
                f"(cutoff={self.cutoff}, box={tuple(self.box)})")
        self.natoms = int(sys.natoms)

        def config(div):
            """Grid geometry + pruned stencil offsets.  ``div`` is either
            a scalar (cells of edge >= cutoff/div on every axis) or a
            per-axis cell-count triple — anisotropic grids, including
            collapsed axes (nc_i = 1 = one slab spanning the axis), trade
            slot-padding variance against stencil overcoverage and
            per-block dispatch overhead."""
            if np.ndim(div) == 1:
                nc = np.maximum(np.asarray(div, int), 1)
            else:
                nc = np.maximum(np.floor(self.box * div / self.cutoff),
                                1.0).astype(int)
            edge = self.box / nc
            Rd = np.minimum(np.ceil(self.cutoff / edge - 1e-9).astype(int),
                            nc)
            def canon(o):
                """Canonical wrapped offset in [-nc//2, (nc-1)//2]."""
                return tuple(int((v + n // 2) % n - n // 2)
                             for v, n in zip(o, nc))

            offs = []
            for ox in range(-Rd[0], Rd[0] + 1):
                for oy in range(-Rd[1], Rd[1] + 1):
                    for oz in range(-Rd[2], Rd[2] + 1):
                        o = canon((ox, oy, oz))
                        shrunk = edge * (1.0 - getattr(self, "box_slack", 0.0))
                        sep = np.array([max(abs(o[0]) - 1, 0) * shrunk[0],
                                        max(abs(o[1]) - 1, 0) * shrunk[1],
                                        max(abs(o[2]) - 1, 0) * shrunk[2]])
                        if np.dot(sep, sep) < self.cutoff ** 2:
                            offs.append(o)
            # dedupe offsets that wrap onto the same cell (small/collapsed
            # axes) — canonical form makes aliases identical
            uniq = list(dict.fromkeys(offs))
            # Newton's third law: pair (o, -o) visited once, self separate —
            # valid only when no offset aliases its own negation
            newton = all(canon([-v for v in o]) != o
                         for o in uniq if o != (0, 0, 0))
            half = [o for o in uniq if o > (0, 0, 0)] if newton else \
                   [o for o in uniq if o != (0, 0, 0)]
            return nc, edge, half, newton

        def occupancy(nc, edge):
            if x0 is None:
                return margin * self.natoms / np.prod(nc) + 8
            xw = np.asarray(x0, np.float64).reshape(-1, 3)
            xw = xw - self.box * np.floor(xw / self.box)
            cd = np.minimum((xw / edge).astype(int), nc - 1)
            cid = (cd[:, 0] * nc[1] + cd[:, 1]) * nc[2] + cd[:, 2]
            return margin * np.bincount(cid, minlength=np.prod(nc)).max()

        if cell_div is None:
            # pick the cheaper grid by the pair-block cost model
            best = None
            # candidates per axis: coarse (edge >= cutoff), fine (2x),
            # and a collapsed slab; anisotropic combinations let dense
            # uniform systems trade slot-padding variance and per-block
            # dispatch overhead against stencil overcoverage (measured on
            # v5e: the sweep kernel is dispatch/DMA-latency bound at
            # ~14 us per (cell, offset) grid step, so fewer, larger
            # blocks win well past the pure pair-count optimum)
            PER_STEP_OVERHEAD = 40_000      # pair-equivalents per grid step
            C_MAX = 768                     # VMEM bound: the kernel's
                                            # (C, C) pair intermediates
                                            # must fit the 64 MB budget
            axis_cands = []
            for L in self.box:
                f = max(1, int(math.floor(L / self.cutoff)))
                axis_cands.append(sorted({1, f, 2 * f}))
            for nx in axis_cands[0]:
                for ny in axis_cands[1]:
                    for nz in axis_cands[2]:
                        nc, edge, half, newton = config((nx, ny, nz))
                        C = _round_up(
                            max(int(math.ceil(occupancy(nc, edge))), 4), 4)
                        if C > C_MAX:
                            continue
                        steps = np.prod(nc) * (len(half) + 1)
                        work = (C * C * (len(half)
                                         * (0.5 if newton else 1.0) + 1)
                                * np.prod(nc)
                                + steps * PER_STEP_OVERHEAD)
                        if best is None or work < best[0]:
                            best = (work, (nx, ny, nz))
            if best is None:     # every candidate over the VMEM bound:
                best = (0, tuple(2 * max(1, int(math.floor(
                    L / self.cutoff))) for L in self.box))
            cell_div = best[1]
        if cells is not None:
            cell_div = tuple(int(c) for c in cells)
        self.cell_div = cell_div

        self.nc, self.cell, half, self.newton = config(cell_div)
        self.ncells = int(np.prod(self.nc))
        grid = np.stack(np.meshgrid(*[np.arange(n) for n in self.nc],
                                    indexing="ij"), axis=-1).reshape(-1, 3)

        def cells_of(o):
            nb = (grid + list(o)) % self.nc
            return ((nb[:, 0] * self.nc[1] + nb[:, 1]) * self.nc[2]
                    + nb[:, 2]).astype(np.int32)

        # per half-offset: candidate cell c+o, and the inverse permutation
        # (static!) used to add the reaction force back without a scatter
        cand = np.stack([cells_of(o) for o in half], axis=1) if half else \
            np.zeros((self.ncells, 0), np.int32)
        inv = np.empty_like(cand)
        for s in range(cand.shape[1]):
            inv[cand[:, s], s] = np.arange(self.ncells, dtype=np.int32)
        self.stencil = jnp.asarray(cand)      # (ncells, S) neighbor cells
        self.stencil_inv = jnp.asarray(inv)   # inverse permutations
        self.S = cand.shape[1]

        if capacity is None:
            capacity = int(math.ceil(occupancy(self.nc, self.cell)))
        self.C = _round_up(max(capacity, 8), 8)

        # hard exclusions (1-2/1-3: zero target weight) are masked *inside*
        # the pair sweep — their full-pair LJ at bonded distances is ~1e6
        # kJ/mol, and subtract-style correction would lose ~6 digits to f32
        # cancellation.  (n, E) partner table, padded with -1.
        eidx = np.asarray(sys.excl_idx)
        eqq = np.asarray(sys.excl_qq)
        elj = np.asarray(sys.excl_lj)
        hard = (eqq == 0.0) & (elj == 0.0)
        partners = [[] for _ in range(self.natoms)]
        for (a, b) in eidx[hard]:
            partners[a].append(b)
            partners[b].append(a)
        self.n_soft = int((~hard).sum())   # 1-4 pairs handled by correction

        # bitmask encoding of the hard exclusions: bit k of bits[i] is set
        # iff atom i+k+1 is a hard partner of i.  Almost all hard
        # exclusions are index-local (intra-residue / backbone-adjacent);
        # a pair test is then ~6 int ops instead of E compares.  The rare
        # far partners (e.g. disulfide SG-SG across the chain) go to a
        # narrow explicit table.
        WIN = 32
        bits = np.zeros(self.natoms + 1, np.int32)
        farp = [[] for _ in range(self.natoms)]
        for (a, b) in eidx[hard]:
            lo, hi = (int(a), int(b)) if a < b else (int(b), int(a))
            d = hi - lo
            if 1 <= d <= WIN:
                bits[lo] |= np.int32(1 << (d - 1)) if d < 32 else np.int32(-2147483648)
            else:
                farp[lo].append(hi)
                farp[hi].append(lo)
        E2 = max(1, max((len(p) for p in farp), default=1))
        far = np.full((self.natoms + 1, E2), -1, np.int32)
        for a, p in enumerate(farp):
            far[a, :len(p)] = p
        self.excl_bits = jnp.asarray(bits)      # (n+1,) int32, sentinel 0
        self.excl_far = jnp.asarray(far)        # (n+1, E2)
        self.excl_win = WIN

    def _cell_id_np(self, x):
        xw = np.asarray(x, np.float64).reshape(-1, 3)
        xw = xw - self.box * np.floor(xw / self.box)
        cd = np.minimum((xw / self.cell).astype(int), self.nc - 1)
        return (cd[:, 0] * self.nc[1] + cd[:, 1]) * self.nc[2] + cd[:, 2]

    # ---- device-side table construction ---------------------------------

    def cell_id(self, xw, box=None):
        """(n, 3) wrapped coords -> (n,) cell ids.  ``box`` optionally
        overrides the static box with a traced value (the cell edge then
        traces as box/nc while the grid shape stays static — the NPT
        hook, docs/npt_design.md)."""
        cell = (jnp.asarray(self.cell, xw.dtype) if box is None
                else jnp.asarray(box, xw.dtype)
                / jnp.asarray(self.nc, xw.dtype))
        cd = jnp.clip((xw / cell).astype(jnp.int32), 0,
                      jnp.asarray(self.nc - 1, jnp.int32))
        return (cd[:, 0] * self.nc[1] + cd[:, 1]) * self.nc[2] + cd[:, 2]

    def sorted_frame(self, xw, box=None):
        """Scatter-free cell table in the *sorted* frame.

        TPU scatters serialize; everything here is sorts, searchsorted and
        gathers.  Returns ``(order, table, pos, overflow)``:
        - ``order`` (n,): original index of the k-th cell-sorted atom;
        - ``table`` (ncells, C): *sorted-frame* indices of each cell's
          atoms (= start[c] + slot, so pure vector math; sentinel n);
        - ``pos`` (n,): flat (cell, slot) position of sorted atom k — the
          gather-back map from the per-slot force accumulator.
        """
        n, C = self.natoms, self.C
        cid = self.cell_id(xw, box=box)
        order = jnp.argsort(cid)
        scid = cid[order]
        cells = jnp.arange(self.ncells, dtype=scid.dtype)
        start = jnp.searchsorted(scid, cells, side="left").astype(jnp.int32)
        end = jnp.searchsorted(scid, cells, side="right").astype(jnp.int32)
        slots = jnp.arange(C, dtype=jnp.int32)
        table = start[:, None] + slots[None, :]
        table = jnp.where(table < end[:, None], table, n)
        rank = jnp.arange(n, dtype=jnp.int32) - jnp.searchsorted(
            scid, scid, side="left").astype(jnp.int32)
        ok = rank < C
        pos = jnp.where(ok, scid.astype(jnp.int32) * C + rank,
                        self.ncells * C)
        return order, table, pos, jnp.sum(~ok)

    def table(self, xw):
        """(ncells, C) *original-frame* atom-index table (sentinel =
        natoms) + overflow count (diagnostic view of ``sorted_frame``)."""
        order, table, _, dropped = self.sorted_frame(xw)
        opad = jnp.concatenate(
            [order.astype(jnp.int32), jnp.full((1,), self.natoms, jnp.int32)])
        return opad[table], dropped

    def overflow(self, x):
        """Dropped-atom count for coordinates ``x`` (diagnostic; must be 0
        for correct forces — enlarge ``capacity`` otherwise).  Pure host
        numpy, so it is cheap to call after every propagation."""
        xf = np.asarray(x).reshape(-1, self.natoms, 3)
        worst = 0
        for xi in xf:
            occ = np.bincount(self._cell_id_np(xi), minlength=self.ncells)
            worst = max(worst, int(np.maximum(occ - self.C, 0).sum()))
        return worst


# ==========================================================================
# Pair math (identical formulas to forces.nonbonded_energy, RF method)
# ==========================================================================

def _rf_consts(sys):
    rc = sys.cutoff
    krf = (1.0 / rc ** 3) * (sys.eps_rf - 1.0) / (2.0 * sys.eps_rf + 1.0)
    crf = (1.0 / rc) * (3.0 * sys.eps_rf) / (2.0 * sys.eps_rf + 1.0)
    return rc, krf, crf


def _pair_terms(r2, qq, rmin, epsij, krf, crf):
    """Full-pair RF energy and dE/dr2 from squared distance (elementwise;
    one rsqrt, the rest multiplies — the sweep is VPU-bound)."""
    inv_r = jax.lax.rsqrt(r2)
    inv_r2 = inv_r * inv_r
    x6 = (rmin * rmin * inv_r2) ** 3
    e_lj = epsij * (x6 * x6 - 2.0 * x6)
    g_lj = 6.0 * epsij * (x6 - x6 * x6) * inv_r2
    e_c = qq * (inv_r + krf * r2 - crf)
    g_c = qq * (-0.5 * inv_r2 * inv_r) + qq * krf
    return e_lj + e_c, g_lj + g_c


_SQRT_PI = math.sqrt(math.pi)


def _pair_terms_ewald(r2, qq, rmin, epsij, alpha):
    """Full-pair Ewald real-space (erfc) energy and dE/dr2.  Uses the A&S
    polynomial erfc (``ewald.erfc_approx``) — exp/mul only, so the same
    expression runs inside the Pallas kernel."""
    from .ewald import erfc_approx
    inv_r = jax.lax.rsqrt(r2)
    inv_r2 = inv_r * inv_r
    x6 = (rmin * rmin * inv_r2) ** 3
    e_lj = epsij * (x6 * x6 - 2.0 * x6)
    g_lj = 6.0 * epsij * (x6 - x6 * x6) * inv_r2
    r = r2 * inv_r
    er = erfc_approx(alpha * r)
    gauss = jnp.exp(-(alpha * alpha) * r2)
    e_c = qq * er * inv_r
    # d(erfc(ar)/r)/dr = -erfc/r^2 - (2a/sqrt(pi)) e^{-a^2 r^2}/r
    g_c = -qq * (0.5 * er * inv_r2 * inv_r
                 + (alpha / _SQRT_PI) * gauss * inv_r2)
    return e_lj + e_c, g_lj + g_c


# ==========================================================================
# Neighbor sweep: energy and analytic forces
# ==========================================================================

def _padded_params(sys):
    zero = jnp.zeros((1,), sys.charges.dtype)
    q = jnp.concatenate([sys.charges, zero])
    rm = jnp.concatenate([sys.rmin_half, zero])
    ep = jnp.concatenate([sys.eps, zero])
    return q, rm, ep


def _sweep(sys: MDSystem, plan: NeighborPlan, x, want_force: bool,
           box=None):
    """Cell-blocked pair sweep over the stencil, entirely in the sorted
    frame — sorts and gathers only, zero scatters (TPU scatters
    serialize).  The self-cell block runs with a full i!=j mask; each
    (o, -o) offset pair is visited once, with the reaction force returned
    to the j-cells through a *static* inverse-permutation gather (Newton's
    third law without a scatter).  ``x``: (natoms, 3) (unwrapped).
    Returns force (natoms, 3) or energy scalar."""
    dtype = x.dtype
    n = plan.natoms
    box = jnp.asarray(plan.box if box is None else box, dtype)
    rc, krf, crf = _rf_consts(sys)
    xw = x - box * jnp.floor(x / box)
    order, table, pos, _ = plan.sorted_frame(xw, box=box)

    def pad_row(a, fill=0.0):
        return jnp.concatenate(
            [a[order], jnp.full((1,) + a.shape[1:], fill, a.dtype)])

    q, rm, ep = sys.charges, sys.rmin_half, sys.eps
    xs = pad_row(xw)                                  # sorted coords + pad
    qs, rms, eps_ = pad_row(q), pad_row(rm), pad_row(ep)
    if sys.method == "LJPME":
        q6s = pad_row(sys.q6)
    oid = jnp.concatenate([order.astype(jnp.int32),
                           jnp.full((1,), -2, jnp.int32)])
    bits_s = jnp.concatenate([plan.excl_bits[:n][order],
                              jnp.zeros((1,), jnp.int32)])
    far_s = jnp.concatenate([plan.excl_far[:n][order],
                             jnp.full((1, plan.excl_far.shape[1]), -1,
                                      jnp.int32)])

    pos_i = xs[table]                                 # (ncells, C, 3)
    q_i, rm_i, ep_i = qs[table], rms[table], eps_[table]
    if sys.method == "LJPME":
        q6_i = q6s[table]
    oid_i = oid[table]
    bits_i = bits_s[table]
    far_i = far_s[table]                              # (ncells, C, E2)
    WIN = plan.excl_win

    def block(tj):
        """Pair terms of the i-blocks (= ``table``) against j-blocks
        ``tj``: masked (e, g, d) with g pre-multiplied by the mask."""
        pos_j = xs[tj]
        d = pos_i[:, :, None, :] - pos_j[:, None, :, :]
        d = d - box * jnp.round(d / box)              # minimum image
        r2 = jnp.sum(d * d, axis=-1) + 1e-12
        oid_j = oid[tj]                               # original ids
        # hard exclusions: bit d-1 of the lower atom's window mask
        # (index-local pairs), plus the narrow far-partner table
        dd = oid_j[:, None, :] - oid_i[:, :, None]
        fwd = ((dd >= 1) & (dd <= WIN)
               & (((bits_i[:, :, None] >> jnp.clip(dd - 1, 0, 31)) & 1) == 1))
        bwd = ((dd <= -1) & (dd >= -WIN)
               & (((bits_s[tj][:, None, :]
                    >> jnp.clip(-dd - 1, 0, 31)) & 1) == 1))
        excluded = fwd | bwd | jnp.any(
            far_i[:, :, None, :] == oid_j[:, None, :, None], axis=-1)
        maskb = ((r2 < rc * rc)
                 & (table[:, :, None] != tj[:, None, :]) & ~excluded
                 & (tj[:, None, :] < n) & (table[:, :, None] < n))
        # keep the pair math NaN/overflow-free on masked slots
        r2s = jnp.where(maskb, r2, 1.0)
        qq = COULOMB * q_i[:, :, None] * qs[tj][:, None, :]
        rmin = rm_i[:, :, None] + rms[tj][:, None, :]
        epsij = jnp.sqrt(ep_i[:, :, None] * eps_[tj][:, None, :])
        if sys.method in ("Ewald", "PME", "LJPME"):
            e, g = _pair_terms_ewald(r2s, qq, rmin, epsij, sys.ewald_alpha)
            if sys.method == "LJPME":
                # real-space dispersion h-term (cancels the k-space
                # contribution for in-cutoff pairs; md/ewald.py)
                from .ewald import ljpme_hker_grad
                c6 = q6_i[:, :, None] * q6s[tj][:, None, :]
                h, dh = ljpme_hker_grad(r2s, sys.ljpme_beta)
                e = e + c6 * h
                g = g + c6 * dh
        else:
            e, g = _pair_terms(r2s, qq, rmin, epsij, krf, crf)
        mask = maskb.astype(dtype)
        return e * mask, g * mask, d

    wcross = 1.0 if plan.newton else 0.5

    if want_force:
        e0, g0, d0 = block(table)                     # self cell
        acc = jnp.sum((-2.0 * g0)[..., None] * d0, axis=2)

        def offset_term(s, acc):
            tj = table[plan.stencil[:, s]]
            e, g, d = block(tj)
            gd = (-2.0 * g)[..., None] * d
            acc = acc + jnp.sum(gd, axis=2)           # force on i-block
            if plan.newton:
                # reaction on the j-block, returned to its cell by the
                # static inverse permutation (gather, not scatter)
                fj = -jnp.sum(gd, axis=1)             # (ncells, C, 3)
                acc = acc + fj[plan.stencil_inv[:, s]]
            return acc

        if plan.S:      # fori_loop traces its body even for 0 trips
            acc = jax.lax.fori_loop(0, plan.S, offset_term, acc)
        f_sorted = acc.reshape(-1, 3)[pos]            # (n, 3), sorted frame
        return f_sorted[jnp.argsort(order)]

    e0 = 0.5 * jnp.sum(block(table)[0])

    def offset_energy(s, acc):
        tj = table[plan.stencil[:, s]]
        return acc + wcross * jnp.sum(block(tj)[0])

    if plan.S == 0:
        return e0
    return jax.lax.fori_loop(0, plan.S, offset_energy, e0)


def _exception_terms(sys: MDSystem, x, want_force: bool, box=None):
    """Sparse 1-4 corrections: subtract the full-pair term the sweep added,
    add the target scaled straight-Coulomb + LJ (dense-path semantics,
    ``forces.nonbonded_energy``).  Hard (1-2/1-3) exclusions are masked
    inside the sweep and contribute nothing here."""
    if sys.excl_idx.shape[0] == 0:
        return (jnp.zeros_like(x) if want_force
                else jnp.zeros((), x.dtype))
    dtype = x.dtype
    box = jnp.asarray(sys.box if box is None else box, dtype)
    rc, krf, crf = _rf_consts(sys)
    i, j = sys.excl_idx[:, 0], sys.excl_idx[:, 1]
    soft = ((sys.excl_qq > 0) | (sys.excl_lj > 0)).astype(dtype)
    d = x[i] - x[j]
    d = d - box * jnp.round(d / box)
    r2 = jnp.sum(d * d, axis=-1) + 1e-12
    inv_r2 = 1.0 / r2
    r = jnp.sqrt(r2)
    inv_r = 1.0 / r
    qq = COULOMB * sys.charges[i] * sys.charges[j]
    rmin = sys.rmin_half[i] + sys.rmin_half[j]
    epsij = jnp.sqrt(sys.eps[i] * sys.eps[j])
    x6 = (rmin * rmin * inv_r2) ** 3
    e_lj = epsij * (x6 * x6 - 2.0 * x6)
    g_lj = 6.0 * epsij * (x6 - x6 * x6) * inv_r2
    within = (r < rc).astype(dtype)

    if sys.method in ("Ewald", "PME", "LJPME"):
        # Ewald exception semantics: the reciprocal sum contains EVERY
        # pair (qq erf(ar)/r), the sweep added full erfc pairs for soft
        # (1-4) exceptions only.  Correction per exception pair:
        #   + excl_qq * qq / r              (target 1-4 straight Coulomb)
        #   - qq erf(ar)/r                  (remove reciprocal part)
        #   - soft*within * qq erfc(ar)/r  (remove sweep's real part)
        #   + soft * (excl_lj - within) * E_LJ
        # LJPME adds the dispersion h-term for hard-excluded pairs (the
        # sweep masked them, but the k-space sum still contains them).
        from jax.scipy.special import erf
        al = sys.ewald_alpha
        erf_ar = erf(al * r)
        erfc_ar = 1.0 - erf_ar
        gauss = jnp.exp(-(al * r) ** 2)
        two_a = 2.0 * al / _SQRT_PI
        e = (qq * (sys.excl_qq - erf_ar - soft * within * erfc_ar) * inv_r
             + soft * (sys.excl_lj - within) * e_lj)
        g = None
        if want_force:
            dEdr_c = qq * (-sys.excl_qq * inv_r2
                           - two_a * gauss * inv_r + erf_ar * inv_r2
                           + soft * within * (two_a * gauss * inv_r
                                              + erfc_ar * inv_r2))
            g = (0.5 * dEdr_c * inv_r
                 + soft * (sys.excl_lj - within) * g_lj)
        if sys.method == "LJPME":
            from .ewald import ljpme_hker_grad
            c6 = sys.q6[i] * sys.q6[j]
            h, dh = ljpme_hker_grad(r2, sys.ljpme_beta)
            hard_in = (1.0 - soft) * within
            e = e + hard_in * c6 * h
            if want_force:
                g = g + hard_in * c6 * dh
        if not want_force:
            return jnp.sum(e)
        gd = (-2.0 * g)[:, None] * d
        return jnp.zeros_like(x).at[i].add(gd).at[j].add(-gd)

    e_full, g_full = _pair_terms(r2, qq, rmin, epsij, krf, crf)
    # target: scaled straight Coulomb + scaled LJ (no RF, no cutoff)
    e = soft * (sys.excl_qq * qq * inv_r + sys.excl_lj * e_lj
                - within * e_full)
    if not want_force:
        return jnp.sum(e)
    g = soft * (sys.excl_qq * qq * (-0.5 * inv_r2 * inv_r)
                + sys.excl_lj * g_lj - within * g_full)
    gd = (-2.0 * g)[:, None] * d
    f = jnp.zeros_like(x).at[i].add(gd).at[j].add(-gd)
    return f


def _default_plan(sys, x):
    """Plan for ad-hoc calls: capacity from the coordinates when they are
    concrete, a generous density heuristic when traced (inside jit/vmap
    the plan must not depend on values)."""
    if isinstance(x, jax.core.Tracer):
        return NeighborPlan(sys, margin=2.5)
    return NeighborPlan(sys, x0=np.asarray(x).reshape(-1, 3)[:sys.natoms])


def _ewald_tables(sys, box):
    if box is None:
        return sys.ewald_kvecs, sys.ewald_coefs
    from .ewald import ewald_tables_for_box
    return ewald_tables_for_box(sys, box)


def _ljpme_tables(sys, box):
    if box is None:
        return sys.ewald_kvecs, sys.ljpme_coefs
    from .ewald import ljpme_tables_for_box
    return ljpme_tables_for_box(sys, box)


def neighbor_nonbonded_energy(sys: MDSystem, x, plan: NeighborPlan = None,
                              box=None):
    """O(n) nonbonded energy; matches ``forces.nonbonded_energy`` on
    periodic cutoff systems (RF or Ewald/PME).  ``x``: (natoms, 3).
    ``box`` optionally overrides the static box with a traced value (NPT;
    build the plan with ``box_slack`` covering the expected shrink)."""
    plan = plan or _default_plan(sys, x)
    e = (_sweep(sys, plan, x, False, box=box)
         + _exception_terms(sys, x, False, box=box))
    if sys.method in ("Ewald", "PME", "LJPME"):
        from .ewald import ewald_recip_energy, ewald_self_energy
        kv, cf = _ewald_tables(sys, box)
        e = (e + ewald_recip_energy(kv, cf, sys.charges, x)
             + ewald_self_energy(sys.ewald_alpha, sys.charges))
    if sys.method == "LJPME":
        from .ewald import ewald_recip_energy, ljpme_const_energy
        kv6, cf6 = _ljpme_tables(sys, box)
        e = (e + ewald_recip_energy(kv6, cf6, sys.q6, x)
             + ljpme_const_energy(sys, box=box))
    return e


def neighbor_nonbonded_force(sys: MDSystem, x, plan: NeighborPlan = None,
                             box=None):
    """O(n) analytic nonbonded forces (no autodiff).  ``x``: (natoms, 3)."""
    plan = plan or _default_plan(sys, x)
    f = (_sweep(sys, plan, x, True, box=box)
         + _exception_terms(sys, x, True, box=box))
    if sys.method in ("Ewald", "PME", "LJPME"):
        from .ewald import ewald_recip_force
        kv, cf = _ewald_tables(sys, box)
        f = f + ewald_recip_force(kv, cf, sys.charges, x)
    if sys.method == "LJPME":
        from .ewald import ewald_recip_force
        kv6, cf6 = _ljpme_tables(sys, box)
        f = f + ewald_recip_force(kv6, cf6, sys.q6, x)
    return f


# ==========================================================================
# Sparse (gather-based) bonded terms — for systems without the dense
# incidence matrices.  Analytic gradients identical to the hand-derived
# difference-vector math of the fused Pallas kernel (md/pallas_md.grows,
# validated there against autodiff).
# ==========================================================================

def bonded_energy_sparse(sys: MDSystem, x):
    e = jnp.zeros((), x.dtype)
    if sys.bond_idx.shape[0]:
        d = x[sys.bond_idx[:, 0]] - x[sys.bond_idx[:, 1]]
        r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-16)
        e = e + jnp.sum(sys.bond_k * (r - sys.bond_r0) ** 2)
    if sys.angle_idx.shape[0]:
        u = x[sys.angle_idx[:, 0]] - x[sys.angle_idx[:, 1]]
        v = x[sys.angle_idx[:, 2]] - x[sys.angle_idx[:, 1]]
        cos = jnp.sum(u * v, axis=-1) / jnp.sqrt(
            jnp.sum(u * u, axis=-1) * jnp.sum(v * v, axis=-1) + 1e-16)
        theta = jnp.arccos(jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7))
        e = e + jnp.sum(sys.angle_k * (theta - sys.angle_t0) ** 2)
    if sys.dih_idx.shape[0]:
        b1 = x[sys.dih_idx[:, 1]] - x[sys.dih_idx[:, 0]]
        b2 = x[sys.dih_idx[:, 2]] - x[sys.dih_idx[:, 1]]
        b3 = x[sys.dih_idx[:, 3]] - x[sys.dih_idx[:, 2]]
        n1 = jnp.cross(b1, b2)
        n2 = jnp.cross(b2, b3)
        b2n = b2 / (jnp.linalg.norm(b2, axis=-1, keepdims=True) + 1e-12)
        m1 = jnp.cross(n1, b2n)
        phi = jnp.arctan2(jnp.sum(m1 * n2, axis=-1),
                          jnp.sum(n1 * n2, axis=-1))
        e = e + jnp.sum(sys.dih_pk
                        * (1.0 + jnp.cos(sys.dih_n * phi - sys.dih_phase)))
    from .cmap import cmap_energy, has_cmap
    if has_cmap(sys):
        e = e + cmap_energy(sys, x)
    return e


def bonded_force_sparse(sys: MDSystem, x):
    """Analytic bonded forces via gathers + scatter-add (forward-only)."""
    f = jnp.zeros_like(x)
    if sys.bond_idx.shape[0]:
        i, j = sys.bond_idx[:, 0], sys.bond_idx[:, 1]
        d = x[i] - x[j]
        r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-16)
        g = (2.0 * sys.bond_k * (r - sys.bond_r0) / r)[:, None] * d
        f = f.at[i].add(-g).at[j].add(g)
    if sys.angle_idx.shape[0]:
        a, b, c = (sys.angle_idx[:, 0], sys.angle_idx[:, 1],
                   sys.angle_idx[:, 2])
        u = x[a] - x[b]
        v = x[c] - x[b]
        uu = jnp.sum(u * u, axis=-1) + 1e-16
        vv = jnp.sum(v * v, axis=-1) + 1e-16
        uv = jnp.sum(u * v, axis=-1)
        inv_norm = jax.lax.rsqrt(uu * vv)
        cos_t = jnp.clip(uv * inv_norm, -1.0 + 1e-7, 1.0 - 1e-7)
        sin_t = jnp.sqrt(1.0 - cos_t * cos_t)
        theta = jnp.arctan2(sin_t, cos_t)
        coef = -2.0 * sys.angle_k * (theta - sys.angle_t0) / sin_t
        cu = (coef * inv_norm)[:, None]
        cuu = (coef * cos_t / uu)[:, None]
        cvv = (coef * cos_t / vv)[:, None]
        gu = cu * v - cuu * u
        gv = cu * u - cvv * v
        f = f.at[a].add(-gu).at[c].add(-gv).at[b].add(gu + gv)
    if sys.dih_idx.shape[0]:
        i, j, k, l = (sys.dih_idx[:, 0], sys.dih_idx[:, 1],
                      sys.dih_idx[:, 2], sys.dih_idx[:, 3])
        b1 = x[j] - x[i]
        b2 = x[k] - x[j]
        b3 = x[l] - x[k]
        n1 = jnp.cross(b1, b2)
        n2 = jnp.cross(b2, b3)
        n1sq = jnp.sum(n1 * n1, axis=-1) + 1e-12
        n2sq = jnp.sum(n2 * n2, axis=-1) + 1e-12
        b2sq = jnp.sum(b2 * b2, axis=-1) + 1e-12
        b2n = jnp.sqrt(b2sq)
        m1 = jnp.cross(n1, b2 / b2n[:, None])
        phi = jnp.arctan2(jnp.sum(m1 * n2, axis=-1),
                          jnp.sum(n1 * n2, axis=-1))
        dEdphi = -sys.dih_pk * sys.dih_n * jnp.sin(
            sys.dih_n * phi - sys.dih_phase)
        c1 = (-b2n / n1sq)[:, None]
        c3 = (-b2n / n2sq)[:, None]
        p12 = (jnp.sum(b1 * b2, axis=-1) / b2sq)[:, None]
        p32 = (jnp.sum(b3 * b2, axis=-1) / b2sq)[:, None]
        g1 = dEdphi[:, None] * c1 * n1
        g3 = dEdphi[:, None] * c3 * n2
        g2 = -p12 * g1 - p32 * g3
        f = (f.at[j].add(-g1).at[i].add(g1)
              .at[k].add(-g2).at[j].add(g2)
              .at[l].add(-g3).at[k].add(g3))
    from .cmap import cmap_force, has_cmap
    if has_cmap(sys):
        f = f + cmap_force(sys, x)
    return f


def strip_rigid_water_bonded(sys: MDSystem, triplets):
    """Drop bond/angle terms lying fully inside rigid waters — they are
    replaced by distance constraints (OpenMM's ``rigidWater=True`` removes
    them the same way), and at ~3 terms per water they would dominate the
    sparse bonded scatter cost for solvated systems."""
    import dataclasses
    wat = set(int(i) for t in np.asarray(triplets) for i in t)
    bi = np.asarray(sys.bond_idx)
    keep_b = np.asarray([not (int(a) in wat and int(b) in wat)
                         for a, b in bi], bool) if len(bi) else np.zeros(0, bool)
    ai = np.asarray(sys.angle_idx)
    keep_a = np.asarray([not all(int(v) in wat for v in row)
                         for row in ai], bool) if len(ai) else np.zeros(0, bool)
    rep = dict(
        bond_idx=jnp.asarray(bi[keep_b].reshape(-1, 2), jnp.int32),
        bond_k=sys.bond_k[jnp.asarray(np.where(keep_b)[0], jnp.int32)],
        bond_r0=sys.bond_r0[jnp.asarray(np.where(keep_b)[0], jnp.int32)],
        angle_idx=jnp.asarray(ai[keep_a].reshape(-1, 3), jnp.int32),
        angle_k=sys.angle_k[jnp.asarray(np.where(keep_a)[0], jnp.int32)],
        angle_t0=sys.angle_t0[jnp.asarray(np.where(keep_a)[0], jnp.int32)],
    )
    if sys.dense_pairs and sys.bond_D.shape[0]:
        rep["bond_D"] = sys.bond_D[jnp.asarray(np.where(keep_b)[0])]
        rep["angle_U"] = sys.angle_U[jnp.asarray(np.where(keep_a)[0])]
        rep["angle_V"] = sys.angle_V[jnp.asarray(np.where(keep_a)[0])]
    return dataclasses.replace(sys, **rep)


# ==========================================================================
# Whole-system entry points (large / sparse-only systems)
# ==========================================================================

def potential_energy_neighbor(sys: MDSystem, x, plan: NeighborPlan = None,
                              box=None):
    """Total potential for sparse-only systems; ``x``: (natoms, 3)."""
    from .forces import dispersion_correction_energy
    return (bonded_energy_sparse(sys, x)
            + neighbor_nonbonded_energy(sys, x, plan, box=box)
            + dispersion_correction_energy(sys, box=box))


def force_neighbor(sys: MDSystem, x, plan: NeighborPlan = None, box=None):
    """Total analytic force; ``x``: (natoms, 3)."""
    return (bonded_force_sparse(sys, x)
            + neighbor_nonbonded_force(sys, x, plan, box=box))


def force_flat_neighbor(sys: MDSystem, xflat, plan: NeighborPlan = None,
                        use_pallas: bool = None):
    """Batched flat-coordinate forces: (..., 3N) -> (..., 3N).

    On TPU the pair sweep runs in the VMEM Pallas kernel
    (``neighbor_sweep_pallas``); exception corrections + bonded terms stay
    on the XLA path."""
    x = jnp.asarray(xflat)
    shape = x.shape
    if plan is None:
        plan = _default_plan(sys, x)
    if use_pallas is None:
        import os
        if os.environ.get("ISOKANN_DISABLE_PALLAS_SWEEP"):
            # operational escape hatch: v5e kernel faults are flaky and
            # geometry-dependent (see round-2 notes); the XLA sweep is
            # ~2x slower but has never faulted
            use_pallas = False
        else:
            try:
                use_pallas = jax.devices()[0].platform == "tpu"
            except Exception:
                use_pallas = False
    if sys.method == "LJPME":
        # the Pallas sweep's 8-lane column layout has no q6 lane; the
        # dispersion h-term runs on the XLA sweep
        use_pallas = False
    xb = x.reshape((-1, 3 * sys.natoms))
    if use_pallas:
        f = neighbor_sweep_pallas(sys, plan, xb)

        def _rest(xi):
            r = _exception_terms(sys, xi, True) + bonded_force_sparse(sys, xi)
            if sys.method in ("Ewald", "PME"):
                from .ewald import ewald_recip_force
                r = r + ewald_recip_force(sys.ewald_kvecs, sys.ewald_coefs,
                                          sys.charges, xi)
            return r

        rest = jax.vmap(_rest)(xb.reshape(-1, sys.natoms, 3))
        f = f + rest.reshape(f.shape)
    else:
        f = jax.vmap(lambda xi: force_neighbor(
            sys, xi, plan))(xb.reshape(-1, sys.natoms, 3)).reshape(xb.shape)
    return f.reshape(shape)


# ==========================================================================
# Pallas sweep kernel: the pair blocks in VMEM
# ==========================================================================
#
# The XLA sweep streams ~8 (ncells, C, C) intermediates through HBM per
# stencil offset.  The kernel processes one (i-cell, stencil-offset) pair
# block per grid step entirely in VMEM: per-cell data arrives as one
# (C, 8) column block + its (8, C) transpose, the j-block is DMA'd
# directly from the neighbor cell via a scalar-prefetched stencil index
# map, and Newton reaction forces are emitted per (cell, offset) for a
# static inverse-permutation gather on the XLA side (no scatters
# anywhere).  Sorted ids / original ids / exclusion partners travel as
# f32 lanes (ids < 2^24 are exact).
#
# Column layout (8 lanes): [x, y, z, q, rmin_half, sqrt(eps), sid, oid].


def _nb_kernel_body(plan, rc, krf, icols_ref, jrows_ref, ifar_ref,
                    ibits_ref, jbits_ref, acc_ref, fj_ref, s_idx,
                    alpha=None):
    xi = icols_ref[0, 0]                      # (C, 8)
    xj = jrows_ref[0, 0]                      # (8, C)
    E2 = ifar_ref.shape[-1]
    far = ifar_ref[0, 0]                      # (C, E2)
    bi = ibits_ref[0, 0]                      # (C, 1) int32
    bj = jbits_ref[0, 0]                      # (1, C) int32

    dx = xi[:, 0:1] - xj[0:1, :]
    dy = xi[:, 1:2] - xj[1:2, :]
    dz = xi[:, 2:3] - xj[2:3, :]
    if plan.box is not None:
        bx, by, bz = (float(b) for b in plan.box)
        dx = dx - bx * jnp.round(dx * (1.0 / bx))
        dy = dy - by * jnp.round(dy * (1.0 / by))
        dz = dz - bz * jnp.round(dz * (1.0 / bz))
    r2 = dx * dx + dy * dy + dz * dz + 1e-12

    sid_i = xi[:, 6:7]
    sid_j = xj[6:7, :]
    oid_j = xj[7:8, :]
    # hard exclusions: window bitmask of the lower-index atom (~6 int ops
    # per pair instead of E lane compares) + the narrow far-partner table
    WIN = plan.excl_win
    dd = oid_j.astype(jnp.int32) - xi[:, 7:8].astype(jnp.int32)   # (C, C)
    fwd = ((dd >= 1) & (dd <= WIN)
           & (((bi >> jnp.clip(dd - 1, 0, 31)) & 1) == 1))
    bwd = ((dd <= -1) & (dd >= -WIN)
           & (((bj >> jnp.clip(-dd - 1, 0, 31)) & 1) == 1))
    excluded = fwd | bwd
    for e in range(E2):
        excluded = excluded | (far[:, e:e + 1] == oid_j)
    nsent = float(plan.natoms)
    maskb = ((r2 < rc * rc) & (sid_i != sid_j) & ~excluded
             & (sid_i < nsent) & (sid_j < nsent))
    r2s = jnp.where(maskb, r2, 1.0)

    inv_r = jax.lax.rsqrt(r2s)
    inv_r2 = inv_r * inv_r
    qq = COULOMB * xi[:, 3:4] * xj[3:4, :]
    rmin = xi[:, 4:5] + xj[4:5, :]
    epsij = xi[:, 5:6] * xj[5:6, :]
    x6 = (rmin * rmin * inv_r2) ** 3
    g_lj = 6.0 * epsij * (x6 - x6 * x6) * inv_r2
    if alpha is None:                       # reaction field
        g_c = qq * (-0.5 * inv_r2 * inv_r) + qq * krf
    else:                                   # Ewald real space (erfc)
        from .ewald import erfc_approx
        er = erfc_approx(alpha * (r2s * inv_r))
        g_c = -qq * (0.5 * er * inv_r2 * inv_r
                     + (alpha / _SQRT_PI)
                     * jnp.exp(-(alpha * alpha) * r2s) * inv_r2)
    w = -2.0 * (g_lj + g_c) * maskb.astype(jnp.float32)

    z5 = jnp.zeros((plan.C, 5), jnp.float32)
    fi = jnp.concatenate([jnp.sum(w * dx, axis=1, keepdims=True),
                          jnp.sum(w * dy, axis=1, keepdims=True),
                          jnp.sum(w * dz, axis=1, keepdims=True), z5],
                         axis=1)

    from jax.experimental import pallas as pl
    @pl.when(s_idx == 0)
    def _():
        acc_ref[0, 0] = fi

    @pl.when(s_idx != 0)
    def _():
        acc_ref[0, 0] = acc_ref[0, 0] + fi

    # Newton reaction on the j-block (zero for the self block s=0, and
    # for non-Newton plans whose stencil already holds both directions)
    live = jnp.where(s_idx == 0, 0.0, 1.0) * (1.0 if plan.newton else 0.0)
    z5r = jnp.zeros((5, plan.C), jnp.float32)
    fj_ref[0, 0, 0] = jnp.concatenate(
        [-live * jnp.sum(w * dx, axis=0, keepdims=True),
         -live * jnp.sum(w * dy, axis=0, keepdims=True),
         -live * jnp.sum(w * dz, axis=0, keepdims=True), z5r], axis=0)


# v5e in-scan batch fault workaround (see kernel notes and
# docs/v5e_fault_report.md).  History: B=16 faulted in rounds 1-2; the
# 2026-08-19 runtime passes the FULL 7.7k-atom retest at B=16 inside a
# scan (out/v5e_faults.json, small:false), so the default chunk is now
# 16.  Set ISOKANN_SCAN_CHUNK=8 to restore the conservative guard if a
# runtime regression reappears.
import os as _os

_SCAN_CHUNK = int(_os.environ.get("ISOKANN_SCAN_CHUNK", "16"))


def neighbor_sweep_pallas(sys: MDSystem, plan: NeighborPlan, xb,
                          interpret=False):
    """Nonbonded sweep forces via the VMEM pair-block kernel.

    ``xb``: (B, 3N) -> (B, 3N) forces (full pairs; exception corrections
    and bonded terms are added by the caller)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # v5e faults for >4-walker batches when the kernel sits inside a
    # lax.scan (standalone calls are fine; reproduced with both 3-D and
    # folded 2-D grids — backend issue, not geometry) — chunk the batch
    # (module-level so the perf/fault harness can probe other values)
    MAXB = _SCAN_CHUNK
    if xb.shape[0] > MAXB:
        return jnp.concatenate(
            [neighbor_sweep_pallas(sys, plan, xb[i:i + MAXB],
                                   interpret=interpret)
             for i in range(0, xb.shape[0], MAXB)], axis=0)

    n, C = plan.natoms, plan.C
    B = xb.shape[0]
    rc, krf, _ = _rf_consts(sys)
    box = jnp.asarray(plan.box, jnp.float32)
    Sp1 = plan.S + 1
    # stencil with the self cell prepended (column 0)
    ident = jnp.arange(plan.ncells, dtype=jnp.int32)[:, None]
    sten = jnp.concatenate([ident, plan.stencil], axis=1)    # (ncells, S+1)

    seps = jnp.sqrt(sys.eps)
    E2 = plan.excl_far.shape[1]

    def prep(xflat):
        """Per-walker sorted-frame (C, 8) column blocks + transposes."""
        xw = xflat.reshape(n, 3)
        xw = xw - box * jnp.floor(xw / box)
        order, table, pos, _ = plan.sorted_frame(xw)

        def pad_row(a, fill=0.0):
            return jnp.concatenate(
                [a[order], jnp.full((1,) + a.shape[1:], fill, a.dtype)])

        cols = jnp.stack([
            pad_row(xw[:, 0], 1e3)[table],
            pad_row(xw[:, 1], 2e3)[table],
            pad_row(xw[:, 2], 3e3)[table],
            pad_row(sys.charges)[table],
            pad_row(sys.rmin_half)[table],
            pad_row(seps)[table],
            table.astype(jnp.float32),                     # sid (sentinel n)
            jnp.concatenate([order.astype(jnp.float32),
                             jnp.full((1,), -2.0)])[table],  # oid
        ], axis=-1)                                        # (ncells, C, 8)
        far = jnp.concatenate(
            [plan.excl_far[:n][order].astype(jnp.float32),
             jnp.full((1, E2), -1.0)])[table]              # (ncells, C, E2)
        bits = jnp.concatenate(
            [plan.excl_bits[:n][order],
             jnp.zeros((1,), jnp.int32)])[table]           # (ncells, C)
        return (cols, jnp.swapaxes(cols, 1, 2), far,
                bits[..., None], bits[:, None, :], order, pos)

    icols, jrows, ifar, ibits, jbits, orders, poss = jax.vmap(prep)(xb)

    alpha = sys.ewald_alpha if sys.method in ("Ewald", "PME") else None

    def kernel(sten_ref, icols_ref, jrows_ref, ifar_ref, ibits_ref,
               jbits_ref, acc_ref, fj_ref):
        _nb_kernel_body(plan, rc, krf, icols_ref, jrows_ref, ifar_ref,
                        ibits_ref, jbits_ref, acc_ref, fj_ref,
                        pl.program_id(1), alpha=alpha)

    # grid: (walker*cell, stencil) — batch folded into the leading dim
    # (a 3-D (B, ncells, S) grid faulted on v5e for B > 4 inside lax.scan)
    nc = plan.ncells
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * nc, Sp1),
        in_specs=[
            pl.BlockSpec((1, 1, C, 8),
                         lambda g, s, st: (g // nc, g % nc, 0, 0)),
            pl.BlockSpec((1, 1, 8, C),
                         lambda g, s, st: (g // nc, st[g % nc, s], 0, 0)),
            pl.BlockSpec((1, 1, C, E2),
                         lambda g, s, st: (g // nc, g % nc, 0, 0)),
            pl.BlockSpec((1, 1, C, 1),
                         lambda g, s, st: (g // nc, g % nc, 0, 0)),
            pl.BlockSpec((1, 1, 1, C),
                         lambda g, s, st: (g // nc, st[g % nc, s], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, C, 8),
                         lambda g, s, st: (g // nc, g % nc, 0, 0)),
            pl.BlockSpec((1, 1, 1, 8, C),
                         lambda g, s, st: (g // nc, g % nc, s, 0, 0)),
        ],
    )
    acc, fj = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, plan.ncells, C, 8), jnp.float32),
                   jax.ShapeDtypeStruct((B, plan.ncells, Sp1, 8, C),
                                        jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(sten, icols, jrows, ifar, ibits, jbits)

    # Newton reactions back to their cells: static inverse permutations
    total = acc[..., :3]                                   # (B, ncells, C, 3)
    if plan.newton:
        react = jnp.zeros((B, plan.ncells, C, 3), jnp.float32)
        for s in range(plan.S):
            react = react + jnp.swapaxes(
                fj[:, plan.stencil_inv[:, s], s + 1, :3, :], 2, 3)
        total = total + react

    def unsort(tot, pos, order):
        f_sorted = tot.reshape(-1, 3)[pos]
        return f_sorted[jnp.argsort(order)]

    f = jax.vmap(unsort)(total, poss, orders)
    return f.reshape(B, 3 * n)
