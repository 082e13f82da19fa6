"""Pallas nonbonded + OBC2 force kernel for medium systems (villin-class).

The XLA path streams ~10-20 (B, n, n) intermediates through HBM per MD
step (measured HBM-bound at 591 atoms).  This kernel evaluates the
analytic nonbonded + GBSA force (md/gbsa_force.py math, validated against
autodiff) for ONE walker per grid step with every (A, A) intermediate in
VMEM; only coordinates in / forces out touch HBM.  Bonded forces stay on
the XLA path (cheap, no (n, n) tensors).

VMEM strategy: the (A, A) pair space is processed in J-chunks of 128
lanes across three passes (Born-radius sums -> dE/dB sums -> force
accumulation), Python-unrolled so all slices are static.  Peak live
VMEM ~6 MB at 640 padded atoms.

Layout per walker: x as (8, Ap) [rows = xyz padded, lanes = atoms] plus
the transposed copy (Ap, 8); padding atoms are placed far away so every
interaction with them vanishes smoothly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .system import MDSystem, COULOMB


def _round_up(x, m):
    return ((x + m - 1) // m) * m


class GBPlan:
    """Padded per-atom parameter rows/cols + pair masks (host-side)."""

    def __init__(self, sys: MDSystem):
        A = sys.natoms
        Ap = max(_round_up(A, 128), 256)
        self.A, self.Ap = A, Ap

        def pad(v, fill):
            out = np.full(Ap, fill, np.float32)
            out[:A] = np.asarray(v, np.float32)
            return out

        q = pad(sys.charges, 0.0)
        self.q_col = q[:, None]
        rmh = pad(sys.rmin_half, 0.1)
        self.rmh_col = rmh[:, None]
        # store sqrt(eps) so the combining rule sqrt(eps_i eps_j) is a
        # per-pair multiply instead of a per-pair sqrt
        seps = np.sqrt(pad(sys.eps, 0.0))
        self.eps_col = seps[:, None]

        offset = 0.009
        has_gb = sys.implicit == "obc2" and sys.gb_radii.shape[0] == A
        radii = pad(sys.gb_radii if has_gb else np.full(A, 0.15), 0.15)
        scales = pad(sys.gb_scales if has_gb else np.zeros(A), 0.0)
        orad = radii - offset
        self.radii_col = radii[:, None]
        self.orad_col = orad[:, None]
        self.sr_col = (scales * orad)[:, None]

        # only the Coulomb scale grid is shipped; the LJ grid is derived
        # from it inside the kernel (same exclusion structure)
        qq = np.ones((Ap, Ap), np.float32)
        qq[:A, :A] = np.asarray(sys.qq_scale, np.float32)
        np.fill_diagonal(qq, 0.0)
        self.qq_scale = qq

        self.method = sys.method
        self.cutoff = float(sys.cutoff)
        self.eps_rf = float(sys.eps_rf)
        self.implicit = sys.implicit
        # minimum-image box (CutoffPeriodic); pad atoms are masked by
        # index validity since they wrap into the box
        self.box = (tuple(float(b) for b in sys.box)
                    if sys.method == "CutoffPeriodic" and sys.box is not None
                    else None)


def _force_one_walker(plan: GBPlan, xT, x8, consts, TJ=128):
    """Analytic NB(+GBSA) force for one walker, J-chunked.

    ``xT``: (Ap, 8) coords (cols 0..2 = xyz); ``x8``: (8, Ap) transpose.
    Returns FT (Ap, 8) with force components in cols 0..2.

    The kernel is VPU-bound (transcendental-heavy pair math, no MXU), so
    every chunk quantity that two passes need is computed once and kept
    live in VMEM (dx/dy/dz/r2/inv_r; invL/invU/lnLU from the descreening
    integral; expo/finv3 from the GB pair energy) — ~16 MB of cached
    chunks at 640 padded atoms, covered by the raised VMEM limit.
    Reciprocals are fused (one rsqrt per distance, one reciprocal per
    (L, U) pair via 1/(L*U), per-atom 1/B instead of per-pair)."""
    (q_col, rmh_col, eps_col, radii_col, orad_col, sr_col,
     qq_scale) = consts
    Ap = plan.Ap
    NJ = Ap // TJ
    use_gb = plan.implicit == "obc2"
    row_id = jax.lax.broadcasted_iota(jnp.int32, (Ap, 1), 0)

    rc = plan.cutoff
    krf = (1.0 / rc ** 3) * (plan.eps_rf - 1.0) / (2 * plan.eps_rf + 1.0)
    eps_solvent = 78.5
    pref = -0.5 * COULOMB * (1.0 - 1.0 / eps_solvent)

    xc = xT[:, 0:1]
    yc = xT[:, 1:2]
    zc = xT[:, 2:3]

    def row_chunk(vcol, j):
        # (TJ, 1) sublane slice -> (1, TJ) row at lane offset 0 (Mosaic
        # cannot broadcast lane-offset row slices)
        return jnp.transpose(vcol[j * TJ:(j + 1) * TJ, :])

    # ---- geometry (cached across passes for GB; inline otherwise) --------
    A = plan.A

    def chunk_geom(j):
        sl = slice(j * TJ, (j + 1) * TJ)
        dx = xc - x8[0:1, sl]
        dy = yc - x8[1:2, sl]
        dz = zc - x8[2:3, sl]
        if plan.box is not None:
            bx, by, bz = plan.box
            dx = dx - bx * jnp.round(dx * (1.0 / bx))
            dy = dy - by * jnp.round(dy * (1.0 / by))
            dz = dz - bz * jnp.round(dz * (1.0 / bz))
        col_id = jax.lax.broadcasted_iota(jnp.int32, (1, TJ), 1) + j * TJ
        # valid = off-diagonal AND both atoms real (pad atoms wrap into
        # the box under minimum image, so distance cannot exclude them)
        offd = ((row_id != col_id) & (row_id < A)
                & (col_id < A)).astype(jnp.float32)
        r2 = dx * dx + dy * dy + dz * dz + (1.0 - offd)
        inv_r = jax.lax.rsqrt(r2)
        return sl, dx, dy, dz, r2, inv_r, offd

    if use_gb:
        geom = [chunk_geom(j) for j in range(NJ)]
    else:
        geom = None

    # ---- pass 1: Born-radius descreening sums ---------------------------
    if use_gb:
        lcache = []
        Ii = jnp.zeros((Ap, 1), jnp.float32)
        for j in range(NJ):
            sl, dx, dy, dz, r2, inv_r, offd = geom[j]
            r = r2 * inv_r
            srj = row_chunk(sr_col, j)
            L = jnp.maximum(jnp.abs(r - srj), orad_col)
            U = r + srj
            rLU = 1.0 / (L * U)
            invL, invU = U * rLU, L * rLU
            lnLU = jnp.log(L * invU)
            lcache.append((invL, invU, lnLU))
            I = 0.5 * (invL - invU + 0.25 * (r - srj ** 2 * inv_r)
                       * (invU ** 2 - invL ** 2)
                       + 0.5 * lnLU * inv_r)
            I = I + jnp.where(orad_col < srj - r,
                              2.0 * (1.0 / orad_col - invL), 0.0)
            active = ((r + srj > orad_col).astype(jnp.float32) * offd
                      * (srj > 1e-8).astype(jnp.float32))
            Ii = Ii + jnp.sum(I * active, axis=1, keepdims=True)

        psi = Ii * orad_col
        garg = psi - 0.8 * psi ** 2 + 4.85 * psi ** 3
        th = jnp.tanh(garg)
        B = 1.0 / (1.0 / orad_col - th / radii_col)
        B = jnp.maximum(B, orad_col)
        invB = 1.0 / B
        dBdpsi = B * B * (1.0 - th * th) * (
            1.0 - 1.6 * psi + 14.55 * psi ** 2) / radii_col

        # ---- pass 2: dE/dB row sums --------------------------------------
        gcache = []
        dEdB = (pref * (-(q_col ** 2) * invB * invB)
                + (-6.0 * 28.3919551 * (radii_col + 0.14) ** 2
                   * radii_col ** 6 * invB ** 7))
        for j in range(NJ):
            sl, dx, dy, dz, r2, inv_r, offd = geom[j]
            Bj = row_chunk(B, j)
            # t = r2 / (4 B_i B_j) via per-atom reciprocals (no pair recip)
            t = r2 * (0.25 * invB) * row_chunk(invB, j)
            expo = jnp.exp(-t)
            f2 = r2 + B * Bj * expo
            rsf = jax.lax.rsqrt(f2)
            finv3 = rsf * rsf * rsf
            gcache.append((expo, finv3))
            qqp = q_col * row_chunk(q_col, j)
            df2dBi = Bj * expo * (1.0 + t)
            dEdB = dEdB + 2.0 * jnp.sum(
                pref * qqp * (-0.5) * finv3 * df2dBi * offd,
                axis=1, keepdims=True)
        gchain = dEdB * dBdpsi * orad_col              # (Ap, 1)

    # ---- pass 3: force accumulation --------------------------------------
    fx = jnp.zeros((Ap, 1), jnp.float32)
    fy = jnp.zeros((Ap, 1), jnp.float32)
    fz = jnp.zeros((Ap, 1), jnp.float32)
    # disjoint per-chunk transpose-term pieces (concatenated at the end;
    # Mosaic has no scatter-add lowering)
    fx_t_parts, fy_t_parts, fz_t_parts = [], [], []

    for j in range(NJ):
        sl, dx, dy, dz, r2, inv_r, offd = (geom[j] if geom is not None
                                           else chunk_geom(j))
        inv_r2 = inv_r * inv_r
        r = r2 * inv_r

        rmin = rmh_col + row_chunk(rmh_col, j)
        epsij = eps_col * row_chunk(eps_col, j)
        x6 = (rmin * rmin * inv_r2) ** 3
        qq = COULOMB * q_col * row_chunk(q_col, j)
        qsc = qq_scale[:, sl]
        # the LJ scale grid is derivable from the Coulomb one (same
        # exclusion structure: 0 -> 0, scee -> scnb, 1 -> 1); saves a
        # 1.6 MB VMEM input that pushed the kernel over the scoped limit
        lsc = jnp.where(qsc == 0.0, 0.0,
                        jnp.where(qsc >= 0.999, 1.0, 0.5))
        g_lj = 6.0 * epsij * (x6 - x6 * x6) * inv_r2
        g_c_plain = qq * (-0.5) * inv_r2 * inv_r
        if plan.method == "NoCutoff":
            w = 2.0 * (lsc * g_lj + qsc * g_c_plain)
        else:
            within = (r < rc).astype(jnp.float32)
            full = (qsc >= 0.999).astype(jnp.float32)
            one4 = ((qsc > 0) & (qsc < 0.999)).astype(jnp.float32)
            l_full = (lsc >= 0.999).astype(jnp.float32)
            l_one4 = ((lsc > 0) & (lsc < 0.999)).astype(jnp.float32)
            w = 2.0 * (g_lj * (l_full * within + l_one4 * lsc)
                       + qq * ((-0.5 * inv_r2 * inv_r + krf) * within * full)
                       + g_c_plain * one4 * qsc)
        w = w * offd

        if use_gb:
            srj = row_chunk(sr_col, j)
            expo, finv3 = gcache[j]
            qqp = q_col * row_chunk(q_col, j)
            dEdr2 = 2.0 * pref * qqp * (-0.5) * finv3 * (1.0 - expo / 4.0) * offd
            w = w + 2.0 * dEdr2

            # dI/dr chunk (descreening integral derivative; L/U terms cached)
            invL, invU, lnLU = lcache[j]
            dL = jnp.where(jnp.abs(r - srj) > orad_col,
                           jnp.sign(r - srj), 0.0)
            invL2, invU2 = invL * invL, invU * invU
            dI = 0.5 * (
                -invL2 * dL + invU2
                + 0.25 * ((1.0 + srj ** 2 * inv_r2) * (invU2 - invL2)
                          + (r - srj ** 2 * inv_r)
                          * (-2.0 * invU * invU2 + 2.0 * invL * invL2 * dL))
                - 0.5 * lnLU * inv_r2 + 0.5 * (dL * invL - invU) * inv_r
            )
            dI = dI + jnp.where(orad_col < srj - r, 2.0 * invL2 * dL, 0.0)
            active = ((r + srj > orad_col).astype(jnp.float32) * offd
                      * (srj > 1e-8).astype(jnp.float32))
            GdR = gchain * dI * active * inv_r
            w = w + GdR
            # transpose-term pieces (G^T applied via column sums)
            fx_t_parts.append(jnp.sum(GdR * dx, axis=0, keepdims=True))
            fy_t_parts.append(jnp.sum(GdR * dy, axis=0, keepdims=True))
            fz_t_parts.append(jnp.sum(GdR * dz, axis=0, keepdims=True))

        fx = fx - jnp.sum(w * dx, axis=1, keepdims=True)
        fy = fy - jnp.sum(w * dy, axis=1, keepdims=True)
        fz = fz - jnp.sum(w * dz, axis=1, keepdims=True)

    if use_gb:
        fx = fx + jnp.transpose(jnp.concatenate(fx_t_parts, axis=1))
        fy = fy + jnp.transpose(jnp.concatenate(fy_t_parts, axis=1))
        fz = fz + jnp.transpose(jnp.concatenate(fz_t_parts, axis=1))
    zero = jnp.zeros((Ap, 1), jnp.float32)
    return jnp.concatenate([fx, fy, fz, zero, zero, zero, zero, zero], axis=1)


def _force_one_walker_tri(plan: GBPlan, xT, x8, consts, T=128):
    """Upper-triangle tiled variant of :func:`_force_one_walker`.

    The total per-pair force coefficient is symmetric — with the
    full-grid accumulation written as F_i = -sum_j w_ij dx_ij plus the
    descreening transpose term +sum_j GdR_ji dx_ji, substituting
    dx_ji = -dx_ij gives

        F_i = -sum_j (w_sym_ij + 2 dEdr2_ij + GdR_ij + GdR_ji) dx_ij

    with a coefficient c_ij = c_ji.  Each unordered pair therefore needs
    to be visited once: tiles (i, j) with j >= i (strict-upper masking on
    the diagonal tiles), accumulating -c dx into row blocks and +c dx
    into column blocks.  Symmetric pair math (geometry, LJ/Coulomb/RF,
    the GB pair energy terms) is evaluated once per pair instead of
    twice; only the direction-asymmetric descreening integral I and its
    derivative dI are evaluated both ways per tile.  At 640 padded atoms
    this is ~40%% less pair arithmetic than the full grid for the same
    result (diagonal-tile masking wastes 1/(NT+1) of the asymmetric
    work)."""
    (q_col, rmh_col, eps_col, radii_col, orad_col, sr_col,
     qq_scale) = consts
    Ap = plan.Ap
    NT = Ap // T
    use_gb = plan.implicit == "obc2"
    A = plan.A

    rc = plan.cutoff
    krf = (1.0 / rc ** 3) * (plan.eps_rf - 1.0) / (2 * plan.eps_rf + 1.0)
    eps_solvent = 78.5
    pref = -0.5 * COULOMB * (1.0 - 1.0 / eps_solvent)

    xc = xT[:, 0:1]
    yc = xT[:, 1:2]
    zc = xT[:, 2:3]

    def rowslice(vcol, i):
        return vcol[i * T:(i + 1) * T, :]                       # (T, 1)

    def colchunk(vcol, j):
        # (T, 1) sublane slice -> (1, T) row at lane offset 0 (Mosaic
        # cannot broadcast lane-offset row slices)
        return jnp.transpose(vcol[j * T:(j + 1) * T, :])        # (1, T)

    tiles = [(i, j) for i in range(NT) for j in range(NT) if j >= i]

    def tile_geom(i, j):
        sl = slice(j * T, (j + 1) * T)
        dx = rowslice(xc, i) - x8[0:1, sl]
        dy = rowslice(yc, i) - x8[1:2, sl]
        dz = rowslice(zc, i) - x8[2:3, sl]
        if plan.box is not None:
            bx, by, bz = plan.box
            dx = dx - bx * jnp.round(dx * (1.0 / bx))
            dy = dy - by * jnp.round(dy * (1.0 / by))
            dz = dz - bz * jnp.round(dz * (1.0 / bz))
        row_id = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) + i * T
        col_id = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1) + j * T
        # each unordered pair once: strict upper on diagonal tiles; pad
        # atoms masked by index validity (they wrap under minimum image)
        upper = col_id > row_id if i == j else col_id != row_id
        offd = (upper & (row_id < A) & (col_id < A)).astype(jnp.float32)
        r2 = dx * dx + dy * dy + dz * dz + (1.0 - offd)
        inv_r = jax.lax.rsqrt(r2)
        return dx, dy, dz, r2, inv_r, offd

    geom = {t: tile_geom(*t) for t in tiles} if use_gb else None

    def descreen(r, inv_r, offd, sr_o, orad_s):
        """Descreening integral of the ``orad_s`` side by the ``sr_o``
        side; returns (I*active, invL, invU, lnLU, active)."""
        L = jnp.maximum(jnp.abs(r - sr_o), orad_s)
        U = r + sr_o
        rLU = 1.0 / (L * U)
        invL, invU = U * rLU, L * rLU
        lnLU = jnp.log(L * invU)
        I = 0.5 * (invL - invU + 0.25 * (r - sr_o ** 2 * inv_r)
                   * (invU ** 2 - invL ** 2)
                   + 0.5 * lnLU * inv_r)
        I = I + jnp.where(orad_s < sr_o - r,
                          2.0 * (1.0 / orad_s - invL), 0.0)
        active = ((r + sr_o > orad_s).astype(jnp.float32) * offd
                  * (sr_o > 1e-8).astype(jnp.float32))
        return I * active, invL, invU, lnLU, active

    def col_assemble(parts):
        # [(1, T)] * NT column pieces -> (Ap, 1)
        return jnp.transpose(jnp.concatenate(parts, axis=1))

    # ---- pass 1: Born-radius descreening sums (both directions/tile) ----
    if use_gb:
        lcache = {}
        rowI = [jnp.zeros((T, 1), jnp.float32) for _ in range(NT)]
        colI = [jnp.zeros((1, T), jnp.float32) for _ in range(NT)]
        for (i, j) in tiles:
            dx, dy, dz, r2, inv_r, offd = geom[(i, j)]
            r = r2 * inv_r
            # i descreened by j
            Iij, invLij, invUij, lnLUij, act_ij = descreen(
                r, inv_r, offd, colchunk(sr_col, j), rowslice(orad_col, i))
            rowI[i] = rowI[i] + jnp.sum(Iij, axis=1, keepdims=True)
            # j descreened by i
            Iji, invLji, invUji, lnLUji, act_ji = descreen(
                r, inv_r, offd, rowslice(sr_col, i), colchunk(orad_col, j))
            colI[j] = colI[j] + jnp.sum(Iji, axis=0, keepdims=True)
            lcache[(i, j)] = (invLij, invUij, lnLUij, act_ij,
                              invLji, invUji, lnLUji, act_ji)
        Ii = jnp.concatenate(rowI, axis=0) + col_assemble(colI)

        psi = Ii * orad_col
        garg = psi - 0.8 * psi ** 2 + 4.85 * psi ** 3
        th = jnp.tanh(garg)
        B = 1.0 / (1.0 / orad_col - th / radii_col)
        B = jnp.maximum(B, orad_col)
        invB = 1.0 / B
        dBdpsi = B * B * (1.0 - th * th) * (
            1.0 - 1.6 * psi + 14.55 * psi ** 2) / radii_col

        # ---- pass 2: dE/dB sums (symmetric base, once per pair) ---------
        gcache = {}
        rowD = [jnp.zeros((T, 1), jnp.float32) for _ in range(NT)]
        colD = [jnp.zeros((1, T), jnp.float32) for _ in range(NT)]
        for (i, j) in tiles:
            dx, dy, dz, r2, inv_r, offd = geom[(i, j)]
            Bi = rowslice(B, i)
            Bj = colchunk(B, j)
            t = r2 * (0.25 * rowslice(invB, i)) * colchunk(invB, j)
            expo = jnp.exp(-t)
            f2 = r2 + Bi * Bj * expo
            rsf = jax.lax.rsqrt(f2)
            finv3 = rsf * rsf * rsf
            gcache[(i, j)] = (expo, finv3)
            qqp = rowslice(q_col, i) * colchunk(q_col, j)
            base = pref * qqp * (-0.5) * finv3 * expo * (1.0 + t) * offd
            rowD[i] = rowD[i] + 2.0 * jnp.sum(base * Bj, axis=1,
                                              keepdims=True)
            colD[j] = colD[j] + 2.0 * jnp.sum(base * Bi, axis=0,
                                              keepdims=True)
        dEdB = (pref * (-(q_col ** 2) * invB * invB)
                + (-6.0 * 28.3919551 * (radii_col + 0.14) ** 2
                   * radii_col ** 6 * invB ** 7))
        dEdB = dEdB + jnp.concatenate(rowD, axis=0) + col_assemble(colD)
        gchain = dEdB * dBdpsi * orad_col                       # (Ap, 1)

    # ---- pass 3: symmetric-coefficient force accumulation ---------------
    def dI_dr(r, inv_r, inv_r2, sr_o, orad_s, invL, invU, lnLU):
        dL = jnp.where(jnp.abs(r - sr_o) > orad_s,
                       jnp.sign(r - sr_o), 0.0)
        invL2, invU2 = invL * invL, invU * invU
        dI = 0.5 * (
            -invL2 * dL + invU2
            + 0.25 * ((1.0 + sr_o ** 2 * inv_r2) * (invU2 - invL2)
                      + (r - sr_o ** 2 * inv_r)
                      * (-2.0 * invU * invU2 + 2.0 * invL * invL2 * dL))
            - 0.5 * lnLU * inv_r2 + 0.5 * (dL * invL - invU) * inv_r
        )
        return dI + jnp.where(orad_s < sr_o - r, 2.0 * invL2 * dL, 0.0)

    rowFx = [jnp.zeros((T, 1), jnp.float32) for _ in range(NT)]
    rowFy = [jnp.zeros((T, 1), jnp.float32) for _ in range(NT)]
    rowFz = [jnp.zeros((T, 1), jnp.float32) for _ in range(NT)]
    colFx = [jnp.zeros((1, T), jnp.float32) for _ in range(NT)]
    colFy = [jnp.zeros((1, T), jnp.float32) for _ in range(NT)]
    colFz = [jnp.zeros((1, T), jnp.float32) for _ in range(NT)]

    for (i, j) in tiles:
        dx, dy, dz, r2, inv_r, offd = (geom[(i, j)] if geom is not None
                                       else tile_geom(i, j))
        inv_r2 = inv_r * inv_r
        r = r2 * inv_r

        rmin = rowslice(rmh_col, i) + colchunk(rmh_col, j)
        epsij = rowslice(eps_col, i) * colchunk(eps_col, j)
        x6 = (rmin * rmin * inv_r2) ** 3
        qq = COULOMB * rowslice(q_col, i) * colchunk(q_col, j)
        qsc = qq_scale[i * T:(i + 1) * T, j * T:(j + 1) * T]
        lsc = jnp.where(qsc == 0.0, 0.0,
                        jnp.where(qsc >= 0.999, 1.0, 0.5))
        g_lj = 6.0 * epsij * (x6 - x6 * x6) * inv_r2
        g_c_plain = qq * (-0.5) * inv_r2 * inv_r
        if plan.method == "NoCutoff":
            w = 2.0 * (lsc * g_lj + qsc * g_c_plain)
        else:
            within = (r < rc).astype(jnp.float32)
            full = (qsc >= 0.999).astype(jnp.float32)
            one4 = ((qsc > 0) & (qsc < 0.999)).astype(jnp.float32)
            l_full = (lsc >= 0.999).astype(jnp.float32)
            l_one4 = ((lsc > 0) & (lsc < 0.999)).astype(jnp.float32)
            w = 2.0 * (g_lj * (l_full * within + l_one4 * lsc)
                       + qq * ((-0.5 * inv_r2 * inv_r + krf) * within * full)
                       + g_c_plain * one4 * qsc)
        w = w * offd

        if use_gb:
            expo, finv3 = gcache[(i, j)]
            qqp = rowslice(q_col, i) * colchunk(q_col, j)
            dEdr2 = (2.0 * pref * qqp * (-0.5) * finv3
                     * (1.0 - expo / 4.0) * offd)
            w = w + 2.0 * dEdr2
            (invLij, invUij, lnLUij, act_ij,
             invLji, invUji, lnLUji, act_ji) = lcache[(i, j)]
            dIij = dI_dr(r, inv_r, inv_r2, colchunk(sr_col, j),
                         rowslice(orad_col, i), invLij, invUij, lnLUij)
            dIji = dI_dr(r, inv_r, inv_r2, rowslice(sr_col, i),
                         colchunk(orad_col, j), invLji, invUji, lnLUji)
            w = (w + rowslice(gchain, i) * dIij * act_ij * inv_r
                 + colchunk(gchain, j) * dIji * act_ji * inv_r)

        rowFx[i] = rowFx[i] - jnp.sum(w * dx, axis=1, keepdims=True)
        rowFy[i] = rowFy[i] - jnp.sum(w * dy, axis=1, keepdims=True)
        rowFz[i] = rowFz[i] - jnp.sum(w * dz, axis=1, keepdims=True)
        colFx[j] = colFx[j] + jnp.sum(w * dx, axis=0, keepdims=True)
        colFy[j] = colFy[j] + jnp.sum(w * dy, axis=0, keepdims=True)
        colFz[j] = colFz[j] + jnp.sum(w * dz, axis=0, keepdims=True)

    fx = jnp.concatenate(rowFx, axis=0) + col_assemble(colFx)
    fy = jnp.concatenate(rowFy, axis=0) + col_assemble(colFy)
    fz = jnp.concatenate(rowFz, axis=0) + col_assemble(colFz)
    zero = jnp.zeros((Ap, 1), jnp.float32)
    return jnp.concatenate([fx, fy, fz, zero, zero, zero, zero, zero], axis=1)


def gb_force_pallas(sys: MDSystem, xb, interpret=False, tri=None):
    """Nonbonded(+GBSA) forces via the VMEM kernel.

    ``xb``: (B, 3N) -> (B, 3N).  Pad atoms live at +1e3 nm per index so
    their interactions vanish.  ``tri`` selects the upper-triangle tiled
    variant (``ISOKANN_GB_TRI=1``); the full grid stays the default —
    measured on 1x v5e (villin 588 atoms, 64 walkers) the tiled variant
    runs 0.87x the full grid: the ~40%% pair-arithmetic saving is eaten
    by 15 small (128, 128) ops replacing 5 (640, 128) slabs plus the
    column-assembly transposes, and larger tiles only increase the
    double-direction descreening waste (1/(NT+1) of the asymmetric
    work).  Same few-large-ops lesson as the dispatch-bound neighbor
    sweep."""
    import os

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if tri is None:
        tri = os.environ.get("ISOKANN_GB_TRI", "0") == "1"
    inner = _force_one_walker_tri if tri else _force_one_walker

    plan = GBPlan(sys)
    A, Ap = plan.A, plan.Ap
    B = xb.shape[0]

    xs = jnp.asarray(xb, jnp.float32).reshape(B, A, 3)
    far = 1000.0 + 10.0 * jnp.arange(Ap - A, dtype=jnp.float32)
    pad_xyz = jnp.stack([far, far, far], axis=1)          # (Ap-A, 3)
    xs = jnp.concatenate(
        [xs, jnp.tile(pad_xyz[None], (B, 1, 1))], axis=1)  # (B, Ap, 3)
    xT = jnp.concatenate(
        [xs, jnp.zeros((B, Ap, 5), jnp.float32)], axis=2)  # (B, Ap, 8)
    x8 = jnp.swapaxes(xT, 1, 2)                            # (B, 8, Ap)

    consts = (plan.q_col, plan.rmh_col, plan.eps_col, plan.radii_col,
              plan.orad_col, plan.sr_col, plan.qq_scale)
    consts = tuple(jnp.asarray(c) for c in consts)

    def kernel(xT_ref, x8_ref, *refs):
        crefs = refs[:len(consts)]
        out_ref = refs[len(consts)]
        cvals = tuple(r[:] for r in crefs)
        out_ref[0] = inner(plan, xT_ref[0], x8_ref[0], cvals)

    def cspec(c):
        return pl.BlockSpec(c.shape, lambda b, _nd=c.ndim: (0,) * _nd)

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, Ap, 8), lambda b: (b, 0, 0)),
                  pl.BlockSpec((1, 8, Ap), lambda b: (b, 0, 0))]
                 + [cspec(c) for c in consts],
        out_specs=pl.BlockSpec((1, Ap, 8), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Ap, 8), jnp.float32),
        # peak live VMEM ~17 MB at 640 padded atoms (chunk temporaries +
        # the (Ap, Ap) exclusion grid); the default 16 MB scoped limit is
        # marginal — raise it (v5e has 128 MB physical VMEM)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xT, x8, *consts)

    return out[:, :A, :3].reshape(B, 3 * A)


def force_flat_hybrid(sys: MDSystem, xflat, interpret=False, tri=None):
    """Full force: VMEM nonbonded(+GBSA) kernel + XLA bonded autodiff."""
    from . import forces as F

    x = jnp.asarray(xflat)
    shape = x.shape
    xb = x.reshape(-1, shape[-1])
    f_nb = gb_force_pallas(sys, xb, interpret=interpret, tri=tri)

    def bonded(xi):
        return -jax.grad(lambda z: F.bond_energy(sys, z)
                         + F.angle_energy(sys, z)
                         + F.dihedral_energy(sys, z))(xi)

    f_b = jax.vmap(bonded)(xb.reshape(-1, sys.natoms, 3)).reshape(xb.shape)
    return (f_nb + f_b).reshape(shape)
