"""Analytic (autodiff-free) nonbonded + OBC2 forces.

The same scheme OpenMM's GBSAOBC CPU/CUDA kernels use: direct
r-derivative plus the Born-radius chain rule (dE/dB -> dB/dpsi -> dI/dr).
Validated against ``jax.grad`` of ``forces.nonbonded_energy`` +
``forces.gbsa_obc2_energy`` to ~1e-5 relative on villin.

NOTE (measured on v5e): under XLA this is NOT faster than the autodiff
path (2.1e4 vs 2.6e4 walker-steps/s on villin+OBC2) — XLA's VJP fuses the
backward pass into comparable HBM traffic.  The value of this module is
as the *validated force math for the future in-VMEM Pallas kernel*
(ROADMAP #1), where no (n, n) intermediate ever touches HBM and autodiff
is unavailable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .system import MDSystem, COULOMB


def _pair_geometry(sys: MDSystem, x):
    n = sys.natoms
    diff = x[:, None, :] - x[None, :, :]
    if sys.method == "CutoffPeriodic" and sys.box is not None:
        box = jnp.asarray(sys.box, x.dtype)
        diff = diff - box * jnp.round(diff / box)
    r2 = jnp.sum(diff * diff, axis=-1) + jnp.eye(n, dtype=x.dtype)
    r = jnp.sqrt(r2)
    return diff, r2, r


def nonbonded_force_direct(sys: MDSystem, x):
    """Analytic LJ + Coulomb/reaction-field forces; x (n, 3) -> (n, 3)."""
    n = sys.natoms
    diff, r2, r = _pair_geometry(sys, x)
    inv_r2 = 1.0 / r2
    inv_r = 1.0 / r

    rmin = sys.rmin_half[:, None] + sys.rmin_half[None, :]
    epsij = jnp.sqrt(sys.eps[:, None] * sys.eps[None, :])
    x6 = (rmin * rmin * inv_r2) ** 3
    qq = COULOMB * sys.charges[:, None] * sys.charges[None, :]

    # dE/d(r2) per pair
    if sys.method == "NoCutoff":
        g = (sys.lj_scale * 6.0 * epsij * (x6 - x6 * x6) * inv_r2
             + sys.qq_scale * qq * (-0.5) * inv_r2 * inv_r)
    else:
        rc = sys.cutoff
        krf = (1.0 / rc ** 3) * (sys.eps_rf - 1.0) / (2 * sys.eps_rf + 1.0)
        within = (r < rc).astype(x.dtype)
        full = (sys.qq_scale >= 0.999).astype(x.dtype)
        one4 = ((sys.qq_scale > 0) & (sys.qq_scale < 0.999)).astype(x.dtype)
        l_full = (sys.lj_scale >= 0.999).astype(x.dtype)
        l_one4 = ((sys.lj_scale > 0) & (sys.lj_scale < 0.999)).astype(x.dtype)
        g_lj = 6.0 * epsij * (x6 - x6 * x6) * inv_r2
        g = (g_lj * (l_full * within + l_one4 * sys.lj_scale)
             + qq * ((-0.5 * inv_r2 * inv_r + krf) * within * full
                     + (-0.5 * inv_r2 * inv_r) * one4 * sys.qq_scale))
    g = g * (1.0 - jnp.eye(n, dtype=x.dtype))
    # F_i = -sum_j 2 g_ij (x_i - x_j)
    return -2.0 * jnp.sum(g[:, :, None] * diff, axis=1)


def _born_radii(sys: MDSystem, r):
    """OBC2 Born radii + the quantities needed for the chain rule."""
    n = sys.natoms
    offset = 0.009
    radii = sys.gb_radii
    orad = radii - offset
    sr = sys.gb_scales * orad

    or1 = orad[:, None]
    sr2 = sr[None, :]
    L = jnp.maximum(jnp.abs(r - sr2), or1)
    U = r + sr2
    invL, invU = 1.0 / L, 1.0 / U
    lnLU = jnp.log(L / U)
    I = 0.5 * (invL - invU + 0.25 * (r - sr2 ** 2 / r) * (invU ** 2 - invL ** 2)
               + 0.5 * lnLU / r)
    I = I + jnp.where(or1 < sr2 - r, 2.0 * (1.0 / or1 - invL), 0.0)
    active = (r + sr2 > or1).astype(r.dtype) * (1.0 - jnp.eye(n, dtype=r.dtype))
    I = I * active
    Ii = jnp.sum(I, axis=1)

    psi = Ii * orad
    garg = psi - 0.8 * psi ** 2 + 4.85 * psi ** 3
    th = jnp.tanh(garg)
    B = 1.0 / (1.0 / orad - th / radii)
    B = jnp.maximum(B, orad)

    # dB/dpsi = B^2 (1 - th^2)(1 - 1.6 psi + 14.55 psi^2) / radii
    dBdpsi = B * B * (1.0 - th * th) * (1.0 - 1.6 * psi + 14.55 * psi ** 2) / radii

    # dI_ij/dr (the HCT integral derivative), masked like I
    dL = jnp.where(jnp.abs(r - sr2) > or1, jnp.sign(r - sr2), 0.0)
    invL2, invU2 = invL ** 2, invU ** 2
    dI = 0.5 * (
        -invL2 * dL + invU2
        + 0.25 * ((1.0 + sr2 ** 2 / r ** 2) * (invU2 - invL2)
                  + (r - sr2 ** 2 / r) * (-2.0 * invU * invU2
                                          + 2.0 * invL * invL2 * dL))
        - 0.5 * lnLU / r ** 2 + 0.5 * (dL * invL - invU) / r
    )
    dI = dI + jnp.where(or1 < sr2 - r, 2.0 * invL2 * dL, 0.0)
    dI = dI * active
    return orad, B, dBdpsi, dI


def obc2_force(sys: MDSystem, x):
    """Analytic OBC2 GBSA forces; x (n, 3) -> (n, 3)."""
    n = sys.natoms
    diff, r2, r = _pair_geometry(sys, x)
    orad, B, dBdpsi, dIdr = _born_radii(sys, r)

    eps_solvent = 78.5
    pref = -0.5 * COULOMB * (1.0 - 1.0 / eps_solvent)
    q = sys.charges
    qq = q[:, None] * q[None, :]
    BB = B[:, None] * B[None, :]
    expo = jnp.exp(-r2 / (4.0 * BB))
    f2 = r2 + BB * expo
    f = jnp.sqrt(f2)
    offdiag = 1.0 - jnp.eye(n, dtype=x.dtype)

    # (a) direct r-dependence.  The energy's ordered double sum counts each
    # unordered pair twice: dE/d(r2)|unordered = 2 x the ordered-term
    # derivative (factors validated against autodiff term by term)
    dEdr2 = 2.0 * pref * qq * (-0.5) / (f2 * f) * (1.0 - expo / 4.0) * offdiag

    # (b) dE/dB_i: B_i appears in both the (i, j) and (j, i) ordered terms
    # -> 2x pair sum; plus self energy and the ACE surface term
    df2dBi = B[None, :] * expo * (1.0 + r2 / (4.0 * BB))
    dEdB = (2.0 * jnp.sum(pref * qq * (-0.5) / (f2 * f) * df2dBi * offdiag,
                          axis=1)
            + pref * (-(q ** 2) / B ** 2))
    radii = sys.gb_radii
    dEdB = dEdB + (-6.0 * 28.3919551 * (radii + 0.14) ** 2
                   * radii ** 6 / B ** 7)

    # chain to pair distances: G_ij = dE/dB_i * dB_i/dpsi_i * orad_i * dI_ij/dr
    G = (dEdB * dBdpsi * orad)[:, None] * dIdr
    dEdr_total = 2.0 * dEdr2 * r + G + G.T          # dE/dr per unordered pair

    # F_i = -sum_j dE/dr_ij * (x_i - x_j)/r
    w = dEdr_total / r * offdiag
    return -jnp.sum(w[:, :, None] * diff, axis=1)


def force_flat_analytic(sys: MDSystem, xflat):
    """Batched analytic nonbonded(+GBSA) force + autodiff bonded force.

    Drop-in alternative to ``forces.force_flat`` for large implicit-solvent
    systems (single-pass, ~half the HBM traffic of autodiff)."""
    from . import forces as F

    x = jnp.asarray(xflat)
    shape = x.shape
    xs = x.reshape((-1, sys.natoms, 3))

    def one(xi):
        f = nonbonded_force_direct(sys, xi)
        if sys.implicit == "obc2":
            f = f + obc2_force(sys, xi)
        fb = -jax.grad(lambda z: F.bond_energy(sys, z) + F.angle_energy(sys, z)
                       + F.dihedral_energy(sys, z))(xi)
        return f + fb

    return jax.vmap(one)(xs).reshape(shape)
