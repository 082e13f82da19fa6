"""CMAP torsion-torsion correction maps (ff19SB / CHARMM class).

E = M_t(phi, psi): a periodic bicubic surface over two coupled torsion
angles, added on top of the ordinary periodic torsions.  The embedded
force field (ff99SB-class) has none, but the exact-parameter importers
(``md/amberio.py`` prmtop CMAP_* sections, ``md/openmm_xml.py``
CMAPTorsionForce) carry them, so tleap ff19SB / chamber output runs with
its full functional form.

TPU shape: the number of CMAP terms is tiny (one per residue), so the
angles come from plain coordinate gathers and the energy from a constant
coefficient-table gather — the table gather has no VJP into coordinates,
and the (nc, 8, 3) coordinate gather is far below the dense-incidence
crossover that motivates the matmul formulation of the big bonded terms
(``md/forces.py:24-32``).

Bicubic patches are precomputed on host in f64 (``bicubic_coefs``) from
the grid values with periodic centered-difference derivatives — the
CHARMM/Amber construction: C1-continuous, exact at the grid points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def has_cmap(sys) -> bool:
    ci = getattr(sys, "cmap_idx", None)
    return ci is not None and ci.shape[0] > 0


# inverse bicubic basis: E(u, v) = sum_mn c[m, n] u^m v^n with
# c = M F M^T, F the 4x4 block of (values, d/du, d/dv, d2/dudv) at the
# patch corners, derivatives in cell units
_M = np.array([[1.0, 0.0, 0.0, 0.0],
               [0.0, 0.0, 1.0, 0.0],
               [-3.0, 3.0, -2.0, -1.0],
               [2.0, -2.0, 1.0, 1.0]])


def bicubic_coefs(grid):
    """(R, R) periodic grid of energies -> (R, R, 4, 4) patch coefficients.

    Derivatives by periodic centered differences in cell units
    (df/du = (f[i+1] - f[i-1]) / 2), the standard CHARMM/Amber CMAP
    construction; the resulting surface is C1 and interpolating."""
    f = np.asarray(grid, np.float64)
    R = f.shape[0]
    if f.shape != (R, R):
        raise ValueError("CMAP grid must be square")
    fu = (np.roll(f, -1, axis=0) - np.roll(f, 1, axis=0)) / 2.0
    fv = (np.roll(f, -1, axis=1) - np.roll(f, 1, axis=1)) / 2.0
    fuv = (np.roll(fu, -1, axis=1) - np.roll(fu, 1, axis=1)) / 2.0

    # corner blocks for every patch at once (periodic rolls)
    f00 = f
    f10 = np.roll(f, -1, axis=0)
    f01 = np.roll(f, -1, axis=1)
    f11 = np.roll(f10, -1, axis=1)
    fu00, fu10 = fu, np.roll(fu, -1, axis=0)
    fu01, fu11 = np.roll(fu, -1, axis=1), np.roll(np.roll(fu, -1, 0), -1, 1)
    fv00, fv10 = fv, np.roll(fv, -1, axis=0)
    fv01, fv11 = np.roll(fv, -1, axis=1), np.roll(np.roll(fv, -1, 0), -1, 1)
    fw00, fw10 = fuv, np.roll(fuv, -1, axis=0)
    fw01, fw11 = np.roll(fuv, -1, axis=1), \
        np.roll(np.roll(fuv, -1, 0), -1, 1)
    F = np.empty((R, R, 4, 4))
    F[..., 0, 0], F[..., 0, 1], F[..., 0, 2], F[..., 0, 3] = \
        f00, f01, fv00, fv01
    F[..., 1, 0], F[..., 1, 1], F[..., 1, 2], F[..., 1, 3] = \
        f10, f11, fv10, fv11
    F[..., 2, 0], F[..., 2, 1], F[..., 2, 2], F[..., 2, 3] = \
        fu00, fu01, fw00, fw01
    F[..., 3, 0], F[..., 3, 1], F[..., 3, 2], F[..., 3, 3] = \
        fu10, fu11, fw10, fw11
    coefs = np.einsum("ab,ijbc,dc->ijad", _M, F, _M)
    return coefs


def _torsion(p0, p1, p2, p3):
    b1 = p1 - p0
    b2 = p2 - p1
    b3 = p3 - p2
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    b2n = b2 / (jnp.linalg.norm(b2, axis=-1, keepdims=True) + 1e-12)
    m1 = jnp.cross(n1, b2n)
    return jnp.arctan2(jnp.sum(m1 * n2, axis=-1), jnp.sum(n1 * n2, axis=-1))


def _cmap_e_points(sys, pts):
    """Energy sum from gathered torsion points pts: (nc, 8, 3)."""
    coefs = sys.cmap_coefs
    nt, R = coefs.shape[0], coefs.shape[1]
    phi = _torsion(pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3])
    psi = _torsion(pts[:, 4], pts[:, 5], pts[:, 6], pts[:, 7])
    h = 2.0 * jnp.pi / R
    su = (phi + jnp.pi) / h
    sv = (psi + jnp.pi) / h
    iu = jnp.clip(jnp.floor(su), 0, R - 1).astype(jnp.int32) % R
    iv = jnp.clip(jnp.floor(sv), 0, R - 1).astype(jnp.int32) % R
    u = su - iu
    v = sv - iv
    flat = coefs.reshape(nt * R * R, 4, 4)
    c = flat[sys.cmap_type * (R * R) + iu * R + iv]      # (nc, 4, 4)
    up = jnp.stack([jnp.ones_like(u), u, u * u, u * u * u], axis=-1)
    vp = jnp.stack([jnp.ones_like(v), v, v * v, v * v * v], axis=-1)
    return jnp.sum(up[:, :, None] * c * vp[:, None, :])


def cmap_energy(sys, x):
    """Total CMAP energy; x: (natoms, 3)."""
    if not has_cmap(sys):
        return 0.0
    return _cmap_e_points(sys, x[sys.cmap_idx])


def cmap_force(sys, x):
    """Analytic-forward CMAP forces via a per-term gradient + scatter-add
    over the (nc, 8) gathered atoms (the sparse-path convention,
    ``md/neighbor.py:bonded_force_sparse``)."""
    if not has_cmap(sys):
        return jnp.zeros_like(x)
    pts = x[sys.cmap_idx]
    g = jax.grad(lambda p: _cmap_e_points(sys, p))(pts)
    f = jnp.zeros_like(x)
    return f.at[sys.cmap_idx.reshape(-1)].add(-g.reshape(-1, 3))
