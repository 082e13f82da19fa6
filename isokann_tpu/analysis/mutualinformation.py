"""Mutual information between each feature and chi via 2-D KDE.

TPU-native rebuild of ``src/utils/mutualinformation.jl`` (24 LoC): 2-D
Gaussian KDE on a grid, MI integrand summed; batched over features on
device instead of the per-feature host loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def kde_mi(x, y, gridsize=100, bandwidth=None):
    """Mutual information of two samples via gridded 2-D Gaussian KDE
    (reference ``kde_mi``, ``src/utils/mutualinformation.jl:3-22``)."""
    x = jnp.asarray(x, jnp.float32).ravel()
    y = jnp.asarray(y, jnp.float32).ravel()
    n = x.shape[0]

    def grid(v):
        lo, hi = jnp.min(v), jnp.max(v)
        pad = 1e-6 * (hi - lo + 1e-6)
        return jnp.linspace(lo - pad, hi + pad, gridsize)

    xg, yg = grid(x), grid(y)
    dx = xg[1] - xg[0]
    dy = yg[1] - yg[0]

    if bandwidth is None:
        # Silverman's rule per dimension
        bx = 1.06 * jnp.std(x) * n ** (-1 / 5) + 1e-9
        by = 1.06 * jnp.std(y) * n ** (-1 / 5) + 1e-9
    else:
        bx = by = bandwidth

    kx = jnp.exp(-0.5 * ((xg[None, :] - x[:, None]) / bx) ** 2) / (bx * jnp.sqrt(2 * jnp.pi))
    ky = jnp.exp(-0.5 * ((yg[None, :] - y[:, None]) / by) ** 2) / (by * jnp.sqrt(2 * jnp.pi))
    pxy = kx.T @ ky / n                                     # (gx, gy)

    px = jnp.sum(pxy, axis=1, keepdims=True) * dy
    py = jnp.sum(pxy, axis=0, keepdims=True) * dx
    ratio = pxy / (px * py + 1e-30)
    integrand = jnp.where(pxy > 0, pxy * jnp.log(ratio + 1e-30), 0.0)
    return jnp.sum(integrand) * dx * dy


def mutual_information(iso, gridsize=100, **kwargs):
    """MI of each feature with chi (reference ``mutual_information``,
    ``src/utils/mutualinformation.jl:24-29``).  Returns (nfeatures,)."""
    f = jnp.asarray(iso.data.features)           # (n, F)
    c = jnp.asarray(iso.chis())[:, 0]
    mi = jax.vmap(lambda col: kde_mi(c, col, gridsize=gridsize, **kwargs),
                  in_axes=1)(f)
    return np.asarray(mi)
