"""Kabsch alignment, aligned RMSD, pairwise aligned RMSD — batched on device.

TPU-native rebuild of ``src/utils/align.jl``: the reference loops
per-structure SVDs on CPU or calls CUDA's batched SVD
(``src/utils/align.jl:104-114``); here everything is one batched
``jnp.linalg.svd`` under jit/vmap.

Conventions (row-major): a structure is ``(natoms, 3)``; batches lead:
``(batch, natoms, 3)``.  Flat ``(..., 3N)`` wrappers are provided since the
data layer stores flat coordinates.  Optional per-atom ``weights`` as in the
reference.

Unlike the reference (plain ``U V^T``), the rotation includes the Kabsch
determinant sign correction so reflections are never applied.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _as_struct(x):
    """(..., 3N) -> (..., N, 3)."""
    x = jnp.asarray(x)
    return x.reshape(x.shape[:-1] + (x.shape[-1] // 3, 3))


def _weights_and_sum(weights, n, dtype):
    if weights is None:
        return jnp.ones((n,), dtype), float(n)
    w = jnp.asarray(weights, dtype)
    return w, jnp.sum(w)


def centered(x, weights=None):
    """Remove the (weighted) centroid; x: (..., N, 3)."""
    x = jnp.asarray(x)
    w, ws = _weights_and_sum(weights, x.shape[-2], x.dtype)
    m = jnp.sum(x * w[:, None], axis=-2, keepdims=True) / ws
    return x - m


def kabsch_rotation(x, y, weights=None):
    """Rotation R minimizing |R y - x| for centered structures
    (reference ``kabschrotation`` concept, ``src/utils/align.jl:40-46``).

    x, y: (..., N, 3) centered. Returns (..., 3, 3)."""
    w, _ = _weights_and_sum(weights, x.shape[-2], x.dtype)
    h = jnp.swapaxes(x * w[:, None], -1, -2) @ y          # (..., 3, 3)
    u, s, vt = jnp.linalg.svd(h)
    det = jnp.linalg.det(u @ vt)
    d = jnp.concatenate([jnp.ones(det.shape + (2,)), det[..., None]], axis=-1)
    return (u * d[..., None, :]) @ vt


@partial(jax.jit, static_argnames=("flat",))
def align(x, ys, weights=None, flat=True):
    """Align all structures in ``ys`` to ``x``
    (reference ``align``, ``src/utils/align.jl:34-49``).

    flat=True: x (3N,), ys (..., 3N).  flat=False: x (N,3), ys (..., N,3)."""
    if flat:
        xs_, ys_ = _as_struct(x), _as_struct(ys)
    else:
        xs_, ys_ = jnp.asarray(x), jnp.asarray(ys)
    w, ws = _weights_and_sum(weights, xs_.shape[-2], xs_.dtype)
    mx = jnp.sum(xs_ * w[:, None], axis=-2, keepdims=True) / ws
    xc = xs_ - mx
    yc = centered(ys_, weights)
    r = kabsch_rotation(xc, yc, weights)                   # (..., 3, 3)
    out = yc @ jnp.swapaxes(r, -1, -2) + mx
    if flat:
        return out.reshape(jnp.asarray(ys).shape)
    return out


def _qcp_lambda_max(h, ga, gb, iters=40):
    """Largest eigenvalue of the 4x4 quaternion key matrix from the 3x3
    correlation ``h`` (Theobald's QCP characteristic quartic + Newton).

    All-elementwise: no SVD/QR custom call, so arbitrarily large batches
    never hit the TPU scoped-VMEM limits that batched
    ``jnp.linalg.svd`` does (v5e faults at ~5e4 3x3 problems/program).
    ``ga``/``gb`` are the weighted inner products tr(X^T W X), tr(Y^T W Y);
    the maximum is over PROPER rotations only (quaternions), matching the
    Kabsch determinant correction in :func:`kabsch_rotation`."""
    sxx, sxy, sxz = h[..., 0, 0], h[..., 0, 1], h[..., 0, 2]
    syx, syy, syz = h[..., 1, 0], h[..., 1, 1], h[..., 1, 2]
    szx, szy, szz = h[..., 2, 0], h[..., 2, 1], h[..., 2, 2]

    sxx2, syy2, szz2 = sxx * sxx, syy * syy, szz * szz
    sxy2, syx2 = sxy * sxy, syx * syx
    sxz2, szx2 = sxz * sxz, szx * szx
    syz2, szy2 = syz * syz, szy * szy

    c2 = -2.0 * (sxx2 + syy2 + szz2 + sxy2 + syx2 + sxz2 + szx2
                 + syz2 + szy2)
    c1 = 8.0 * (sxx * syz * szy + syy * szx * sxz + szz * sxy * syx
                - sxx * syy * szz - syz * szx * sxy - szy * syx * sxz)

    sxzpszx, sxzmszx = sxz + szx, sxz - szx
    syzpszy, syzmszy = syz + szy, syz - szy
    sxypsyx, sxymsyx = sxy + syx, sxy - syx
    sxxpsyy, sxxmsyy = sxx + syy, sxx - syy
    a = sxy2 + sxz2 - syx2 - szx2
    b = syy2 + szz2 - sxx2 + syz2 + szy2
    c = 2.0 * (syz * szy - syy * szz)
    c0 = (a * a + (b + c) * (b - c)
          + (-sxzpszx * syzmszy + sxymsyx * (sxxmsyy - szz))
          * (-sxzmszx * syzpszy + sxymsyx * (sxxmsyy + szz))
          + (-sxzpszx * syzpszy - sxypsyx * (sxxpsyy - szz))
          * (-sxzmszx * syzmszy - sxypsyx * (sxxpsyy + szz))
          + (sxypsyx * syzpszy + sxzpszx * (sxxmsyy + szz))
          * (-sxymsyx * syzmszy + sxzpszx * (sxxpsyy + szz))
          + (sxypsyx * syzmszy + sxzmszx * (sxxmsyy - szz))
          * (-sxymsyx * syzpszy + sxzmszx * (sxxpsyy - szz)))

    # Newton from lam0 = (ga+gb)/2 >= lam_max: monotone convergence to
    # the largest root of P(l) = l^4 + c2 l^2 + c1 l + c0.
    lam0 = 0.5 * (ga + gb)

    def body(_, lam):
        lam2 = lam * lam
        p = lam2 * lam2 + c2 * lam2 + c1 * lam + c0
        dp = lam * (4.0 * lam2 + 2.0 * c2) + c1
        safe = jnp.where(jnp.abs(dp) > 1e-30, dp, 1.0)
        step = jnp.where(jnp.abs(dp) > 1e-30, p / safe, 0.0)
        return lam - step

    return jax.lax.fori_loop(0, iters, body, lam0)


def _qcp_rotation(h, ga, gb, iters=40):
    """Optimal proper rotation R (..., 3, 3) from the 3x3 correlation
    ``h`` via Theobald QCP: eigenvector of the 4x4 quaternion key matrix
    for lambda_max, read off the adjugate of (K - lam I).

    Elementwise-only (static 3x3 subdeterminants), so it batches on TPU
    without the ``jnp.linalg.svd`` custom call that scoped-VMEM-faults
    at ~5e4 problems/program (docs/v5e_fault_report.md).  Matches
    :func:`kabsch_rotation` (proper rotations, R y aligns onto x)."""
    lam = _qcp_lambda_max(h, ga, gb, iters)
    sxx, sxy, sxz = h[..., 0, 0], h[..., 0, 1], h[..., 0, 2]
    syx, syy, syz = h[..., 1, 0], h[..., 1, 1], h[..., 1, 2]
    szx, szy, szz = h[..., 2, 0], h[..., 2, 1], h[..., 2, 2]

    k00 = sxx + syy + szz - lam
    k11 = sxx - syy - szz - lam
    k22 = syy - sxx - szz - lam
    k33 = szz - sxx - syy - lam
    k01, k02, k03 = syz - szy, szx - sxz, sxy - syx
    k12, k13, k23 = sxy + syx, szx + sxz, syz + szy

    A = jnp.stack([k00, k01, k02, k03,
                   k01, k11, k12, k13,
                   k02, k12, k22, k23,
                   k03, k13, k23, k33], axis=-1)
    A = A.reshape(A.shape[:-1] + (4, 4))

    def minor(i, j):
        r = [k for k in range(4) if k != i]
        c = [k for k in range(4) if k != j]
        m = A[..., r, :][..., :, c]
        return (m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2]
                                - m[..., 1, 2] * m[..., 2, 1])
                - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2]
                                  - m[..., 1, 2] * m[..., 2, 0])
                + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1]
                                  - m[..., 1, 1] * m[..., 2, 0]))

    # adj(A) = c * q q^T for the singular symmetric A; column j is q
    # scaled by c*q_j — take the best-conditioned one (largest norm)
    cols = []
    for j in range(4):
        cols.append(jnp.stack(
            [((-1) ** (i + j)) * minor(j, i) for i in range(4)], axis=-1))
    cols = jnp.stack(cols, axis=-1)                        # (..., 4, 4)
    nsq = jnp.sum(cols * cols, axis=-2)                    # (..., 4)
    onehot = jax.nn.one_hot(jnp.argmax(nsq, axis=-1), 4, dtype=cols.dtype)
    q = jnp.sum(cols * onehot[..., None, :], axis=-1)      # (..., 4)
    nrm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    # degenerate adjugate (multiple optimal rotations): fall back to
    # identity — the residual is rotation-independent there
    e0 = jnp.zeros_like(q).at[..., 0].set(1.0)
    q = jnp.where(nrm > 1e-20, q / jnp.where(nrm > 1e-20, nrm, 1.0), e0)

    # conjugate quaternion: the K-matrix eigenvector rotates x onto y;
    # kabsch_rotation's convention (R y -> x) is its inverse
    w, x, y, z = q[..., 0], -q[..., 1], -q[..., 2], -q[..., 3]
    r00 = w * w + x * x - y * y - z * z
    r11 = w * w - x * x + y * y - z * z
    r22 = w * w - x * x - y * y + z * z
    r01, r02 = 2 * (x * y - w * z), 2 * (x * z + w * y)
    r10, r12 = 2 * (x * y + w * z), 2 * (y * z - w * x)
    r20, r21 = 2 * (x * z - w * y), 2 * (y * z + w * x)
    R = jnp.stack([r00, r01, r02, r10, r11, r12, r20, r21, r22], axis=-1)
    return R.reshape(R.shape[:-1] + (3, 3))


@partial(jax.jit, static_argnames=("flat",))
def aligned_rmsd(x, ys, weights=None, flat=True):
    """RMSD of ``x`` to each structure in ``ys`` after optimal alignment
    (reference ``src/utils/align.jl:59-68``).

    Computed via Theobald QCP (rotation from the adjugate of the 4x4
    key matrix at lam_max, then the residual DIRECTLY as a sum of
    squares) rather than batched SVD: elementwise-only + one small
    matmul, so huge pair batches (reactive-path OM costs) compile
    without the batched-SVD scoped-VMEM fault
    (docs/v5e_fault_report.md).  The direct residual avoids the
    (ga + gb - 2 lam) cancellation, so rmsd(x, x) ~ f32 eps rather
    than ~1e-3 of the structure radius."""
    if flat:
        xs_, ys_ = _as_struct(x), _as_struct(ys)
    else:
        xs_, ys_ = jnp.asarray(x), jnp.asarray(ys)
    w, ws = _weights_and_sum(weights, xs_.shape[-2], xs_.dtype)
    mx = jnp.sum(xs_ * w[:, None], axis=-2, keepdims=True) / ws
    xc = xs_ - mx
    yc = centered(ys_, weights)
    xw = xc * w[:, None]
    h = jnp.swapaxes(xw, -1, -2) @ yc                      # (..., 3, 3)
    ga = jnp.sum(xw * xc, axis=(-1, -2))
    gb = jnp.sum(yc * yc * w[:, None], axis=(-1, -2))
    r = _qcp_rotation(h, ga, gb)
    d = xc - yc @ jnp.swapaxes(r, -1, -2)
    return jnp.sqrt(jnp.sum(d * d * w[:, None], axis=(-1, -2)) / ws)


def aligned_rmsd_one_to_many(x, ys, weights=None):
    """Distance function for picking: x (3N,), ys (m, 3N) -> (m,)."""
    return aligned_rmsd(jnp.asarray(x), jnp.asarray(ys), weights=weights)


def pairwise_aligned_rmsd(xs, mask=None, weights=None, memsize=1_000_000_000):
    """All-pairs aligned RMSD, optionally restricted by a boolean mask.

    ``xs``: (n, 3N) flat conformations. Returns an (n, n) dense matrix with
    NaN at unmasked entries (reference ``src/utils/align.jl:83-101``; the
    sparse-mask + memory-batching semantics are kept, the kernel is batched
    Kabsch on device)."""
    xs = jnp.asarray(xs)
    n = xs.shape[0]
    if mask is None:
        i, j = np.triu_indices(n, k=1)
    else:
        mask = np.asarray(mask)
        i, j = np.nonzero(mask)
    out = np.full((n, n), np.nan, dtype=np.float64)
    np.fill_diagonal(out, 0.0)

    natoms = xs.shape[1] // 3
    batch = max(1, int(memsize // max(xs.itemsize * 3 * natoms * 2, 1)))
    for lo in range(0, len(i), batch):
        sl = slice(lo, lo + batch)
        d = np.asarray(aligned_rmsd(xs[i[sl]].reshape(-1, natoms, 3),
                                    xs[j[sl]].reshape(-1, natoms, 3),
                                    weights=weights, flat=False))
        out[i[sl], j[sl]] = d
        out[j[sl], i[sl]] = d
    return out


def aligntrajectory(traj, weights=None):
    """Align frames successively to their predecessor
    (reference ``src/utils/align.jl:123-130``).  traj: (T, 3N)."""
    traj = jnp.asarray(traj)

    def step(prev, x):
        a = align(prev, x, weights=weights)
        return a, a

    first = centered(_as_struct(traj[0]), weights).reshape(-1)
    _, rest = jax.lax.scan(step, first, traj[1:])
    return jnp.concatenate([first[None, :], rest], axis=0)
