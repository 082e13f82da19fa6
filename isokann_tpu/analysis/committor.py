"""Committor computation from a rate matrix.

Rebuild of the reference committor solver
(``scripts/251126_carsten/committor.jl:4-61``): boundary-condition row
surgery on the generator + diagonal-preconditioned GMRES.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def committor_system(Q, classes):
    """Impose committor boundary conditions on the generator Q.

    ``classes``: 0 for interior states, 1 for set B (committor 1), any other
    nonzero for set A (committor 0).  Returns (A, b) of the linear system
    (reference ``committor_system``, ``committor.jl:34-61``)."""
    Q = sp.csr_matrix(Q, dtype=np.float64, copy=True)
    b = np.asarray(classes, dtype=np.float64).copy()
    n = Q.shape[0]
    boundary = np.flatnonzero(b != 0)
    # zero boundary rows, unit diagonal
    mask = np.ones(n, bool)
    mask[boundary] = False
    D = sp.diags(mask.astype(np.float64))
    Q = D @ Q + sp.diags((~mask).astype(np.float64))
    b[(b != 0) & (b != 1)] = 0.0
    return Q.tocsr(), b


def solve_committor(Q, classes, maxiter=1000, tol=1e-8):
    """GMRES solve with diagonal preconditioner
    (reference ``committor``, ``committor.jl:4-29``)."""
    A, b = committor_system(Q, classes)
    d = A.diagonal()
    d[d == 0] = 1.0
    M = sp.diags(1.0 / d)
    c, info = spla.gmres(A, b, x0=b.copy(), maxiter=maxiter, rtol=tol, M=M)
    if info != 0:
        import warnings
        warnings.warn(f"Committor computation did not converge (info={info})")
    return c
