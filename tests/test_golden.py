"""Golden-function tests: the learned chi must match the analytically
computed dominant Koopman eigenfunction (chi correlation >= 0.99 — the
BASELINE.md acceptance criterion, checked against an exact PDE solution
instead of a recorded reference run).

For overdamped Langevin dX = -V'(X)dt + sigma dW the generator is
L = -V' d/dx + sigma^2/2 d^2/dx^2.  On a grid with reflecting boundaries,
K_tau = expm(tau L); its second eigenfunction (shift-scaled to [0,1]) is
the exact 1-D ISOKANN fixed point chi.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# golden re-derivations train from scratch (2000-3000 iterations each):
# slow tier (VERDICT r4 item 6); run with ISOKANN_FULL_SUITE=1
pytestmark = pytest.mark.slow
import scipy.linalg

from isokann_tpu import Iso, Doublewell, AdamRegularized


def generator_matrix(V_prime, xs, sigma):
    """Finite-difference generator with reflecting boundaries."""
    n = len(xs)
    h = xs[1] - xs[0]
    L = np.zeros((n, n))
    D = sigma ** 2 / 2
    for i in range(n):
        b = -V_prime(xs[i])
        # diffusion (central)
        if 0 < i < n - 1:
            L[i, i - 1] += D / h ** 2
            L[i, i] += -2 * D / h ** 2
            L[i, i + 1] += D / h ** 2
            # drift (upwind-free central)
            L[i, i - 1] += -b / (2 * h)
            L[i, i + 1] += b / (2 * h)
        elif i == 0:
            L[i, i] += -D / h ** 2
            L[i, i + 1] += D / h ** 2
            L[i, i + 1] += b / h if b > 0 else 0
            L[i, i] += -b / h if b > 0 else 0
        else:
            L[i, i] += -D / h ** 2
            L[i, i - 1] += D / h ** 2
            L[i, i - 1] += -b / h if b < 0 else 0
            L[i, i] += b / h if b < 0 else 0
    return L


def exact_chi_doublewell(sigma=1.0, tau=1.0, lo=-1.5, hi=1.5, n=301):
    xs = np.linspace(lo, hi, n)
    Vp = lambda x: 4 * x * (x ** 2 - 1)
    L = generator_matrix(Vp, xs, sigma)
    K = scipy.linalg.expm(tau * L)
    vals, vecs = np.linalg.eig(K)
    order = np.argsort(-np.real(vals))
    # second eigenfunction = slowest non-trivial mode
    phi2 = np.real(vecs[:, order[1]])
    phi2 = (phi2 - phi2.min()) / (phi2.max() - phi2.min())
    if phi2[0] > 0.5:
        phi2 = 1 - phi2
    return xs, phi2, np.real(vals[order[:3]])


@pytest.fixture(scope="module")
def golden():
    return exact_chi_doublewell()


@pytest.fixture(scope="module")
def trained():
    sim = Doublewell(sigma=1.0)
    iso = Iso(sim=sim, nx=256, nk=64, key=0, minibatch=128,
              opt=AdamRegularized(1e-3, 1e-5))
    iso.run(2000)
    return iso


def test_chi_matches_generator_eigenfunction(golden, trained):
    xs, phi2, vals = golden
    # sanity of the golden solution itself
    assert vals[0] == pytest.approx(1.0, abs=1e-6)   # invariant measure
    assert 0.0 < vals[1] < 1.0

    chi = np.asarray(trained.chicoords(
        jnp.asarray(xs[:, None], jnp.float32)))[:, 0]
    chi = (chi - chi.min()) / (chi.max() - chi.min())
    if chi[0] > 0.5:
        chi = 1 - chi

    r = np.corrcoef(chi, phi2)[0, 1]
    assert r > 0.99, f"chi correlation vs exact eigenfunction: {r:.4f}"


def test_koopman_eigenvalue_matches(golden, trained):
    """The regression slope of Kchi on chi equals lambda_2 of the exact
    Koopman operator: rate -log(slope)/tau within 15%."""
    xs, phi2, vals = golden
    exact_rate = -np.log(vals[1]) / 1.0

    c = np.asarray(trained.chis()).ravel()
    k = np.asarray(trained.koopman()).ravel()
    A = np.stack([c, np.ones_like(c)], axis=1)
    (g1, _), *_ = np.linalg.lstsq(A, k, rcond=None)
    learned_rate = -np.log(g1) / trained.data.sim.lagtime
    assert learned_rate == pytest.approx(exact_rate, rel=0.15), \
        f"rate {learned_rate:.4f} vs exact {exact_rate:.4f}"


def test_chi_exit_rate_consistent(trained):
    """Ernst/Weber alpha+beta rate is positive and finite on the converged
    model (a different estimator than -log(lambda)/tau)."""
    r = trained.chi_exit_rate()
    assert np.isfinite(r) and r > 0


def test_triplewell_isa_memberships():
    """Multi-dim ISA on the triplewell: chi converges to simplex membership
    functions (rows sum to 1) and the three wells map to three distinct
    chi dimensions."""
    from isokann_tpu import Triplewell, DomainError

    iso = Iso(sim=Triplewell(sigma=0.8), nx=512, nk=32, nout=3, key=3,
              minibatch=256, opt=AdamRegularized(1e-3, 1e-5))
    try:
        iso.run(1500)
    except DomainError:
        pytest.skip("ISA degenerate for this seed (tolerated)")
    chi = np.asarray(iso.chis())
    assert chi.sum(axis=1).mean() == pytest.approx(1.0, abs=0.05)
    wells = jnp.asarray([[-1.0, 0.0], [1.0, 0.0], [0.0, 1.6]])
    cw = np.asarray(iso.chicoords(wells))
    assert sorted(np.argmax(cw, axis=1).tolist()) == [0, 1, 2], \
        f"wells not separated: {cw}"


def _generator_2d(potential, xs, ys, D):
    """Sparse FD generator of a 2-D overdamped diffusion
    L = -grad V . grad + D laplace with reflecting boundaries.

    Returns ``(L (csr, n*n), pts (n*n, 2))`` with row-major (i*ny+j)
    ordering.  Same discretization as the 1-D ``generator_matrix``
    above: central drift in the interior, one-sided at walls."""
    import scipy.sparse as sp

    nx, ny = len(xs), len(ys)
    hx, hy = xs[1] - xs[0], ys[1] - ys[0]
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel()], 1)
    gradV = jax.vmap(jax.grad(potential))(jnp.asarray(pts, jnp.float32))
    bx = -np.asarray(gradV)[:, 0].reshape(nx, ny)
    by = -np.asarray(gradV)[:, 1].reshape(nx, ny)

    rows, cols, vals = [], [], []

    def idx(i, j):
        return i * ny + j

    def add(i, j, i2, j2, v):
        rows.append(idx(i, j))
        cols.append(idx(i2, j2))
        vals.append(v)

    for i in range(nx):
        for j in range(ny):
            diag = 0.0
            if 0 < i < nx - 1:
                add(i, j, i - 1, j, D / hx**2 - bx[i, j] / (2 * hx))
                add(i, j, i + 1, j, D / hx**2 + bx[i, j] / (2 * hx))
                diag += -2 * D / hx**2
            elif i == 0:
                c = D / hx**2 + max(bx[i, j], 0) / hx
                add(i, j, i + 1, j, c)
                diag += -c
            else:
                c = D / hx**2 - min(bx[i, j], 0) / hx
                add(i, j, i - 1, j, c)
                diag += -c
            if 0 < j < ny - 1:
                add(i, j, i, j - 1, D / hy**2 - by[i, j] / (2 * hy))
                add(i, j, i, j + 1, D / hy**2 + by[i, j] / (2 * hy))
                diag += -2 * D / hy**2
            elif j == 0:
                c = D / hy**2 + max(by[i, j], 0) / hy
                add(i, j, i, j + 1, c)
                diag += -c
            else:
                c = D / hy**2 - min(by[i, j], 0) / hy
                add(i, j, i, j - 1, c)
                diag += -c
            add(i, j, i, j, diag)

    L = sp.coo_matrix((vals, (rows, cols)), shape=(nx * ny, nx * ny)).tocsr()
    return L, pts


def _mueller_brown_golden(nx=80, ny=80):
    """Second eigenfunction of the 2-D Mueller-Brown generator via sparse
    FD + shift-invert eigs (reflecting boundaries)."""
    import scipy.sparse.linalg as spla
    from isokann_tpu.simulators.langevin import mueller_brown

    xs = np.linspace(-1.4, 1.1, nx)
    ys = np.linspace(-0.25, 2.0, ny)
    L, pts = _generator_2d(mueller_brown, xs, ys, 7.0 ** 2 / 2)
    w, v = spla.eigs(L, k=3, sigma=0.1, which="LM")
    order = np.argsort(-np.real(w))
    phi = np.real(v[:, order[1]])
    phi = (phi - phi.min()) / (phi.max() - phi.min())
    V = np.asarray(jax.vmap(mueller_brown)(jnp.asarray(pts, jnp.float32)))
    return pts, phi, V


def test_mueller_brown_chi_matches_eigenfunction():
    """2-D golden test: chi on the Mueller-Brown system correlates > 0.98
    with the exact slowest generator eigenfunction over the thermally
    accessible region."""
    from isokann_tpu import MuellerBrown

    pts, phi, V = _mueller_brown_golden()
    iso = Iso(sim=MuellerBrown(), nx=512, nk=32, key=0, minibatch=256,
              opt=AdamRegularized(1e-3, 1e-5))
    iso.run(3000)
    chi = np.asarray(iso.chicoords(jnp.asarray(pts, jnp.float32)))[:, 0]
    chi = (chi - chi.min()) / (chi.max() - chi.min())
    mask = V < V.min() + 100.0
    r = abs(np.corrcoef(chi[mask], phi[mask])[0, 1])
    assert r > 0.98, f"MB chi correlation {r:.4f}"


# ==========================================================================
# Multi-dimensional (ISA) golden anchor: Triplewell psi_2, psi_3
# ==========================================================================

def _bilinear(gx, gy, grid_vals, q):
    """Bilinear interpolation of a row-major (len(gx)*len(gy),) grid field
    at query points q (n, 2)."""
    nx, ny = len(gx), len(gy)
    g = grid_vals.reshape(nx, ny)
    fx = np.clip((q[:, 0] - gx[0]) / (gx[1] - gx[0]), 0, nx - 1.001)
    fy = np.clip((q[:, 1] - gy[0]) / (gy[1] - gy[0]), 0, ny - 1.001)
    i0, j0 = fx.astype(int), fy.astype(int)
    tx, ty = fx - i0, fy - j0
    return (g[i0, j0] * (1 - tx) * (1 - ty) + g[i0 + 1, j0] * tx * (1 - ty)
            + g[i0, j0 + 1] * (1 - tx) * ty + g[i0 + 1, j0 + 1] * tx * ty)


def _triplewell_golden(nx=100, ny=100):
    """psi_2, psi_3 of the default Triplewell (sigma=1) generator on its
    support box, via sparse FD + shift-invert eigs.

    Spectrum at this discretization: exp(w tau) at tau=1 is
    [1, 0.965, 0.548, 0.023, ...] — span{psi_2, psi_3} is separated from
    the rest by a ~24x eigenvalue gap, so the 3-D ISOKANN chi (whose ISA
    fixed point spans {1, psi_2, psi_3}, reference src/isotarget.jl:70-107)
    has a well-conditioned exact target subspace."""
    import scipy.sparse.linalg as spla
    from isokann_tpu.simulators.langevin import triplewell

    gx = np.linspace(-2.0, 2.0, nx)
    gy = np.linspace(-1.5, 2.5, ny)
    L, pts = _generator_2d(triplewell, gx, gy, 1.0 ** 2 / 2)
    w, v = spla.eigs(L, k=4, sigma=0.02, which="LM")
    order = np.argsort(-np.real(w))
    w = np.real(w[order])
    psi = np.real(v[:, order])
    # sanity of the golden solution itself
    assert abs(w[0]) < 1e-8                    # invariant measure
    assert w[2] > 5 * w[3]                     # gap below psi_3 (w negative)
    return gx, gy, psi, w


def test_triplewell_multidim_subspace_golden():
    """Quantitative N-D golden anchor (the ISA counterpart of the 1-D
    doublewell/MB anchors): a 3-output chi trained with TransformISA on
    the default Triplewell must

      (a) contain the exact generator eigenfunctions psi_2 AND psi_3 in
          span{1, chi_1..chi_3} with multiple correlation R >= 0.95,
      (b) form a partition of unity (rows sum to 1), and
      (c) localize each chi column on a distinct well (ISA vertex
          structure).

    Reference: TransformISA src/isotarget.jl:70-107 (the default N-D
    transform).  The model is a fixed-width 32-unit densenet: the default
    low-dim smallnet (8 units, reference src/models.jl:102-108) is
    capacity-limited on this anchor (R(psi_3) plateaus ~0.93); with 32
    units the acceptance is robust across seeds (R >= 0.998 for keys
    0/1/3 at this exact configuration)."""
    from isokann_tpu import Triplewell, DomainError
    from isokann_tpu.analysis.msm import containment_R
    from isokann_tpu.models import densenet

    gx, gy, psi, w = _triplewell_golden()
    model = densenet([2, 32, 32, 32, 3], "sigmoid", "identity", False,
                     jax.random.PRNGKey(100))
    iso = Iso(sim=Triplewell(), nx=1024, nk=64, nout=3, key=0,
              minibatch=256, model=model, opt=AdamRegularized(1e-3, 1e-5))
    iso.run(1500)

    chi = np.asarray(iso.chis())                       # (1024, 3)
    samp = np.asarray(iso.data.coords)
    R2, _ = containment_R(_bilinear(gx, gy, psi[:, 1], samp), chi)
    R3, _ = containment_R(_bilinear(gx, gy, psi[:, 2], samp), chi)
    assert R2 >= 0.95, f"psi_2 containment R={R2:.4f}"
    assert R3 >= 0.95, f"psi_3 containment R={R3:.4f}"

    rowsum = chi.sum(axis=1)
    assert rowsum.mean() == pytest.approx(1.0, abs=0.05)
    assert rowsum.std() < 0.1

    wells = jnp.asarray([[-1.0, 0.0], [1.0, 0.0], [0.0, 5.0 / 3.0]])
    cw = np.asarray(iso.chicoords(wells))
    assert sorted(np.argmax(cw, axis=1).tolist()) == [0, 1, 2], \
        f"wells not separated: {cw}"
