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


def _mueller_brown_golden(nx=80, ny=80):
    """Second eigenfunction of the 2-D Mueller-Brown generator via sparse
    FD + shift-invert eigs (reflecting boundaries)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    from isokann_tpu.simulators.langevin import mueller_brown

    xs = np.linspace(-1.4, 1.1, nx)
    ys = np.linspace(-0.25, 2.0, ny)
    hx, hy = xs[1] - xs[0], ys[1] - ys[0]
    D = 7.0 ** 2 / 2
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel()], 1)
    gradV = jax.vmap(jax.grad(mueller_brown))(jnp.asarray(pts, jnp.float32))
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
