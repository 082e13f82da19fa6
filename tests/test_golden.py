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
