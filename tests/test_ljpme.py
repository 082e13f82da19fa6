"""LJPME: Ewald-summed r^-6 dispersion (md/ewald.py, method="LJPME").

Reference counterpart: OpenMM's LJPME nonbonded method passed through by
``src/simulators/mopenmm.py:101-115``.  The k-space kernel h^(k) is
derived, not transcribed — these tests pin it to numeric quadrature and
to brute-force lattice sums."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isokann_tpu as itk
from isokann_tpu.md import forces as Fd
from isokann_tpu.md.ewald import (ewald_kvectors, ljpme_coefs, ljpme_hhat,
                                  ljpme_hker, ljpme_const_energy)
from isokann_tpu.md.system import MDSystem, build_system


def test_hhat_matches_quadrature():
    """Closed-form h^(k) == (4 pi/k) int_0^inf r sin(kr) h(r) dr."""
    beta = 2.7
    r = np.linspace(1e-4, 30.0 / beta, 2_000_000)
    x2 = (beta * r) ** 2
    g6 = (1.0 + x2 * (1.0 + 0.5 * x2)) * np.exp(-x2)
    with np.errstate(divide="ignore"):
        h = (1.0 - g6) / r ** 6
    # the direct form loses all f64 digits for x << 1 (1 - g6 ~ x^6/6);
    # the quadrature itself needs the series branch there
    h = np.where(x2 < 0.01,
                 beta ** 6 * (1 / 6 - x2 / 8 + x2 * x2 / 20), h)
    import scipy.special as sp

    def hhat64(k2):
        b2 = k2 / (4.0 * beta * beta)
        b = math.sqrt(b2)
        return (math.pi ** 1.5 * beta ** 3 / 3.0) * (
            (1.0 - 2.0 * b2) * math.exp(-b2)
            + 2.0 * math.sqrt(math.pi) * b2 * b * sp.erfc(b))

    scale = hhat64(0.0)
    for k in (0.5, 2.0, 5.0, 12.0):
        num = 4.0 * math.pi / k * np.trapezoid(r * np.sin(k * r) * h, r)
        closed = hhat64(k * k)
        assert closed == pytest.approx(num, rel=2e-4), k
        # device (f32) closed form: large-b cancellation costs relative
        # accuracy only where h^ is already tiny — absolute error bounded
        dev = float(ljpme_hhat(jnp.asarray(k * k), beta))
        assert dev == pytest.approx(closed, abs=2e-4 * scale), k
    # k=0 limit: integral of h over space = pi^{3/2} beta^3 / 3
    # (+ the analytic 4 pi/(3 R^3) tail beyond the truncation radius)
    R = r[-1]
    h0 = (4.0 * math.pi * np.trapezoid(r * r * h, r)
          + 4.0 * math.pi / (3.0 * R ** 3))
    assert float(ljpme_hhat(jnp.asarray(0.0), beta)) == pytest.approx(
        h0, rel=1e-4)


def test_hker_series_branch_continuous():
    """Series and direct branches agree around the switch point."""
    beta = 3.0
    for x in (0.2, 0.3, 0.34, 0.36, 0.5, 1.0):
        r2 = (x / beta) ** 2
        direct = (1.0 - (1.0 + x * x + x ** 4 / 2.0)
                  * math.exp(-(x * x))) / (x / beta) ** 6
        got = float(ljpme_hker(jnp.asarray(r2, jnp.float32), beta))
        assert got == pytest.approx(direct, rel=2e-4), x


def _lj_gas(n=24, L=1.6, rmin_half=0.17, eps=0.6, cutoff=0.75, tol=1e-5,
            seed=0):
    """Uniform-type neutral LJ gas in a cubic box as an MDSystem
    (geometric == Amber mixing for a single type, so the LJPME geometric
    approximation is exact and brute-force lattice sums are the truth)."""
    rng = np.random.default_rng(seed)
    # jittered grid keeps the minimum distance sane
    g = int(np.ceil(n ** (1 / 3)))
    pts = np.stack(np.meshgrid(*[np.arange(g)] * 3), -1).reshape(-1, 3)
    x = (pts[:n] + 0.5 + 0.25 * rng.uniform(-1, 1, (n, 3))) * (L / g)

    from isokann_tpu.md.ewald import ewald_alpha
    alpha = ewald_alpha(cutoff, tol)
    kv, cf = ewald_kvectors((L, L, L), alpha, tol)
    q6 = np.full(n, math.sqrt(2.0 * eps) * (2.0 * rmin_half) ** 3)
    cf6 = ljpme_coefs((L, L, L), alpha, kv)

    z0 = np.zeros(0)
    zi = np.zeros((0, 2), np.int32)
    e = np.ones((n, n)) - np.eye(n)
    sys = MDSystem(
        bond_idx=jnp.asarray(zi), bond_k=jnp.asarray(z0),
        bond_r0=jnp.asarray(z0),
        angle_idx=jnp.asarray(np.zeros((0, 3), np.int32)),
        angle_k=jnp.asarray(z0), angle_t0=jnp.asarray(z0),
        dih_idx=jnp.asarray(np.zeros((0, 4), np.int32)),
        dih_pk=jnp.asarray(z0), dih_phase=jnp.asarray(z0),
        dih_n=jnp.asarray(z0),
        bond_D=jnp.zeros((0, n)), angle_U=jnp.zeros((0, n)),
        angle_V=jnp.zeros((0, n)), dih_B1=jnp.zeros((0, n)),
        dih_B2=jnp.zeros((0, n)), dih_B3=jnp.zeros((0, n)),
        charges=jnp.zeros(n), rmin_half=jnp.full((n,), rmin_half),
        eps=jnp.full((n,), eps),
        qq_scale=jnp.asarray(e), lj_scale=jnp.asarray(e),
        masses=jnp.full((n,), 40.0),
        gb_radii=jnp.zeros(0), gb_scales=jnp.zeros(0),
        excl_idx=jnp.asarray(zi), excl_qq=jnp.asarray(z0),
        excl_lj=jnp.asarray(z0),
        ewald_kvecs=jnp.asarray(kv, jnp.float32),
        ewald_coefs=jnp.asarray(cf, jnp.float32),
        q6=jnp.asarray(q6, jnp.float32),
        ljpme_coefs=jnp.asarray(cf6, jnp.float32),
        ljpme_beta=float(alpha), ewald_alpha=float(alpha),
        method="LJPME", cutoff=cutoff, box=(L, L, L),
    )
    return sys, x


def _brute_lattice_lj(x, L, rmin_half, eps, nimg=7):
    """f64 brute-force periodic LJ energy: sum over image cells
    |n| <= nimg plus the analytic continuum remainder of the r^-6 part."""
    n = x.shape[0]
    c6 = 2.0 * eps * (2.0 * rmin_half) ** 6
    c12 = eps * (2.0 * rmin_half) ** 12
    e = 0.0
    rng = range(-nimg, nimg + 1)
    for ax in rng:
        for ay in rng:
            for az in rng:
                shift = np.array([ax, ay, az], float) * L
                d = x[:, None, :] - x[None, :, :] + shift
                r2 = np.sum(d * d, axis=-1)
                if ax == ay == az == 0:
                    np.fill_diagonal(r2, np.inf)
                r6 = r2 ** 3
                e += 0.5 * np.sum(c12 / (r6 * r6) - c6 / r6)
    # continuum remainder beyond the image sphere R ~ nimg*L
    R = (nimg + 0.5) * L
    e += -0.5 * n * n * (4.0 * math.pi / L ** 3) * c6 / (3.0 * R ** 3)
    return e


def test_lattice_sum_anchor():
    """Total LJPME energy == brute-force periodic lattice sum for a
    uniform-type LJ gas (the Madelung-style anchor for the dispersion
    part; charges are zero so only LJ contributes)."""
    sys, x = _lj_gas()
    e = float(Fd.nonbonded_energy(sys, jnp.asarray(x, jnp.float32)))
    e_ref = _brute_lattice_lj(x, 1.6, 0.17, 0.6)
    assert e == pytest.approx(e_ref, abs=max(0.02, 2e-3 * abs(e_ref))), \
        (e, e_ref)


def test_lattice_anchor_across_densities():
    """The anchor holds as the box shrinks/grows (stresses the k=0
    volume term that replaces the tail correction)."""
    for L, tol in ((1.3, 3e-3), (2.0, 3e-3)):
        sys, x = _lj_gas(L=L, cutoff=0.6, seed=1)
        e = float(Fd.nonbonded_energy(sys, jnp.asarray(x, jnp.float32)))
        e_ref = _brute_lattice_lj(x, L, 0.17, 0.6)
        assert e == pytest.approx(e_ref, abs=max(0.03, tol * abs(e_ref))), L


def test_translation_invariance_and_forces():
    sys, x = _lj_gas()
    xj = jnp.asarray(x, jnp.float32)
    e0 = float(Fd.nonbonded_energy(sys, xj))
    e1 = float(Fd.nonbonded_energy(sys, xj + jnp.asarray([0.31, -0.2, 0.11])))
    assert e1 == pytest.approx(e0, abs=5e-3 + 1e-5 * abs(e0))
    f = np.asarray(jax.grad(lambda z: Fd.nonbonded_energy(sys, z))(xj))
    assert np.isfinite(f).all()
    # zero net force (translation invariance of the gradient)
    assert np.abs(f.sum(0)).max() < 5e-3 * np.abs(f).max()


@pytest.fixture(scope="module")
def solvated():
    return itk.MDSimulation(addwater=True, padding=0.62)


def test_ljpme_vs_tail_correction_on_water(solvated):
    """LJPME's long-range dispersion ~= the isotropic tail correction on a
    homogeneous water box (they estimate the same physics; the tail
    correction is the mean-field limit of the LJPME k=0 term)."""
    s_lj = build_system(solvated.structure, method="LJPME")
    s_ew = build_system(solvated.structure, method="Ewald")
    x = jnp.asarray(np.asarray(solvated.coords).reshape(-1, 3))
    d = float(Fd.nonbonded_energy(s_lj, x) - Fd.nonbonded_energy(s_ew, x))
    tail = float(Fd.dispersion_correction_energy(s_ew))
    assert tail < 0 and d < 0
    assert d == pytest.approx(tail, rel=0.35), (d, tail)


def test_ljpme_traced_box_matches_static(solvated):
    s_lj = build_system(solvated.structure, method="LJPME")
    x = jnp.asarray(np.asarray(solvated.coords).reshape(-1, 3))
    e0 = float(Fd.nonbonded_energy(s_lj, x))
    e1 = float(Fd.nonbonded_energy(s_lj, x, box=jnp.asarray(s_lj.box)))
    assert e1 == pytest.approx(e0, abs=0.05 + 1e-5 * abs(e0))


@pytest.mark.slow
def test_ljpme_sparse_matches_dense(solvated):
    """O(n) neighbor-engine LJPME == dense all-pairs LJPME (energy and
    analytic-vs-autodiff forces)."""
    from isokann_tpu.md.neighbor import (NeighborPlan, force_neighbor,
                                         neighbor_nonbonded_energy)

    s_d = build_system(solvated.structure, method="LJPME")
    s_s = build_system(solvated.structure, method="LJPME",
                       dense_pairs=False)
    x = jnp.asarray(np.asarray(solvated.coords).reshape(-1, 3))
    plan = NeighborPlan(s_s, x0=np.asarray(x))
    e_d = float(Fd.nonbonded_energy(s_d, x))
    e_s = float(neighbor_nonbonded_energy(s_s, x, plan))
    assert e_s == pytest.approx(e_d, abs=0.2 + 2e-4 * abs(e_d)), (e_s, e_d)

    f_a = np.asarray(force_neighbor(s_s, x, plan))
    from isokann_tpu.md.neighbor import (bonded_energy_sparse,
                                         potential_energy_neighbor)
    f_g = np.asarray(-jax.grad(
        lambda z: potential_energy_neighbor(s_s, z, plan))(x))
    scale = np.abs(f_g).max()
    assert np.abs(f_a - f_g).max() < 5e-4 * scale + 0.5


def test_ljpme_hker_grad_consistent():
    """(h, dh/dr2) from ljpme_hker_grad == autodiff of ljpme_hker across
    the series/direct switch."""
    from isokann_tpu.md.ewald import ljpme_hker_grad
    beta = 3.1
    r2 = jnp.asarray([0.004, 0.009, 0.0121, 0.013, 0.04, 0.25, 1.0])
    h, dh = ljpme_hker_grad(r2, beta)
    h2 = ljpme_hker(r2, beta)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h2), rtol=1e-5)
    dh_ad = np.asarray(jax.vmap(jax.grad(
        lambda v: ljpme_hker(v, beta)))(r2))
    np.testing.assert_allclose(np.asarray(dh), dh_ad, rtol=2e-3,
                               atol=1e-3 * float(np.abs(dh_ad).max()))
