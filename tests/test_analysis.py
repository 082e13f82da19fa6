"""Analysis layer tests: reactive path, minimum path, free energy, MI,
committor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isokann_tpu import Iso, Doublewell, AdamRegularized
from isokann_tpu.analysis import (
    reactive_path, shortestpath, bellman_ford_dense, dtmask,
    QuantilePath, FullPath, MaxPath, FromToPath,
    kde_mi, mutual_information,
    marginal_free_energy, integrate_chi, delta_G, sample_uniform_chi_coords,
    solve_committor,
    reactionpath_minimum, energyminimization_chilevel,
)
from isokann_tpu.analysis.reactivepath import fromto, fin_dim_loglikelihood


@pytest.fixture(scope="module")
def trained_iso():
    iso = Iso(sim=Doublewell(), nx=128, nk=8, key=0, minibatch=64,
              opt=AdamRegularized(1e-3, 1e-5))
    iso.run(300)
    return iso


def test_dtmask():
    xi = np.array([0.0, 0.5, 0.9, 0.2])
    i, j, v = dtmask(xi, minjump=0.0, maxjump=0.4)
    pairs = set(zip(i.tolist(), j.tolist()))
    assert (0, 3) in pairs          # dt = 0.2
    assert (3, 1) in pairs          # dt = 0.3
    assert (0, 1) not in pairs      # dt = 0.5 > maxjump


def test_fromto_methods():
    xi = np.linspace(0, 1, 100)
    f, t = fromto(QuantilePath(0.1), xi)
    assert np.all(xi[f] < 0.1) and np.all(xi[t] > 0.9)
    f, t = fromto(FullPath(), xi)
    assert f[0] == 0 and t[0] == 99
    f, t = fromto(MaxPath(), xi)
    assert f[0] == 0 and t[0] == 99
    f, t = fromto(FromToPath(5, 7), xi)
    assert f[0] == 5 and t[0] == 7


def test_bellman_ford_dense_simple():
    inf = np.inf
    A = np.array([[inf, 1.0, 10.0],
                  [inf, inf, 1.0],
                  [inf, inf, inf]])
    d, par = bellman_ford_dense(A, [0])
    assert float(d[2]) == pytest.approx(2.0)
    path = shortestpath(A, 0, 2)
    assert path == [0, 1, 2]


def test_reactive_path_1d():
    # known 1-D ordering: points on a line with chi = position
    rng = np.random.default_rng(0)
    n = 50
    chi = rng.random(n)
    coords = np.zeros((n, 3))
    coords[:, 0] = chi              # straight line in space
    ids = reactive_path(chi, coords, sigma=0.3, maxjump=0.4,
                        method=QuantilePath(0.1))
    assert len(ids) >= 3
    assert np.all(np.diff(chi[ids]) > 0)   # monotone chain


def test_fin_dim_loglikelihood_monotone():
    # larger jumps at fixed dt are less likely
    l1 = fin_dim_loglikelihood(0.1, 0.5, 1.0, 3)
    l2 = fin_dim_loglikelihood(1.0, 0.5, 1.0, 3)
    assert l1 > l2


def test_save_reactive_path_on_md(tmp_path, key):
    from isokann_tpu import MDSimulation
    from isokann_tpu.analysis import save_reactive_path
    sim = MDSimulation(steps=10)
    iso = Iso(sim=sim, nx=16, nk=2, key=2, minibatch=0,
              opt=AdamRegularized())
    iso.run(10)
    out = str(tmp_path / "rp.pdb")
    ids = save_reactive_path(iso, sigma=1.0, maxjump=1.0, out=out,
                             method=QuantilePath(0.2))
    if len(ids):
        import os
        assert os.path.exists(out)


def test_kde_mi_independent_vs_dependent():
    rng = np.random.default_rng(1)
    x = rng.normal(size=500)
    y_ind = rng.normal(size=500)
    y_dep = x + 0.1 * rng.normal(size=500)
    mi_ind = float(kde_mi(x, y_ind))
    mi_dep = float(kde_mi(x, y_dep))
    assert mi_dep > mi_ind + 0.5


def test_mutual_information_iso(trained_iso):
    mi = mutual_information(trained_iso)
    assert mi.shape == (1,)
    assert np.all(np.isfinite(mi))


def test_marginal_free_energy(trained_iso):
    centers, F = marginal_free_energy(trained_iso, nbins=20)
    assert len(centers) == 20
    assert np.nanmin(F) == 0.0


def test_integrate_chi():
    chi = np.linspace(0, 1, 11)
    f = np.ones(11)
    F = integrate_chi(f, chi)
    assert F[-1] == pytest.approx(1.0)


def test_delta_g():
    chi = np.linspace(0, 1, 100)
    PMF = (chi - 0.3) ** 2           # minimum 0 at 0.3; right basin min at 0.5
    dg = delta_G(PMF, chi)
    assert dg == pytest.approx(0.0 - (0.5 - 0.3) ** 2, abs=5e-3)


def test_sample_uniform_chi(trained_iso):
    xs = sample_uniform_chi_coords(trained_iso, 10)
    assert xs.shape == (10, 1)


def test_committor():
    # 3-state chain A <-> I <-> B
    Q = np.array([[-1.0, 1.0, 0.0],
                  [0.5, -1.0, 0.5],
                  [0.0, 1.0, -1.0]])
    classes = np.array([2.0, 0.0, 1.0])   # A = class 2 (->0), B = 1
    c = solve_committor(Q, classes)
    assert c[0] == pytest.approx(0.0, abs=1e-8)
    assert c[2] == pytest.approx(1.0, abs=1e-8)
    assert 0.4 < c[1] < 0.6


def test_chilevel_minimization(trained_iso):
    x0 = jnp.asarray([[0.5]])[0]
    x = energyminimization_chilevel(trained_iso, x0, iterations=5, lr=1e-4)
    chi0 = float(trained_iso.chicoords(x0[None, :])[0, 0])
    chi1 = float(trained_iso.chicoords(np.asarray(x)[None, :])[0, 0])
    assert abs(chi0 - chi1) < 0.05     # stayed on the levelset


def test_reactionpath_minimum(trained_iso):
    path = reactionpath_minimum(trained_iso, jnp.asarray([0.0]), steps=11,
                                miniter=3)
    path = np.asarray(path)
    assert path.shape[1] == 1
    assert np.all(np.isfinite(path))
    chis = np.asarray(trained_iso.chicoords(path)).ravel()
    # chi should sweep a substantial range along the path
    assert chis.max() - chis.min() > 0.25


@pytest.mark.slow
def test_reactionpath_ode(trained_iso):
    from isokann_tpu.analysis import reactionpath_ode
    path = np.asarray(reactionpath_ode(trained_iso, jnp.asarray([0.1]),
                                       steps=21, orth=0.001))
    assert path.shape == (21, 1)
    assert np.all(np.isfinite(path))
    chis = np.asarray(trained_iso.chicoords(path)).ravel()
    # chi increases along most of the path (saturated plateaus at the ends)
    assert np.sum(np.diff(chis) > 0) >= 12


def test_reactive_path_not_edge_count_biased():
    """Edge costs are the RAW Onsager-Machlup -logp (possibly negative,
    exactly as the reference feeds Bellman-Ford,
    ``reactivepath.jl:160-187``); a uniform nonnegativity shift distorts
    the likelihood ordering by penalizing path length.  Pin: samples
    along a smooth transition are threaded through, not jumped over
    (the per-edge entropy term favors many short steps when
    sigma^2 dt 2pi < 1)."""
    n = 21
    chi = np.linspace(0.0, 1.0, n)
    coords = np.zeros((n, 6))
    coords[:, 0] = np.linspace(0.5, 1.5, n)   # 2-atom bond stretching
    rng = np.random.default_rng(1)
    coords[:, 1] = 0.01 * rng.standard_normal(n)
    ids = reactive_path(chi, coords, sigma=0.5, maxjump=1.0,
                        method=QuantilePath(0.1))
    assert len(ids) >= n // 2, f"degenerate path: {len(ids)} frames"
    assert np.all(np.diff(chi[ids]) > 0)
