"""MD engine tests: topology, force field, integrators, MDSimulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isokann_tpu.md.fixtures import build_alanine_dipeptide, alanine_dipeptide_pdb
from isokann_tpu.md.pdbio import read_pdb, write_pdb, write_pdb_traj, read_pdb_traj
from isokann_tpu.md.topology import build_topology
from isokann_tpu.md.system import build_system, KB
from isokann_tpu.md import forces, integrators as I
from isokann_tpu.md.minimize import minimize_energy


@pytest.fixture(scope="module")
def ala(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("md") / "ala.pdb")
    write_pdb(path, build_alanine_dipeptide())
    return path


@pytest.fixture(scope="module")
def ala_sys(ala):
    return build_system(ala)


def test_pdb_roundtrip(ala, tmp_path):
    s = read_pdb(ala)
    assert s.natoms == 22
    assert s.res_names[0] == "ACE" and s.res_names[-1] == "NME"
    out = str(tmp_path / "rt.pdb")
    write_pdb(out, s)
    s2 = read_pdb(out)
    assert s2.atom_names == s.atom_names
    assert np.allclose(s2.coords, s.coords, atol=1e-4)


def test_pdb_traj_roundtrip(ala, tmp_path):
    s = read_pdb(ala)
    traj = np.stack([s.coords.ravel(), s.coords.ravel() + 0.01])
    out = str(tmp_path / "traj.pdb")
    write_pdb_traj(out, s, traj)
    back = read_pdb_traj(out)
    assert back.shape == (2, 66)
    assert np.allclose(back, traj, atol=1e-4)


def test_topology(ala):
    top = build_topology(read_pdb(ala))
    assert top.natoms == 22
    assert len(top.bonds) == 21           # tree: n-1 bonds for acyclic chain
    assert len(top.angles) == 36
    # peptide bonds exist: ACE C - ALA N
    types = top.atom_types
    assert types[4] == "C" and types[6] == "N"
    assert (4, 6) in top.bonds or (6, 4) in top.bonds
    assert abs(top.charges.sum()) < 1e-10
    assert top.masses.sum() == pytest.approx(144.179, abs=0.5)


def test_system_build(ala_sys):
    assert ala_sys.natoms == 22
    assert ala_sys.method == "CutoffPeriodic"
    assert ala_sys.bond_idx.shape == (21, 2)
    # exclusions: bonded pairs have zero scale, 1-4 pairs scaled
    qq = np.asarray(ala_sys.qq_scale)
    bi = np.asarray(ala_sys.bond_idx)
    assert np.all(qq[bi[:, 0], bi[:, 1]] == 0)
    assert np.any(np.isclose(qq, 1 / 1.2))


def test_energy_finite_and_minimizable(ala, ala_sys):
    x = jnp.asarray(read_pdb(ala).coords.reshape(-1), jnp.float32)
    e0 = float(forces.potential_energy_flat(ala_sys, x))
    assert np.isfinite(e0)
    xm = minimize_energy(lambda z: forces.potential_energy_flat(ala_sys, z),
                         x, maxiter=300)
    e1 = float(forces.potential_energy_flat(ala_sys, xm))
    assert e1 < e0
    assert e1 < 500.0


def test_force_is_negative_gradient(ala_sys, ala):
    x = jnp.asarray(read_pdb(ala).coords.reshape(-1), jnp.float32)
    f = np.asarray(forces.force_flat(ala_sys, x))
    g = np.asarray(jax.grad(
        lambda z: forces.potential_energy_flat(ala_sys, z))(x))
    assert np.allclose(f, -g, atol=1e-3)


def test_energy_invariances(ala, ala_sys):
    """Bonded + NoCutoff nonbonded energy must be translation/rotation
    invariant."""
    sys2 = build_system(ala, method="NoCutoff")
    x0 = jnp.asarray(read_pdb(ala).coords.reshape(-1), jnp.float32)
    x = np.asarray(minimize_energy(
        lambda z: forces.potential_energy_flat(sys2, z), x0,
        maxiter=200)).reshape(-1, 3)
    e = float(forces.potential_energy_flat(sys2, jnp.asarray(x.reshape(-1), jnp.float32)))
    # translation
    e_t = float(forces.potential_energy_flat(
        sys2, jnp.asarray((x + 1.23).reshape(-1), jnp.float32)))
    assert e_t == pytest.approx(e, abs=max(0.2, abs(e) * 1e-4))
    # rotation
    q, _ = np.linalg.qr(np.random.default_rng(0).normal(size=(3, 3)))
    e_r = float(forces.potential_energy_flat(
        sys2, jnp.asarray((x @ q.T).reshape(-1), jnp.float32)))
    assert e_r == pytest.approx(e, abs=max(0.5, abs(e) * 1e-3))


def test_langevin_middle_temperature(ala, ala_sys, key):
    """Long LangevinMiddle run should equilibrate near the target T."""
    x = jnp.asarray(read_pdb(ala).coords.reshape(-1), jnp.float32)
    xm = minimize_energy(lambda z: forces.potential_energy_flat(ala_sys, z),
                         x, maxiter=300)
    m3 = jnp.repeat(ala_sys.masses, 3)
    ff = lambda z: forces.force_flat(ala_sys, z)
    B = 16
    x0 = jnp.tile(xm[None, :], (B, 1))
    v0 = I.maxwell_boltzmann(key, m3, 310.0, (B, 66))
    xT, vT = I.langevin_middle(ff, x0, v0, m3, 310.0, 1.0, 0.002, 2000, key)
    assert np.all(np.isfinite(np.asarray(xT)))
    ke = 0.5 * jnp.sum(m3 * vT ** 2, axis=-1)
    T_inst = float(jnp.mean(2 * ke / (66 * KB)))
    assert 230 < T_inst < 400


def test_girsanov_weights_unbiased(ala_sys, ala, key):
    """Zero bias -> ABOBA girsanov weights must be exactly 1."""
    x = jnp.asarray(read_pdb(ala).coords.reshape(-1), jnp.float32)
    m3 = jnp.repeat(ala_sys.masses, 3)
    ff = lambda z: forces.force_flat(ala_sys, z)
    bias = lambda q, t, sigma, F: jnp.zeros_like(q)
    p0 = jax.random.normal(key, (2, 66)) * jnp.sqrt(m3 * KB * 310.0)
    q, p, logw = I.aboba_girsanov(ff, bias, jnp.tile(x[None], (2, 1)), p0,
                                  m3, 310.0, 1.0, 0.002, 50, key)
    assert np.allclose(np.asarray(logw), 0.0)
    assert np.all(np.isfinite(np.asarray(q)))


def test_brownian_girsanov_weights(ala_sys, ala, key):
    x = jnp.asarray(read_pdb(ala).coords.reshape(-1), jnp.float32)
    m3 = jnp.repeat(ala_sys.masses, 3)
    ff = lambda z: forces.force_flat(ala_sys, z)
    bias = lambda q, t, sigma, F: jnp.full_like(q, 0.01)
    xT, logw = I.brownian_girsanov(ff, bias, jnp.tile(x[None], (3, 1)), m3,
                                   310.0, 100.0, 1e-5, 20, key)
    assert logw.shape == (3,)
    assert np.all(np.isfinite(np.asarray(logw)))
    assert not np.allclose(np.asarray(logw), 0.0)


class TestMDSimulation:
    def test_construct_and_propagate(self, key):
        from isokann_tpu import MDSimulation
        sim = MDSimulation(steps=20)
        assert sim.natoms == 22
        assert sim.lagtime == pytest.approx(0.04)
        x0 = jnp.tile(sim.coords[None, :], (3, 1))
        ys = sim.propagate(x0, 2, key=key)
        assert ys.shape == (3, 2, 66)
        assert np.all(np.isfinite(np.asarray(ys)))

    def test_propagate_staged_long_lag(self, key, monkeypatch):
        """Lags above ISOKANN_PROP_STEPS_PER_PROGRAM host-stage through
        the block program (class-c fault bound): same shape/finiteness
        and thermally sane displacements as the single-scan path."""
        from isokann_tpu import MDSimulation
        sim = MDSimulation(steps=10)
        x0 = jnp.tile(sim.coords[None, :], (3, 1))
        y_ref = np.asarray(sim.propagate(x0, 2, key=key, steps=100))
        monkeypatch.setenv("ISOKANN_PROP_STEPS_PER_PROGRAM", "40")
        ys = sim.propagate(x0, 2, key=key, steps=100)   # 3 dispatches
        ys = np.asarray(ys)
        assert ys.shape == (3, 2, 66)
        assert np.isfinite(ys).all()
        # staged noise differs from the fused scan, but the thermal
        # displacement scale must match (same dynamics, 0.2 ps)
        d_ref = np.linalg.norm((y_ref - np.asarray(x0)[:, None]), axis=-1)
        d_st = np.linalg.norm((ys - np.asarray(x0)[:, None]), axis=-1)
        assert 0.3 < d_st.mean() / d_ref.mean() < 3.0

    def test_trajectory_and_lagged(self, key):
        from isokann_tpu import MDSimulation
        sim = MDSimulation(steps=10)
        traj = sim.trajectory(steps=50, saveevery=10, key=key)
        assert traj.shape == (5, 66)
        lt = sim.laggedtrajectory(4, key=key)
        assert lt.shape == (4, 66)

    def test_featurizer_default(self):
        from isokann_tpu import MDSimulation
        from isokann_tpu.features import FeaturesAll
        sim = MDSimulation(steps=10)
        assert isinstance(sim.featurizer, FeaturesAll)
        f = sim.featurizer(sim.coords[None, :])
        assert f.shape == (1, 22 * 21 // 2)

    def test_iso_on_md(self, key):
        from isokann_tpu import Iso, MDSimulation, AdamRegularized
        sim = MDSimulation(steps=10)
        iso = Iso(sim=sim, nx=8, nk=2, key=1, minibatch=0,
                  opt=AdamRegularized())
        iso.run(5)
        assert len(iso.losses) == 5
        assert np.all(np.isfinite(iso.losses))

    def test_girsanov_bias_gives_weighted_samples(self, key):
        from isokann_tpu import MDSimulation
        from isokann_tpu.data import WeightedSamples
        bias = lambda q, t, sigma, F: jnp.zeros_like(q)
        sim = MDSimulation(steps=5, bias=bias)
        ys = sim.propagate(jnp.tile(sim.coords[None, :], (2, 1)), 2, key=key)
        assert isinstance(ys, WeightedSamples)
        assert np.allclose(np.asarray(ys.weights), 1.0)


class TestConstraints:
    """SHAKE/RATTLE H-bond constraints (reference exposes OpenMM's
    constraints option, mopenmm.py:117-125)."""

    @pytest.fixture(scope="class")
    def csim(self):
        import isokann_tpu as itk
        return itk.MDSimulation(steps=20, constraints="HBonds")

    def test_constraint_set(self, csim):
        from isokann_tpu.md.constraints import ConstraintSet
        cs = csim.constraint_set
        # every bond with an H is constrained (alanine dipeptide: 12 H)
        masses = np.asarray(csim.system.masses)
        nH = int((masses < 3.5).sum())
        assert cs.ncons == nH
        # HAngles is a superset of HBonds (triangulated H-X-H angles)
        assert ConstraintSet(csim.system, "HAngles").ncons > nH
        with pytest.raises(ValueError):
            ConstraintSet(csim.system, "Everything")

    def test_shake_projects_back(self, csim):
        cs = csim.constraint_set
        x0 = jnp.tile(csim.coords[None], (4, 1))
        rng = np.random.default_rng(0)
        x = x0 + jnp.asarray(rng.normal(scale=3e-3, size=x0.shape), jnp.float32)
        xs = cs.shake(x0, x)
        assert float(cs.max_violation(xs)) < 1e-5
        # heavy-atom displacements stay small (mass weighting)
        assert float(jnp.abs(xs - x).max()) < 2e-2

    def test_rattle_removes_bond_velocity(self, csim):
        cs = csim.constraint_set
        x = jnp.tile(csim.coords[None], (2, 1))
        v = jnp.asarray(np.random.default_rng(1).normal(
            scale=1.0, size=x.shape), jnp.float32)
        vc = cs.rattle(x, v)
        xr = x.reshape(2, -1, 3)
        vr = vc.reshape(2, -1, 3)
        d = xr[:, cs.idx_i] - xr[:, cs.idx_j]
        rel = jnp.sum((vr[:, cs.idx_i] - vr[:, cs.idx_j]) * d, axis=-1)
        assert float(jnp.abs(rel).max()) < 1e-4

    def test_constrained_propagate(self, csim, key):
        """2 fs constrained dynamics keeps bonds at r0 and energies sane."""
        x0 = jnp.tile(csim.coords[None], (6, 1))
        ys = csim.propagate(x0, 1, key=key)
        y = ys[:, 0, :]
        assert bool(jnp.all(jnp.isfinite(y)))
        assert float(csim.constraint_set.max_violation(y)) < 1e-4
        E = np.asarray(csim.potential(y))
        E0 = float(csim.potential(csim.coords))
        assert np.all(E < E0 + 3 * 1.5 * KB * 310 * csim.natoms)

    def test_pallas_path_disabled(self, csim):
        assert not csim._pallas_eligible(4096)


def test_bootstrap_burnin_default_and_shapes(key):
    """Multi-chain bootstrap discards a burn-in prefix per chain (default
    nlag*(chains-1)//2, matching the mean equilibration depth of the
    reference's single nx-lag chain)."""
    import isokann_tpu as itk

    sim = itk.MDSimulation(steps=5)
    xs, ys, fxs, fys = sim.bootstrap_data(8, 2, key=key, chains=2, burnin=2)
    assert xs.shape == (8, sim.dim) and ys.shape == (8, 2, sim.dim)
    assert np.all(np.isfinite(np.asarray(xs)))
    # same key, different burn-in => different collected frames
    xs0, *_ = sim.bootstrap_data(8, 2, key=key, chains=2, burnin=0)
    assert not np.allclose(np.asarray(xs), np.asarray(xs0))
    # default burnin matches nlag*(chains-1)//2 (compiles a distinct
    # program; identical to explicit burnin under the same key)
    xsd, *_ = sim.bootstrap_data(8, 2, key=key, chains=2)
    assert np.allclose(np.asarray(xsd), np.asarray(xs))


def test_hangles_constraints():
    """constraints='HAngles' (OpenMM semantics, reference pass-through
    mopenmm.py:117-125): H-X-H and H-O-X angles become triangulated
    distance constraints on top of HBonds."""
    import math

    import isokann_tpu as itk
    from isokann_tpu.md.constraints import ConstraintSet

    sim = itk.MDSimulation(steps=5)
    cs_b = ConstraintSet(sim.system, "HBonds")
    cs_a = ConstraintSet(sim.system, "HAngles")
    assert cs_a.ncons > cs_b.ncons         # methyl H-C-H triangles added

    # shake a perturbed configuration onto the constraint manifold
    x0 = jnp.asarray(sim.coords)
    key = jax.random.PRNGKey(0)
    x = x0 + 0.004 * jax.random.normal(key, x0.shape)
    xs = cs_a.shake(x0[None, :], x[None, :])
    assert float(cs_a.max_violation(xs)) < 1e-5

    # the triangulated H..H distances match the law of cosines exactly
    import numpy as np
    masses = np.asarray(sim.system.masses)
    aidx = np.asarray(sim.system.angle_idx)
    at0 = np.asarray(sim.system.angle_t0)
    bond_r0 = {tuple(sorted((int(a), int(b)))): float(l)
               for (a, b), l in zip(np.asarray(sim.system.bond_idx),
                                    np.asarray(sim.system.bond_r0))}
    xr = np.asarray(xs).reshape(-1, 3)
    checked = 0
    for (a, b, c), t0 in zip(aidx, at0):
        if masses[a] < 3.5 and masses[c] < 3.5:
            rab = bond_r0[tuple(sorted((int(a), int(b))))]
            rbc = bond_r0[tuple(sorted((int(b), int(c))))]
            target = math.sqrt(rab ** 2 + rbc ** 2
                               - 2 * rab * rbc * math.cos(float(t0)))
            got = float(np.linalg.norm(xr[int(a)] - xr[int(c)]))
            assert abs(got - target) < 1e-5
            checked += 1
    assert checked >= 3                     # ala2 has 3+ H-C-H angles

    # dynamics: propagation under HAngles stays finite with a 3 fs step
    sim3 = itk.MDSimulation(steps=30, step=0.003, constraints="HAngles")
    ys = sim3.propagate(np.asarray(sim3.coords)[None, :], 2,
                        key=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(ys)).all()


def test_bootstrap_staged_matches_fused_semantics():
    # long-lag bootstraps stage through the block program (the fused
    # 6.7e5-step chain scan crashes the v5e worker); shapes, finiteness
    # and feature statistics must match the fused path
    import jax
    import numpy as np
    import isokann_tpu as itk

    sim = itk.MDSimulation(steps=50)
    sim._BOOTSTRAP_FUSED_MAX = 100          # force staging at this lag
    xs, ys, fxs, fys = sim.bootstrap_data(8, 3, key=jax.random.PRNGKey(0),
                                          chains=4)
    assert xs.shape == (8, sim.dim) and ys.shape == (8, 3, sim.dim)
    assert fxs.shape[0] == 8 and fys.shape[:2] == (8, 3)
    assert np.isfinite(np.asarray(ys)).all()
    assert np.isfinite(np.asarray(fys)).all()

    sim2 = itk.MDSimulation(steps=50)
    _, _, ffx, _ = sim2.bootstrap_data(8, 3, key=jax.random.PRNGKey(0),
                                       chains=4)
    a, b = float(np.asarray(fxs).mean()), float(np.asarray(ffx).mean())
    assert abs(a - b) / abs(b) < 0.2


def test_propagate_work_cap_chunks():
    # programs over the GB-scan walker-step budget are host-chunked into
    # equal sub-batches (v5e fault class (c) mitigation); inert on CPU
    # unless forced
    import jax
    import numpy as np
    import isokann_tpu as itk

    sim = itk.MDSimulation(steps=50)
    calls = []
    orig = type(sim).propagate

    def counting(self, x0, nk, key=None, steps=None):
        calls.append(len(np.asarray(x0)))
        return orig(self, x0, nk, key=key, steps=steps)

    sim.propagate = counting.__get__(sim)
    sim._scan_work_cap = lambda: 400
    x0 = np.tile(np.asarray(sim.coords).reshape(1, -1), (8, 1))
    ys = sim.propagate(x0, 2, key=jax.random.PRNGKey(0))
    # outer call (8 rows) + two sub-calls of 4 rows (4*2*50 = cap)
    assert calls == [8, 4, 4]
    assert ys.shape == (8, 2, sim.dim)
    assert np.isfinite(np.asarray(ys)).all()
