"""Fused Pallas MD kernel: analytic forces vs autodiff, kernel arithmetic
parity (interpret mode), plan construction."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isokann_tpu as itk
from isokann_tpu.md.forces import force_flat
from isokann_tpu.md.pallas_md import (
    PallasMDPlan, forces_rowmajor, langevin_middle_fused, _atan2,
)


@pytest.fixture(scope="module")
def sim():
    return itk.MDSimulation(steps=10)


@pytest.fixture(scope="module")
def xs(sim):
    rng = np.random.default_rng(0)
    return jnp.asarray(np.asarray(sim.coords)[None, :]
                       + rng.normal(scale=0.01, size=(8, 66)), jnp.float32)


def test_atan2_poly_matches_numpy():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    a = np.asarray(_atan2(y, x))
    b = np.arctan2(np.asarray(y), np.asarray(x))
    assert np.max(np.abs(a - b)) < 1e-5


@pytest.mark.slow
def test_forces_match_autodiff(sim, xs):
    """The hand-derived difference-vector gradients must equal jax.grad of
    the XLA energy."""
    f_ref = np.asarray(force_flat(sim.system, xs))
    f_new = np.asarray(forces_rowmajor(sim.system, xs))
    err = np.abs(f_ref - f_new).max()
    assert err / np.abs(f_ref).max() < 1e-5


def test_forces_match_per_term(sim, xs):
    sys = sim.system
    z = jnp.zeros

    def zeroed(**kw):
        return dataclasses.replace(sys, **kw)

    variants = {
        "bond": zeroed(angle_k=z(sys.angle_k.shape), dih_pk=z(sys.dih_pk.shape),
                       charges=z(sys.charges.shape), eps=z(sys.eps.shape)),
        "angle": zeroed(bond_k=z(sys.bond_k.shape), dih_pk=z(sys.dih_pk.shape),
                        charges=z(sys.charges.shape), eps=z(sys.eps.shape)),
        "dihedral": zeroed(bond_k=z(sys.bond_k.shape), angle_k=z(sys.angle_k.shape),
                           charges=z(sys.charges.shape), eps=z(sys.eps.shape)),
        "nonbonded": zeroed(bond_k=z(sys.bond_k.shape), angle_k=z(sys.angle_k.shape),
                            dih_pk=z(sys.dih_pk.shape)),
    }
    for name, s in variants.items():
        f_ref = np.asarray(force_flat(s, xs))
        f_new = np.asarray(forces_rowmajor(s, xs))
        scale = max(np.abs(f_ref).max(), 1e-9)
        assert np.abs(f_ref - f_new).max() / scale < 1e-5, name


def test_nocutoff_forces(sim, xs):
    s2 = itk.MDSimulation(steps=10, method="NoCutoff").system
    f_ref = np.asarray(force_flat(s2, xs))
    f_new = np.asarray(forces_rowmajor(s2, xs))
    assert np.abs(f_ref - f_new).max() / np.abs(f_ref).max() < 1e-5


def test_kernel_interpret_matches_noiseless_xla(sim):
    """Interpret-mode kernel (noiseless) == XLA LangevinMiddle with the
    noise term removed."""
    import math
    x0 = jnp.tile(sim.coords[None, :], (8, 1))
    v0 = jnp.zeros_like(x0)
    xo, vo = langevin_middle_fused(sim.system, x0, v0, 310.0, 1.0, 0.002, 5,
                                   jax.random.PRNGKey(0), block=8,
                                   interpret=True)
    m3 = sim.masses3
    a = math.exp(-1.0 * 0.002)
    x, v = x0, v0
    for _ in range(5):
        f = force_flat(sim.system, x)
        v = v + 0.002 * f / m3
        x = x + 0.001 * v
        v = a * v
        x = x + 0.001 * v
    assert np.abs(np.asarray(xo - x)).max() < 1e-5
    assert np.abs(np.asarray(vo - v)).max() < 1e-4


def test_plan_shapes(sim):
    plan = PallasMDPlan(sim.system)
    assert plan.A3 == 66
    assert plan.R3 % 8 == 0
    assert plan.NR % 8 == 0
    assert plan.D.shape == (3 * plan.NR, plan.R3)
    # pairs + bonds + 2*angles + 3*dihedrals rows
    n = 231 + 21 + 2 * 36 + 3 * int(sim.system.dih_idx.shape[0])
    assert plan.nrows == n


class TestAnalyticGBSA:
    """Analytic OBC2/nonbonded forces (md/gbsa_force.py) vs autodiff —
    groundwork validation for the future in-VMEM GBSA kernel."""

    @pytest.fixture(scope="class")
    def gbsys(self):
        return itk.MDSimulation(steps=5, implicit="obc2")

    def test_nonbonded_direct(self, gbsys, xs):
        from isokann_tpu.md.gbsa_force import nonbonded_force_direct
        s = gbsys.system
        ref = -np.asarray(jax.vmap(jax.grad(
            lambda z: itk.md.forces.nonbonded_energy(s, z)))(
                xs.reshape(-1, 22, 3)))
        new = np.asarray(jax.vmap(
            lambda z: nonbonded_force_direct(s, z))(xs.reshape(-1, 22, 3)))
        assert np.abs(ref - new).max() / np.abs(ref).max() < 1e-5

    @pytest.mark.slow
    def test_obc2_force(self, gbsys, xs):
        from isokann_tpu.md.gbsa_force import obc2_force
        s = gbsys.system
        ref = -np.asarray(jax.vmap(jax.grad(
            lambda z: itk.md.forces.gbsa_obc2_energy(s, z)))(
                xs.reshape(-1, 22, 3)))
        new = np.asarray(jax.vmap(
            lambda z: obc2_force(s, z))(xs.reshape(-1, 22, 3)))
        assert np.abs(ref - new).max() / np.abs(ref).max() < 1e-4

    def test_total_force(self, gbsys, xs):
        from isokann_tpu.md.gbsa_force import force_flat_analytic
        s = gbsys.system
        ref = np.asarray(itk.md.forces.force_flat(s, xs))
        new = np.asarray(force_flat_analytic(s, xs))
        assert np.abs(ref - new).max() / np.abs(ref).max() < 1e-4


class TestGBKernel:
    """Medium-system VMEM nonbonded(+GBSA) force kernel (md/pallas_gb.py),
    interpret mode — the per-chunk arithmetic must match the XLA autodiff
    force exactly."""

    def _check(self, sim, nb=4, tol=1e-5, tri=False):
        from isokann_tpu.md.pallas_gb import force_flat_hybrid
        s = sim.system
        rng = np.random.default_rng(0)
        xs = jnp.asarray(np.asarray(sim.coords)[None, :]
                         + rng.normal(scale=0.005, size=(nb, 3 * s.natoms)),
                         jnp.float32)
        ref = np.asarray(itk.md.forces.force_flat(s, xs))
        new = np.asarray(force_flat_hybrid(s, xs, interpret=True, tri=tri))
        assert np.abs(ref - new).max() / np.abs(ref).max() < tol

    @pytest.mark.parametrize("tri", [False, True])
    def test_alanine_obc2(self, tri):
        self._check(itk.MDSimulation(steps=5, implicit="obc2"), tri=tri)

    @pytest.mark.parametrize("tri", [False, True])
    def test_alanine_rf_cutoff(self, tri):
        self._check(itk.MDSimulation(steps=5), tri=tri)

    def test_alanine_nocutoff(self):
        self._check(itk.MDSimulation(steps=5, method="NoCutoff"))

    @pytest.mark.slow
    def test_triangular_multitile_obc2(self):
        """The upper-triangle tiled variant on a >2-tile system (villin,
        Ap=640 -> 5x5 tiles): symmetric-coefficient row+column
        accumulation must reproduce the full-grid force exactly."""
        self._check(itk.MDSimulation(pdb="out/villin.pdb", steps=5,
                                     implicit="obc2"), nb=2, tri=True)

    @pytest.mark.slow
    def test_medium_peptide_obc2(self, tmp_path):
        """>128 padded atoms exercises the multi-chunk J loop."""
        from isokann_tpu.md.fixtures import peptide_pdb
        pdb = peptide_pdb("AQGSAELAKV", str(tmp_path / "pep.pdb"),
                          minimize=True, maxiter=200)
        self._check(itk.MDSimulation(pdb=pdb, steps=5, implicit="obc2"), nb=2)

    def test_plan_padding(self):
        from isokann_tpu.md.pallas_gb import GBPlan
        s = itk.MDSimulation(steps=5, implicit="obc2").system
        plan = GBPlan(s)
        assert plan.Ap % 128 == 0 and plan.Ap >= s.natoms
        assert plan.qq_scale.shape == (plan.Ap, plan.Ap)
        assert float(np.abs(np.diagonal(plan.qq_scale)).max()) == 0.0


def test_cterm_gromacs_oxygen_names(tmp_path):
    """OC1/OC2 C-terminal naming (GROMACS convention, used by the
    reference's villin PDB) resolves to the O/OXT template atoms."""
    from isokann_tpu.md.system import build_system
    # the uncapped (zwitterionic) variant has the O/OXT carboxylate
    from isokann_tpu.md.fixtures import build_peptide
    from isokann_tpu.md.pdbio import write_pdb
    struct = build_peptide("AG", capped=False)
    p1 = str(tmp_path / "std.pdb")
    write_pdb(p1, struct)
    s_std = build_system(p1)
    last = max(struct.res_ids)
    struct.atom_names = [
        {"O": "OC1", "OXT": "OC2"}.get(n, n) if struct.res_ids[i] == last else n
        for i, n in enumerate(struct.atom_names)]
    p2 = str(tmp_path / "gmx.pdb")
    write_pdb(p2, struct)
    s_gmx = build_system(p2)
    assert np.allclose(np.asarray(s_std.charges), np.asarray(s_gmx.charges))


@pytest.mark.slow
def test_gb_kernel_periodic_minimum_image():
    """The VMEM kernel's minimum-image path matches the XLA periodic
    reaction-field force (pad atoms masked by index validity)."""
    import isokann_tpu as itk
    from isokann_tpu.md.pallas_gb import force_flat_hybrid
    sim = itk.MDSimulation(addwater=True, padding=0.55, steps=3)
    s = sim.system
    assert s.method == "CutoffPeriodic"
    rng = np.random.default_rng(0)
    xs = jnp.asarray(np.asarray(sim.coords)[None, :]
                     + rng.normal(scale=0.003, size=(2, 3 * s.natoms)),
                     jnp.float32)
    ref = np.asarray(itk.md.forces.force_flat(s, xs))
    new = np.asarray(force_flat_hybrid(s, xs, interpret=True))
    assert np.abs(ref - new).max() / np.abs(ref).max() < 1e-5


class TestGirsanovKernel:
    """In-kernel chi-MLP bias (aboba_girsanov_fused): the hand-written MLP
    forward/backward must match autodiff, and the noiseless kernel must
    reproduce the XLA ABOBA+Girsanov recursion exactly."""

    @pytest.fixture(scope="class")
    def gsim(self):
        return itk.MDSimulation(steps=10)

    @pytest.fixture(scope="class")
    def model(self, gsim):
        from isokann_tpu.models import pairnet
        n = gsim.natoms * (gsim.natoms - 1) // 2
        return pairnet(n=n, key=jax.random.PRNGKey(3))

    @pytest.mark.slow
    def test_chi_grad_matches_autodiff(self, gsim, model):
        from isokann_tpu.md.pallas_md import ChiBiasPlan, make_chi_grad_fn
        from isokann_tpu.models import mlp_apply
        plan = PallasMDPlan(gsim.system)
        bias_plan = ChiBiasPlan(plan, model.sizes, model.layernorm)
        chi_grad = make_chi_grad_fn(bias_plan)
        rng = np.random.default_rng(0)
        f = jnp.asarray(rng.uniform(0.1, 1.5, size=(model.sizes[0], 16)),
                        jnp.float32)
        chi, gf = chi_grad(bias_plan.cols(model.params), f)
        ref_chi = mlp_apply(model.params, f.T)            # (16, 1)
        ref_g = jax.vmap(jax.grad(
            lambda v: mlp_apply(model.params, v[None])[0, 0]))(f.T)  # (16, n)
        assert np.abs(np.asarray(chi)[0] - np.asarray(ref_chi)[:, 0]).max() < 1e-5
        scale = np.abs(np.asarray(ref_g)).max()
        assert np.abs(np.asarray(gf) - np.asarray(ref_g).T).max() / scale < 1e-4

    def test_nolayernorm_chi_grad(self, gsim):
        from isokann_tpu.md.pallas_md import ChiBiasPlan, make_chi_grad_fn
        from isokann_tpu.models import densenet, mlp_apply
        n = gsim.natoms * (gsim.natoms - 1) // 2
        model = densenet([n, 13, 1], layernorm=False,
                         key=jax.random.PRNGKey(4))
        plan = PallasMDPlan(gsim.system)
        bias_plan = ChiBiasPlan(plan, model.sizes, False)
        chi_grad = make_chi_grad_fn(bias_plan)
        rng = np.random.default_rng(1)
        f = jnp.asarray(rng.uniform(0.1, 1.5, size=(n, 8)), jnp.float32)
        chi, gf = chi_grad(bias_plan.cols(model.params), f)
        ref_chi = mlp_apply(model.params, f.T)
        ref_g = jax.vmap(jax.grad(
            lambda v: mlp_apply(model.params, v[None])[0, 0]))(f.T)
        assert np.abs(np.asarray(chi)[0] - np.asarray(ref_chi)[:, 0]).max() < 1e-5
        scale = np.abs(np.asarray(ref_g)).max()
        assert np.abs(np.asarray(gf) - np.asarray(ref_g).T).max() / scale < 1e-4

    @pytest.mark.slow
    def test_kernel_matches_noiseless_aboba(self, gsim, model):
        """Interpret-mode (noiseless) kernel == the ABOBA+Girsanov recursion
        with eta = 0, with the optcontrol bias computed by autodiff."""
        import math
        from isokann_tpu.md.pallas_md import aboba_girsanov_fused
        from isokann_tpu.models import mlp_apply
        from isokann_tpu.ops.pairdists import flatpairdists
        from isokann_tpu.md.integrators import KB

        T, gamma, dt, nsteps = 310.0, 1.0, 0.002, 5
        forcescale, b, qrate = 0.7, 0.4, -2.0
        Tmax = nsteps * dt
        rng = np.random.default_rng(2)
        x0 = jnp.asarray(np.asarray(gsim.coords)[None, :]
                         + rng.normal(scale=0.005, size=(8, 66)), jnp.float32)
        m3 = gsim.masses3
        p0 = jnp.asarray(rng.normal(size=(8, 66)), jnp.float32) * jnp.sqrt(
            m3 * KB * T)

        q_k, p_k, logw_k = aboba_girsanov_fused(
            gsim.system, x0, p0, T, gamma, dt, nsteps,
            jax.random.PRNGKey(0), model, forcescale=forcescale, b=b,
            qrate=qrate, Tmax=Tmax, block=8, interpret=True)

        # oracle: integrators.aboba_girsanov's math with eta = 0
        params = model.params

        def chifun(z):
            return mlp_apply(params, flatpairdists(z[None]))[0, 0]

        gradchi = jax.vmap(jax.grad(chifun))
        a = math.exp(-gamma * dt)
        t2 = dt / 2.0
        famp = np.sqrt(KB * T * np.asarray(m3) * (1.0 - a * a))
        sig2 = 2.0 * KB * T * gamma * np.asarray(m3)
        q, p = x0, p0
        logw = np.zeros(8)
        t = 0.0
        for _ in range(nsteps):
            q = q + t2 * p / m3
            F = force_flat(gsim.system, q)
            lam = math.exp(qrate * (Tmax - t))
            chi = jax.vmap(chifun)(q)
            denom = lam * (chi - b) + b
            B = forcescale * sig2 * (lam / denom)[:, None] * gradchi(q)
            deta = (a + 1.0) / famp * t2 * np.asarray(B)
            logw = logw - 0.5 * (deta ** 2).sum(axis=1)
            half = t2 * (F + B)
            p = a * (p + half) + half
            q = q + t2 * p / m3
            t += dt
        assert np.abs(np.asarray(q_k - q)).max() < 2e-5
        assert np.abs(np.asarray(p_k - p)).max() < 1e-3
        rel = np.abs(np.asarray(logw_k) - logw) / max(np.abs(logw).max(), 1e-12)
        assert rel.max() < 1e-4

    def test_optcontrol_spec_and_eligibility(self, gsim):
        """optcontrol attaches the kernel spec; static eligibility checks
        hold for the default setup (the TPU check itself is env-dependent)."""
        from isokann_tpu.iso import Iso
        from isokann_tpu.optim import AdamRegularized
        from isokann_tpu.md.integrators import optcontrol
        from isokann_tpu.features import FeaturesAll
        iso = Iso(sim=gsim, nx=8, nk=2, key=5, opt=AdamRegularized())
        iso.run(2)
        bias = optcontrol(iso)
        spec = bias.optcontrol_spec
        assert isinstance(spec["featurizer"], FeaturesAll)
        n = gsim.natoms * (gsim.natoms - 1) // 2
        assert spec["model"].sizes[0] == n and spec["model"].sizes[-1] == 1
        assert np.isfinite([spec["b"], spec["qrate"], spec["Tmax"]]).all()
        gsim.bias = bias
        # on CPU the kernel path must decline (platform check) but the
        # XLA biased path must produce weighted samples
        ws = gsim.propagate(jnp.tile(gsim.coords[None], (4, 1)), 2)
        from isokann_tpu.data import WeightedSamples
        assert isinstance(ws, WeightedSamples)
        assert np.all(np.isfinite(np.asarray(ws.weights)))
        gsim.bias = None


def test_forces_minimum_image_wrap(sim):
    """CutoffPeriodic: the kernel's pair rows apply minimum image — an
    atom displaced by a full box length must feel identical forces."""
    s = sim.system
    assert s.method == "CutoffPeriodic" and s.box is not None
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.asarray(sim.coords)[None, :]
                    + rng.normal(scale=0.01, size=(4, 66)), jnp.float32)
    shift = np.zeros(66, np.float32)
    shift[0] = s.box[0]                  # atom 0 shifted by +Lx
    xs = x + jnp.asarray(shift)
    f_ref = np.asarray(force_flat(s, xs))
    f_new = np.asarray(forces_rowmajor(s, xs))
    assert np.abs(f_ref - f_new).max() / np.abs(f_ref).max() < 1e-5



def test_girsanov_eligibility_dispatch(monkeypatch):
    """_pallas_girsanov_eligible static checks, with the platform probe
    faked to 'tpu' (the real kernel path itself is TPU-only)."""
    from isokann_tpu.iso import Iso
    from isokann_tpu.optim import AdamRegularized
    from isokann_tpu.md.integrators import optcontrol
    from isokann_tpu.models import densenet

    sim = itk.MDSimulation(steps=10)

    class FakeDev:
        platform = "tpu"

    iso = Iso(sim=sim, nx=8, nk=2, key=6, opt=AdamRegularized())
    # train until the fitted Koopman shift-scale is contracting (optcontrol
    # requires lambda in (0, 1]; a couple of iterations can land outside on
    # this tiny 8-sample toy dataset depending on the subsample draw)
    from isokann_tpu.targets import DomainError
    bias = None
    for _ in range(6):
        iso.run(10)
        try:
            bias = optcontrol(iso)
            break
        except DomainError:
            continue
    assert bias is not None, "optcontrol never became well-defined"
    sim.bias = bias
    # fake the platform probe only for the eligibility checks
    monkeypatch.setattr(jax, "devices", lambda *a: [FakeDev()])
    assert sim._pallas_girsanov_eligible(256)
    assert not sim._pallas_girsanov_eligible(128)     # < one 256-lane block
    # wrong model family declines
    n = sim.natoms * (sim.natoms - 1) // 2
    bias.optcontrol_spec = dict(
        bias.optcontrol_spec,
        model=densenet([n, 4, 1], activation="relu",
                       key=jax.random.PRNGKey(0)))
    assert not sim._pallas_girsanov_eligible(256)
