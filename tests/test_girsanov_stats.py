"""Statistical properties of the Girsanov machinery.

Two facts the workflow tests don't pin down:

1. **Martingale**: the raw Girsanov weight is a likelihood ratio, so
   E[w] = 1 exactly — for the overdamped EM path (`brownian_girsanov`)
   and the underdamped ABOBA path (`aboba_girsanov`) alike, under any
   bias.  A systematic deviation beyond sampling error means broken
   weights (wrong sign, wrong noise pairing, missing factor).
2. **Variance reduction in the controllable regime**: with a
   near-exact chi on the 1-D doublewell, the optcontrol-biased raw
   estimator of Kchi must beat the unbiased one (tools/
   optcontrol_analytic.py measures 1.5-3x; the test asserts > 1 with
   a deterministic seed).

Reference context: optcontrol src/simulators/openmm.jl:640-667,
Girsanov integrators :510-637 (the reference tests neither property).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isokann_tpu as itk
from isokann_tpu.md import integrators as I
from isokann_tpu.md import forces
from isokann_tpu.md.fixtures import build_alanine_dipeptide
from isokann_tpu.md.pdbio import read_pdb, write_pdb
from isokann_tpu.md.system import build_system


@pytest.fixture(scope="module")
def ala(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("md") / "ala.pdb")
    write_pdb(path, build_alanine_dipeptide())
    return path


@pytest.fixture(scope="module")
def ala_sys(ala):
    return build_system(ala)


def _doublewell_iso(train_iters=400):
    sim = itk.Doublewell()
    iso = itk.Iso(sim=sim, nx=64, nk=8, key=1, opt=itk.AdamRegularized())
    iso.run(train_iters)
    return sim, iso


@pytest.fixture(scope="module")
def dw_iso():
    return _doublewell_iso()


def _run_girsanov_dw(sim, bias_fn, xs, nsteps, key):
    """brownian_girsanov wired to reproduce the Diffusion EM exactly:
    gamma = m = 1, T = sigma^2/(2 kB)  =>  dX = F dt + sigma dB."""
    masses3 = jnp.ones((1,), jnp.float32)
    Tnoise = float(sim.sigma) ** 2 / (2.0 * I.KB)
    return I.brownian_girsanov(sim.force, bias_fn, xs, masses3, Tnoise,
                               1.0, sim.dt, nsteps, key)


def test_brownian_girsanov_martingale(dw_iso):
    """E[w] = 1 (within 4 SE) for the optcontrol bias on the doublewell."""
    sim, iso = dw_iso
    try:
        bias = I.optcontrol(iso, forcescale=0.5)
    except itk.DomainError:
        pytest.skip("chi not converged enough on this seed")
    n = 4096
    xs = jnp.asarray(np.tile(np.linspace(-1.2, 1.2, 16), n // 16)[:, None],
                     jnp.float32)
    _, logw = _run_girsanov_dw(sim, bias, xs, sim.steps, jax.random.PRNGKey(3))
    w = np.exp(np.asarray(logw, np.float64))
    assert np.all(np.isfinite(w))
    z = (w.mean() - 1.0) / (w.std(ddof=1) / np.sqrt(w.size))
    assert abs(z) < 4.0, f"E[w]={w.mean():.4f}, z={z:.2f}"


def test_aboba_girsanov_martingale(ala_sys, ala, key):
    """E[w] = 1 (within 4 SE) for ABOBA with a smooth artificial bias
    on vacuum ala2 — validates the underdamped weight accumulation
    independently of optcontrol."""
    from isokann_tpu.md.minimize import minimize_energy

    ff = lambda z: forces.force_flat(ala_sys, z)
    x = jnp.asarray(read_pdb(ala).coords.reshape(-1), jnp.float32)
    # minimize first: from the raw fixture geometry a Maxwell-Boltzmann
    # tail of the 512 walkers blows up even at 0.25 fs
    x = minimize_energy(lambda z: forces.potential_energy_flat(ala_sys, z),
                        x, maxiter=300)
    n = 512
    x0 = jnp.tile(jnp.reshape(x, (1, -1)), (n, 1))
    m3 = jnp.repeat(ala_sys.masses, 3)
    p0 = I.maxwell_boltzmann(key, m3, 300.0, x0.shape) * m3

    def bias(q, t, sigma, F):
        # small smooth state-dependent bias (sigma-scaled convention)
        return 0.05 * jnp.tanh(q)

    _, _, logw = I.aboba_girsanov(ff, bias, x0, p0, m3, 300.0, 1.0,
                                  1e-3, 60, jax.random.split(key)[0])
    w = np.exp(np.asarray(logw, np.float64))
    assert np.all(np.isfinite(w))
    z = (w.mean() - 1.0) / (w.std(ddof=1) / np.sqrt(w.size))
    assert abs(z) < 4.0, f"E[w]={w.mean():.4f}, z={z:.2f}"


def test_diffusion_biased_propagate(dw_iso):
    """Diffusion.propagate under an optcontrol bias returns Girsanov-
    weighted samples (E[w]~1), and per-generation optcontrol refreshes
    reuse ONE compiled program (params are runtime inputs, mirroring
    mdsim._girsanov_fused_fn)."""
    from isokann_tpu.data import WeightedSamples

    sim, iso = dw_iso
    try:
        bias1 = I.optcontrol(iso, forcescale=0.5)
    except itk.DomainError:
        pytest.skip("chi not converged enough on this seed")
    sim.bias = bias1
    try:
        xs = np.linspace(-1.0, 1.0, 8)[:, None]
        ws = sim.propagate(xs, 32, key=jax.random.PRNGKey(5))
        assert isinstance(ws, WeightedSamples)
        assert ws.values.shape == (8, 32, 1)
        w = np.asarray(ws.weights, np.float64)
        assert np.all(np.isfinite(w)) and not np.allclose(w, 1.0)
        assert abs(w.mean() - 1.0) < 0.1
        # second generation: new optcontrol closure, same executable
        sim.bias = I.optcontrol(iso, forcescale=0.5)
        sim.propagate(xs, 32, key=jax.random.PRNGKey(6))
        assert len([k for k in sim._jit_cache if k[0] == "girsanov"]) == 1
    finally:
        sim.bias = None


def test_run_girsanov_on_diffusion():
    """The adaptive Girsanov workflow runs end-to-end on an analytic
    simulator (previously MD-only: Diffusion had no bias support).
    Builds its own Iso — run_girsanov trains and grows the dataset, so
    the shared fixture must stay untouched."""
    _, iso = _doublewell_iso(train_iters=200)
    n0 = len(iso.data)
    itk.run_girsanov(iso, generations=2, iter=5, kde=4, forcescale=0.5)
    assert len(iso.data) == n0 + 8
    assert iso.data.sim.bias is None          # restored
    assert np.all(np.isfinite(iso.losses))


def test_weighted_samples_ess():
    """ESS diagnostic: k for uniform weights, 1 for a one-hot walker."""
    from isokann_tpu.data import WeightedSamples
    vals = np.zeros((3, 4, 2), np.float32)
    w = np.ones((3, 4), np.float32)
    w[1] = [1.0, 0.0, 0.0, 0.0]
    ess = WeightedSamples(vals, w).ess()
    assert ess.shape == (3,)
    assert ess[0] == pytest.approx(4.0)
    assert ess[1] == pytest.approx(1.0)
    # slicing keeps the pairing
    assert WeightedSamples(vals, w)[-2:].ess()[0] == pytest.approx(1.0)


def test_optcontrol_variance_reduction(dw_iso):
    """The optcontrol-biased raw Koopman estimator beats the unbiased
    one on the doublewell (the analytic-study regression, fixed seed)."""
    sim, iso = dw_iso
    try:
        bias = I.optcontrol(iso, forcescale=0.5)
    except itk.DomainError:
        pytest.skip("chi not converged enough on this seed")
    reps, nk, n_starts = 48, 16, 9
    starts = np.linspace(-1.0, 1.0, n_starts)
    xs = jnp.asarray(np.tile(starts, reps * nk)[:, None], jnp.float32)
    zero = lambda x, t, sigma, F: jnp.zeros_like(x)

    def estimate(bfn, key):
        xT, logw = _run_girsanov_dw(sim, bfn, xs, sim.steps, key)
        chi = np.asarray(iso.chicoords(np.asarray(xT))).ravel()
        w = np.exp(np.asarray(logw, np.float64)).ravel()
        est = (w * chi).reshape(reps, nk, n_starts).mean(axis=1)
        return est.var(axis=0, ddof=1).mean()

    v_plain = estimate(zero, jax.random.PRNGKey(11))
    v_bias = estimate(bias, jax.random.PRNGKey(12))
    assert v_plain / v_bias > 1.0, (
        f"no variance reduction: plain {v_plain:.3g} biased {v_bias:.3g}")
