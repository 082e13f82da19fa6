import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isokann_tpu import targets as T
from isokann_tpu.data import WeightedSamples


def linmodel(A):
    """A linear 'chi model' x -> x @ A for testing transforms."""
    A = jnp.asarray(A, jnp.float32)
    return lambda x: jnp.asarray(x, jnp.float32) @ A


def test_shiftscale():
    ks = jnp.asarray([[0.2], [0.4], [1.2]])
    out = T.shiftscale(ks)
    assert float(out.min()) == 0.0 and float(out.max()) == 1.0
    with pytest.raises(T.DomainError):
        T.shiftscale(jnp.ones((5, 1)))


def test_expectation_mean():
    model = linmodel(np.eye(2))
    ys = jnp.arange(2 * 3 * 2, dtype=jnp.float32).reshape(2, 3, 2)
    out = T.expectation(model, ys)
    assert out.shape == (2, 2)
    assert np.allclose(out, np.mean(np.asarray(ys), axis=1))


def test_expectation_weighted():
    model = linmodel(np.eye(2))
    vals = jnp.ones((4, 3, 2))
    w = jnp.full((4, 3), 2.0)
    ws = WeightedSamples(vals, w)
    out = T.expectation(model, ws)
    assert np.allclose(out, 2.0)


def test_indexmap_finds_vertices():
    # simplex memberships: rows 0,1,2 are the pure vertices
    X = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1],
                  [0.3, 0.3, 0.4], [0.5, 0.25, 0.25]], dtype=float)
    inds = T.indexmap(X)
    assert sorted(inds.tolist()) == [0, 1, 2]


def test_isa_recovers_simplex():
    # Kchi that is a linear mix of clean memberships: ISA should unmix it.
    rng = np.random.default_rng(0)
    memb = rng.dirichlet([0.2, 0.2], size=200)   # (n, 2) rows on the simplex
    A = np.array([[2.0, 0.3], [0.5, 1.5]])
    ks = memb @ A
    Ainv = T.myisa(ks)
    rec = ks @ Ainv
    # recovered memberships should span [0,1] with rows ~ sum 1
    assert np.allclose(rec.sum(axis=1), 1.0, atol=1e-6)
    assert rec.min() > -1e-6 and rec.max() < 1 + 1e-6


def test_fixperm():
    old = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    new = old[:, ::-1].copy()
    fixed = T.fixperm(new, old)
    assert np.allclose(fixed, old)


def test_transform_isa_runs():
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
    ys = jnp.asarray(rng.normal(size=(50, 4, 3)), jnp.float32)
    A = rng.normal(size=(3, 2))
    model = linmodel(A)
    t = T.TransformISA()(model, xs, ys)
    assert t.shape == (50, 2)
    assert np.all(np.isfinite(np.asarray(t)))


def test_transform_pseudoinv_runs():
    rng = np.random.default_rng(2)
    xs = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
    ys = jnp.asarray(rng.normal(size=(50, 4, 3)), jnp.float32)
    model = linmodel(rng.normal(size=(3, 2)))
    t = T.TransformPseudoInv()(model, xs, ys)
    assert t.shape == (50, 2)
    assert np.all(np.isfinite(np.asarray(t)))


def test_transform_shiftscale_call():
    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.normal(size=(30, 2)), jnp.float32)
    ys = jnp.asarray(rng.normal(size=(30, 5, 2)), jnp.float32)
    model = linmodel(rng.normal(size=(2, 1)))
    t = T.TransformShiftscale()(model, xs, ys)
    assert t.shape == (30, 1)
    assert float(t.min()) == 0.0 and float(t.max()) == 1.0


def test_shiftscale_quantile_robust():
    """Robust bounds ignore a rare-state outlier that owns the min/max
    scale (the deca-alanine equilibrium-trajectory collapse mode)."""
    bulk = np.linspace(0.0, 1.0, 200)
    ks = jnp.asarray(np.concatenate([bulk, [50.0]])[:, None], jnp.float32)
    squashed = T.shiftscale(ks)
    assert float(squashed[:200].max()) < 0.05    # bulk crushed by outlier
    robust = T.shiftscale(ks, quantile=0.01)
    assert float(robust[:200].max()) > 0.95      # bulk spans the scale
    assert float(robust[200, 0]) == 1.0          # outlier saturates
    assert float(robust.min()) >= 0.0 and float(robust.max()) <= 1.0
    with pytest.raises(T.DomainError):
        T.shiftscale(jnp.ones((50, 1)), quantile=0.01)


def test_shiftscale_jit_masked_quantile_ignores_padding():
    """Padding with repeated rows must not shift the quantile bounds:
    the masked order statistics use only the n_true real rows."""
    rng = np.random.default_rng(0)
    v = rng.normal(size=37).astype(np.float32)
    ks = jnp.asarray(v[:, None])
    plain = T.shiftscale_jit(ks, quantile=0.05)
    # pad by repeating the MOST EXTREME row (worst case for quantiles)
    worst = v[np.argmax(np.abs(v))]
    pad = np.full(27, worst, np.float32)
    ks_p = jnp.asarray(np.concatenate([v, pad])[:, None])
    mask = jnp.asarray(np.concatenate([np.ones(37), np.zeros(27)]),
                       jnp.float32)
    padded = T.shiftscale_jit(ks_p, mask, jnp.float32(37), quantile=0.05)
    np.testing.assert_allclose(np.asarray(padded[:37]), np.asarray(plain),
                               rtol=1e-6)


def test_transform_shiftscale_quantile_fused_signature():
    """fused_target accepts (kchi, mask, n_true) and matches the host
    transform on unpadded data."""
    rng = np.random.default_rng(7)
    ks = jnp.asarray(rng.normal(size=(25, 1)), jnp.float32)
    tr = T.TransformShiftscale(quantile=0.02)
    out = tr.fused_target(ks, jnp.ones(25), jnp.float32(25))
    ref = T.shiftscale(ks, quantile=0.02)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_experimental_transforms_run():
    rng = np.random.default_rng(4)
    xs = jnp.asarray(rng.normal(size=(40, 3)), jnp.float32)
    ys = jnp.asarray(rng.normal(size=(40, 4, 3)), jnp.float32)
    model = linmodel(rng.normal(size=(3, 2)))
    for t in [T.TransformGramSchmidt(), T.TransformLeftRight(),
              T.TransformSVD(), T.TransformSVDRev(),
              T.TransformCross(), T.TransformLeftRightHistory(hist=5)]:
        out = t(model, xs, ys)
        assert out.shape == (40, 2), type(t).__name__
        assert np.all(np.isfinite(np.asarray(out))), type(t).__name__


def test_stabilize_signflip():
    rng = np.random.default_rng(5)
    xs = jnp.asarray(rng.normal(size=(30, 2)), jnp.float32)
    ys = jnp.asarray(rng.normal(size=(30, 5, 2)), jnp.float32)
    model = linmodel(rng.normal(size=(2, 1)))
    st = T.Stabilize(T.TransformShiftscale())
    t1 = st(model, xs, ys)
    t2 = st(model, xs, ys)
    assert np.allclose(t1, t2)


def test_residual_diagnostics():
    class FakeIso:
        pass

    rng = np.random.default_rng(6)
    iso = FakeIso()
    A = rng.normal(size=(3, 2))
    iso.chifun = linmodel(A)
    iso.data = (jnp.asarray(rng.normal(size=(40, 3)), jnp.float32),
                jnp.asarray(rng.normal(size=(40, 4, 3)), jnp.float32))
    r1 = T.residual_linear(iso)
    r2 = T.residual_ritz(iso)
    r3 = T.residual_subspace(iso)
    assert np.all(np.isfinite(r1["relres"]))
    assert np.all(np.isfinite(r2["relres"]))
    assert np.all(np.isfinite(r3["relres"]))


def test_isa_multidim_trains_stably():
    """Regression: the canonical multi-dim entry point
    (``Iso(sim=Triplewell(), nout=3)``, reference quickstart for ISA)
    used to collapse within ~4 iterations — the optimized loss was the
    raw SUM over observations while the reference differentiates
    ``l / numobs(x)`` (src/iso.jl:185-192), so every multi-dim step was
    ~batchsize x too large and drove the ISA subspace singular
    (DomainError).  Multi-dim targets now optimize the per-observation
    mean; 1-D training keeps its (battle-tested) sum calibration."""
    import isokann_tpu as itk

    iso = itk.Iso(sim=itk.Triplewell(), nout=3)
    iso.run(60)  # used to raise DomainError at iteration ~4
    losses = np.asarray(iso.losses, np.float64)
    assert np.isfinite(losses).all()
    # training moves toward the target rather than past it
    assert losses[-5:].mean() < losses[:5].mean()
    chi = np.asarray(iso.chicoords(
        jnp.asarray(np.asarray(iso.data.coords))))
    assert np.isfinite(chi).all()
    # ISA memberships head toward a partition of unity: row sums
    # concentrate near 1 long before the simplex converges
    assert abs(float(chi.sum(axis=1).mean()) - 1.0) < 0.25
