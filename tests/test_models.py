import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isokann_tpu.models import MLP, pairnet, densenet, smallnet, growmodel


def test_pairnet_shapes(key):
    m = pairnet(n=66, nout=1, key=key)
    assert m.inputdim == 66
    assert m.outputdim == 1
    x = jnp.ones((7, 66))
    y = m(x)
    assert y.shape == (7, 1)


def test_pairnet_geometric_widths(key):
    m = pairnet(n=1000, layers=3, key=key)
    # n^(l/L) decay: 1000 -> 100 -> 10 -> nout
    assert m.sizes == (1000, 100, 10, 1)


def test_batch_dims(key):
    m = smallnet(2, key=key)
    x = jnp.ones((5, 3, 2))
    y = m(x)
    assert y.shape == (5, 3, 1)
    # consistent with flattened batch
    y2 = m(x.reshape(15, 2)).reshape(5, 3, 1)
    assert np.allclose(y, y2)


def test_densenet_multidim(key):
    m = densenet([4, 8, 3], key=key)
    assert m(jnp.ones((10, 4))).shape == (10, 3)


def test_growmodel(key):
    m = pairnet(n=20, nout=1, key=key)
    g = growmodel(m, 3)
    assert g.outputdim == 3
    assert np.allclose(g.params["layers"][0]["w"], m.params["layers"][0]["w"])


def test_layernorm_standardizes(key):
    m = pairnet(n=32, layernorm=True, key=key)
    assert "ln" in m.params


def test_apply_pure(key):
    m = smallnet(2, key=key)
    f = jax.jit(m.apply)
    x = jnp.ones((4, 2))
    assert np.allclose(f(m.params, x), m(x))


def test_autonet_low_dim_gets_capacity(key):
    from isokann_tpu.models import autonet

    # pairnet's geometric decay degenerates on tiny feature dims
    # ([2, 2, 1, 1] — the round-4 deca traj-iso underfit); autonet must
    # route low-dim inputs to the fixed-width smallnet
    m = autonet(2, key=key)
    assert m.inputdim == 2 and m.outputdim == 1
    assert min(m.sizes[1:-1]) >= 8
    # rich featurizations keep the reference pairnet shape
    m45 = autonet(45, key=key)
    assert m45.sizes == pairnet(n=45, key=key).sizes


def test_defaultmodel_low_dim_trains_nonlinear(key):
    """Regression for the deca traj-iso CV underfit: Iso's default
    model on a 2-D coordinate featurization must have the capacity to
    represent a nonlinear chi (the degenerate [2,2,1,1] pairnet could
    not: on the same data it stalls at ~4x the loss and the learned
    chi stays a sliver)."""
    import isokann_tpu as itk
    from isokann_tpu.data import SimulationData
    from isokann_tpu.features import FeaturesCoords
    from isokann_tpu.simulators.base import ExternalSimulation

    # diffusive 2-state process in 2-D: two blobs at x1 = -/+0.7,
    # lagged samples stay local (90%) or jump to the mirrored point
    rng = np.random.default_rng(0)
    n, nk = 256, 4
    s = rng.integers(0, 2, n)
    xs = np.stack([(2.0 * s - 1.0) * 0.7, np.zeros(n)], axis=1) \
        + 0.25 * rng.standard_normal((n, 2))
    flip = rng.random((n, nk)) < 0.1
    ys = np.where(flip[..., None], -xs[:, None, :], xs[:, None, :]) \
        + 0.1 * rng.standard_normal((n, nk, 2))

    sim = ExternalSimulation(_lagtime=1.0)
    data = SimulationData.from_coords(sim, jnp.asarray(xs),
                                      jnp.asarray(ys),
                                      featurizer=FeaturesCoords())
    iso = itk.Iso(data=data, key=3, opt=itk.AdamRegularized())
    assert min(iso.model.sizes[1:-1]) >= 8
    iso.run(300)
    chi = np.asarray(iso.chis()).ravel()
    # the binary label itself is noisy (the blobs overlap), so the
    # plateau sits ~0.93; the broken net scored 0.02 with range 0.03
    assert chi.max() - chi.min() > 0.4, (chi.min(), chi.max())
    corr = abs(np.corrcoef(chi, s)[0, 1])
    assert corr > 0.85, corr
