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
