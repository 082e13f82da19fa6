"""Neural-network chi models as plain JAX pytrees.

TPU-native rebuild of the reference model zoo (``src/models.jl``):
``pairnet`` (geometric width decay, reference ``src/models.jl:65-69``),
``densenet`` (``src/models.jl:87-92``), ``smallnet`` (``src/models.jl:102-108``)
and ``growmodel`` (``src/models.jl:97-99``).

Design: a model is a lightweight ``MLP`` object holding a *static* spec
(layer sizes, activation names, layernorm flag) plus a ``params`` pytree.
``MLP.apply(params, x)`` is a pure function of ``params`` and ``x`` and is
what gets captured in jitted training loops.

Array convention (TPU-native, row-major): inputs are ``(..., features)``,
outputs ``(..., nout)`` — batch dims lead, feature dim last, so every layer
is a ``(batch, in) @ (in, out)`` matmul that tiles directly onto the MXU.
(The reference uses Flux's column convention ``(features, batch)``; we keep
its *logical* content but transpose the layout.)
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

ACTIVATIONS: dict[str, Callable] = {
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
    "softplus": jax.nn.softplus,
    "identity": lambda x: x,
}


def glorot_uniform(key, shape, dtype=jnp.float32):
    """Flux.jl's default Dense init (glorot uniform). ``shape = (in, out)``."""
    fan_in, fan_out = shape
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def init_mlp_params(key, sizes: Sequence[int], layernorm: bool, dtype=jnp.float32):
    layers = []
    for i in range(len(sizes) - 1):
        key, sub = jax.random.split(key)
        w = glorot_uniform(sub, (sizes[i], sizes[i + 1]), dtype)
        b = jnp.zeros((sizes[i + 1],), dtype)
        layers.append({"w": w, "b": b})
    params = {"layers": layers}
    if layernorm:
        params["ln"] = {
            "gamma": jnp.ones((sizes[0],), dtype),
            "beta": jnp.zeros((sizes[0],), dtype),
        }
    return params


def mlp_apply(params, x, activation: str = "sigmoid", lastactivation: str = "identity"):
    """Forward pass. ``x``: (..., features) -> (..., nout)."""
    act = ACTIVATIONS[activation]
    lastact = ACTIVATIONS[lastactivation]
    shape = x.shape
    x = x.reshape(-1, shape[-1])
    if "ln" in params:
        # LayerNorm over the feature dimension (Flux.LayerNorm(n) semantics).
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        xn = (x - mu) / jnp.sqrt(var + 1e-5)
        x = xn * params["ln"]["gamma"] + params["ln"]["beta"]
    layers = params["layers"]
    for i, layer in enumerate(layers):
        x = x @ layer["w"] + layer["b"]
        x = lastact(x) if i == len(layers) - 1 else act(x)
    return x.reshape(shape[:-1] + (x.shape[-1],))


@dataclass
class MLP:
    """A chi-model: static spec + params pytree.

    Calling the model runs the forward pass with the *current* params;
    jitted code should instead close over ``self.apply`` and thread params
    explicitly.
    """

    sizes: tuple
    activation: str = "sigmoid"
    lastactivation: str = "identity"
    layernorm: bool = False
    params: Any = None

    def __post_init__(self):
        self.sizes = tuple(int(s) for s in self.sizes)

    def init(self, key):
        self.params = init_mlp_params(key, self.sizes, self.layernorm)
        return self

    def apply(self, params, x):
        return mlp_apply(params, x, self.activation, self.lastactivation)

    def __call__(self, x, params=None):
        p = self.params if params is None else params
        return self.apply(p, jnp.asarray(x))

    @property
    def inputdim(self) -> int:
        return self.sizes[0]

    @property
    def outputdim(self) -> int:
        return self.sizes[-1]

    def with_params(self, params) -> "MLP":
        return replace(self, params=params)


def inputdim(model: MLP) -> int:
    return model.inputdim


def outputdim(model: MLP) -> int:
    return model.outputdim


def densenet(layers: Sequence[int], activation="sigmoid", lastactivation="identity",
             layernorm=False, key=None) -> MLP:
    """Fully connected chain builder (reference ``src/models.jl:87-92``)."""
    if key is None:
        key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
    return MLP(tuple(layers), activation, lastactivation, layernorm).init(key)


def pairnet(n: int = None, layers: int = 3, activation="sigmoid",
            lastactivation="identity", nout: int = 1, layernorm: bool = True,
            key=None, data=None) -> MLP:
    """Default chi MLP with geometric layer-width decay ``n^(l/L)``
    (reference ``src/models.jl:65-69``)."""
    if n is None:
        if data is None:
            raise ValueError("pairnet needs n or data")
        n = data.featuredim
    sizes = [round(n ** (l / layers)) for l in range(layers, 0, -1)] + [nout]
    return densenet(sizes, activation, lastactivation, layernorm, key)


def smallnet(nin: int, nout: int = 1, activation="sigmoid",
             lastactivation="identity", key=None) -> MLP:
    """3x8-unit MLP for low-dimensional Langevin toys (``src/models.jl:102-108``)."""
    return densenet([nin, 8, 8, 8, nout], activation, lastactivation, False, key)


def autonet(n: int, nout: int = 1, key=None, **kwargs) -> MLP:
    """Default chi model by feature dimension.

    ``pairnet``'s geometric width decay ``n^(l/L)`` (reference
    ``src/models.jl:65-69``) degenerates to ~1-unit hidden layers when
    the featurization is low-dimensional (e.g. ``FeaturesCoords`` over
    a 2-D CV space: sizes [2, 2, 1, 1] — no capacity at all); the
    reference never hits this because its pairnet only ever sees
    pairwise-distance features, and it uses the fixed-width
    ``smallnet`` for low-dim systems (``src/simulators/langevin.jl:9``).
    Mirror that split here: smallnet below 16 features, pairnet above
    (pairnet-only kwargs are dropped on the smallnet branch)."""
    if n < 16:
        return smallnet(n, nout=nout, key=key)
    return pairnet(n=n, nout=nout, key=key, **kwargs)


def growmodel(model: MLP, n: int, key=None) -> MLP:
    """Replace the last layer to change the output dim (``src/models.jl:97-99``)."""
    if key is None:
        key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
    sizes = model.sizes[:-1] + (n,)
    new = MLP(sizes, model.activation, model.lastactivation, model.layernorm).init(key)
    # keep the trained weights of all but the last layer
    new.params["layers"][:-1] = [
        {"w": l["w"], "b": l["b"]} for l in model.params["layers"][:-1]
    ]
    if "ln" in model.params:
        new.params["ln"] = model.params["ln"]
    return new
