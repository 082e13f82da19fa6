"""Simulation abstraction layer.

TPU-native rebuild of the reference ``IsoSimulation`` interface
(``src/simulation.jl:6-30``).  A simulation provides:

- ``dim``            : coordinate dimension d
- ``coords``         : a default start state (d,)
- ``lagtime``        : physical lag time of one Koopman propagation
- ``propagate(xs, nk, key)`` : (n, d) -> (n, nk, d) burst propagation
- ``trajectory(...)`` / ``laggedtrajectory(...)``
- ``randx0(n, key)`` : (n, d) random start points
- ``featurizer``     : coords -> features (vmappable), or None
- ``defaultmodel(...)``: a suitable chi-model for this system

Unlike the reference (serial / threaded loops, ``src/simulators/langevin.jl:24``),
propagation here is a single jitted ``vmap``-over-walkers ``lax.scan``-over-steps
device computation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


class IsoSimulation:
    """Base class: shared convenience defaults."""

    featurizer = None

    @property
    def dim(self) -> int:
        raise NotImplementedError

    @property
    def lagtime(self) -> float:
        raise NotImplementedError

    def propagate(self, xs, nk, key=None):
        raise NotImplementedError

    def randx0(self, n, key=None):
        """Default: n propagations of the default start state
        (reference ``src/simulation.jl:23-27``)."""
        x0 = jnp.asarray(self.coords)[None, :]
        ys = self.propagate(x0, n, key=key)
        return ys[0]

    def defaultmodel(self, n=None, nout=1, key=None, **kwargs):
        from ..models import autonet
        return autonet(n if n is not None else self.dim, nout=nout,
                       key=key, **kwargs)

    def __repr__(self):
        return f"{type(self).__name__} with {self.dim} dimensions"


@dataclass
class ExternalSimulation(IsoSimulation):
    """Metadata-only stub for externally generated data
    (reference ``src/simulation.jl:41-50``)."""

    pdbfile: Optional[str] = None
    masses: Any = None
    _lagtime: float = 1.0
    extra: dict = field(default_factory=dict)

    @property
    def lagtime(self):
        return self._lagtime

    @property
    def dim(self):
        raise ValueError("ExternalSimulation has no intrinsic dimension")

    def propagate(self, xs, nk, key=None):
        raise ValueError("ExternalSimulation cannot propagate new samples")

    def __repr__(self):
        return f"ExternalSimulation(pdbfile={self.pdbfile}, lagtime={self._lagtime})"
