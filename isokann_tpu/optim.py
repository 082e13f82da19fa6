"""Optimizers for ISOKANN training, built on optax.

Mirrors the reference's optimizer constructors (``src/models.jl:4-20``):
``OptimiserChain(WeightDecay(reg), Adam/Nesterov)`` — i.e. the decay term is
*added to the gradient before* the accelerator (L2 regularization, explicitly
not decoupled AdamW; see the reference docstring at ``src/models.jl:6-11``).
"""

from __future__ import annotations

import optax


def AdamRegularized(adam: float = 1e-3, reg: float = 1e-4):
    """WeightDecay(reg) |> Adam(adam), cf. ``src/models.jl:12``."""
    return optax.chain(
        optax.add_decayed_weights(reg),
        optax.scale_by_adam(),
        optax.scale(-adam),
    )


def NesterovRegularized(lr: float = 1e-3, reg: float = 1e-4):
    """WeightDecay(reg) |> Nesterov(lr, 0.9), cf. ``src/models.jl:20``.

    This is the reference's default optimizer (``src/iso.jl:18``).
    """
    return optax.chain(
        optax.add_decayed_weights(reg),
        optax.trace(decay=0.9, nesterov=True),
        optax.scale(-lr),
    )


def setup(opt, params):
    return opt.init(params)
