"""Multi-host scaling over DCN: process initialization + per-host data
feeding.

The algorithm's cross-chip traffic is tiny (SURVEY.md §5: psum of
gradients, global min/max for shift-scale), so multi-host meshes only
need (a) `jax.distributed` bring-up and (b) assembling globally-sharded
walker arrays from per-host local data — both wrapped here.  Everything
downstream (``parallel.mesh``) operates on the global mesh unchanged.

Single-host processes (the common case, and all tests) work through the
same API: ``initialize`` is a no-op and per-host data is the global data.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None, **kw):
    """Bring up multi-host JAX (DCN).

    Must be called before any other JAX API (anything that initializes
    the XLA backend makes distributed bring-up impossible — this
    function therefore probes nothing before initializing).

    With explicit arguments every failure propagates.  With no
    arguments, cluster auto-detection is attempted (TPU pods) and a
    detection failure is treated as "single process" and ignored;
    double initialization is ignored in both modes."""
    if num_processes is not None and num_processes <= 1:
        return
    # idempotency up front: once the cluster client exists, a re-call
    # raises "must be called before any JAX calls" (not "already
    # initialized"), so string matching below would mis-handle it
    try:
        from jax._src import distributed as _jdist
        if getattr(_jdist.global_state, "client", None) is not None:
            return
    except (ImportError, AttributeError):
        pass   # private jax API moved/renamed: fall through to init
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id, **kw)
    except RuntimeError as e:
        if "already" in str(e).lower():
            return   # idempotent: distributed is already up
        if coordinator_address is None and num_processes is None:
            # no cluster detected -> single-process environment; log the
            # cause so a REAL pod bring-up failure is never silent
            logger.info("jax.distributed auto-detection failed (%s); "
                        "continuing single-process", e)
            return
        raise
    except ValueError as e:
        if coordinator_address is None and num_processes is None:
            logger.info("jax.distributed auto-detection unavailable (%s); "
                        "continuing single-process", e)
            return   # auto-detection unavailable on this platform
        raise


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every device of every participating process."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_local_batch(mesh: Mesh, local, axis: str = "data"):
    """Assemble a globally walker-sharded array from per-host local data.

    Each process passes its own shard (n_local, ...); the result behaves
    as the concatenated (n_local * n_processes, ...) array sharded over
    the mesh.  With one process this equals ``shard_batch``."""
    local = np.asarray(local)
    spec = P(axis, *([None] * (local.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local)


def process_slice(n_global: int) -> slice:
    """The [start, stop) walker range this process is responsible for
    (per-host data loading; reference has no equivalent — single node)."""
    per = n_global // jax.process_count()
    rem = n_global % jax.process_count()
    i = jax.process_index()
    start = i * per + min(i, rem)
    return slice(start, start + per + (1 if i < rem else 0))
