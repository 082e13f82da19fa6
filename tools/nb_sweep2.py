"""Measure the neighbor sweep under candidate cell plans on the TPU
(round-2 geometry study; see tools/nb_perf.py for the fault harness).

Usage: python -u tools/nb_sweep2.py [idx ...]   (default: all configs)
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CONFIGS = [
    ("auto", dict()),
    ("cols-5x4x1 m1.3", dict(cells=(5, 4, 1), margin=1.3)),
    ("cols-10x8x1 m1.3", dict(cells=(10, 8, 1), margin=1.3)),
    ("div1 m1.5 (r1 base)", dict(cells=(5, 4, 3), margin=1.5)),
    ("div1 m1.25 C208", dict(cells=(5, 4, 3), margin=1.25)),
]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import isokann_tpu as itk
    from isokann_tpu.md.neighbor import NeighborPlan, force_flat_neighbor

    idxs = [int(a) for a in sys.argv[1:]] or list(range(len(CONFIGS)))

    sim = itk.MDSimulation(pdb=f"{ROOT}/out/nb_perf/peptide.pdb",
                           addwater=True, padding=1.0, steps=100,
                           dense_pairs=False)
    s = sim.system
    x0 = np.asarray(sim.coords).reshape(-1, 3)
    print(f"{sim.natoms} atoms", flush=True)

    # warm the compile channel
    warm = jax.jit(lambda x: x @ x)
    jax.block_until_ready(warm(jnp.ones((128, 128))))

    for i in idxs:
        label, kw = CONFIGS[i]
        plan = NeighborPlan(s, x0=x0, **kw)
        xb = jnp.asarray(np.tile(np.asarray(sim.coords)[None, :], (8, 1)))
        fn = jax.jit(lambda z, p=plan: force_flat_neighbor(s, z, p))
        try:
            t0 = time.time()
            f = fn(xb)
            jax.block_until_ready(f)
            t_compile = time.time() - t0
            t0 = time.time()
            reps = 10
            for _ in range(reps):
                jax.block_until_ready(fn(xb))
            dt = (time.time() - t0) / reps
            fin = bool(np.isfinite(np.asarray(f)).all())
            print(f"[{label}] nc={plan.nc} C={plan.C} S={plan.S} "
                  f"newton={plan.newton}: {dt * 1e3:.2f} ms/8-walker call "
                  f"({8 / dt:.0f} force-evals/s) compile {t_compile:.0f}s "
                  f"finite={fin}", flush=True)
        except Exception as e:
            print(f"[{label}] nc={plan.nc} C={plan.C}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            break      # a device fault usually wedges the process


if __name__ == "__main__":
    main()
