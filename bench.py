"""North-star benchmark: 100-episode alanine-dipeptide ISOKANN run.

Matches the reference quickstart scale (BASELINE.md): default MD config
(100 steps x 2 fs lag, 310 K), SimulationData(sim, nx=100, nk=5), 100
training episodes.  Target: < 60 s wall-clock on one TPU v5e chip.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "s", "vs_baseline": ...}
plus a breakdown on stderr.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np
    import isokann_tpu as itk

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    log("devices:", jax.devices())

    # warm up the compile channel (remote-compile backends pay a large
    # first-compile latency) — not part of the measured algorithm
    warm = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (c * 1.0001, None), x, None, length=8)[0])
    jax.block_until_ready(warm(jnp.ones((4, 4))))

    t_start = time.time()

    t0 = time.time()
    sim = itk.MDSimulation(steps=100)   # default ala2 (pre-minimized fixture)
    t_setup = time.time() - t0

    t0 = time.time()
    iso = itk.Iso(sim=sim, nx=100, nk=5, key=0, opt=itk.AdamRegularized())
    t_data = time.time() - t0

    t0 = time.time()
    iso.run(100)
    t_train = time.time() - t0

    total = time.time() - t_start
    log(f"setup {t_setup:.1f}s  datagen {t_data:.1f}s  train100 {t_train:.1f}s"
        f"  total {total:.1f}s")
    log(f"loss {iso.losses[0]:.4f} -> {iso.losses[-1]:.4f}")

    # Langevin MD throughput metric (steps/sec/chip): walkers * md-steps / datagen time
    md_steps = 100 * 5 * 100 + 100 * 100   # propagate + randx0 lagged traj
    log(f"~{md_steps / t_data:.0f} walker-MD-steps/s during datagen")

    chi = np.asarray(iso.chis())
    ok = bool(np.all(np.isfinite(chi)))
    log("chi finite:", ok, "range", float(chi.min()), float(chi.max()))

    baseline = 60.0   # target wall-clock from BASELINE.md north star
    print(json.dumps({
        "metric": "ala2_100ep_wall_s",
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": round(baseline / total, 3),
    }))


if __name__ == "__main__":
    main()
