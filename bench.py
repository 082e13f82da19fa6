"""North-star benchmark: 100-episode alanine-dipeptide ISOKANN run.

Matches the reference quickstart scale (BASELINE.md): default MD config
(100 steps x 2 fs lag, 310 K), SimulationData(sim, nx=100, nk=5), 100
training episodes.  Target: < 60 s wall-clock on one TPU v5e chip.

Wall time on this backend is dominated by remote-compile latency, so the
two large programs (fused datagen, fused training scan) are compiled
CONCURRENTLY: the training program is AOT-lowered on a thread while the
main thread generates the dataset.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "s", "vs_baseline": ...}
plus a breakdown on stderr.
"""

import json
import os
import sys
import threading
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
    from isokann_tpu.data import SimulationData

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    log("devices:", jax.devices())

    # warm up the compile channel (remote-compile backends pay a large
    # first-compile latency) — not part of the measured algorithm
    warm = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (c * 1.0001, None), x, None, length=8)[0])
    jax.block_until_ready(warm(jnp.ones((4, 4))))

    NX, NK, EPISODES = 100, 5, 100

    t_start = time.time()

    t0 = time.time()
    sim = itk.MDSimulation(steps=100)   # default ala2 (pre-minimized fixture)
    nfeat = sim.natoms * (sim.natoms - 1) // 2
    model = sim.defaultmodel(n=nfeat, key=jax.random.PRNGKey(0))
    dummy = SimulationData.from_coords(
        sim, jnp.zeros((1, sim.dim)), jnp.zeros((1, NK, sim.dim)),
        features=(jnp.zeros((1, nfeat)), jnp.zeros((1, NK, nfeat))))
    iso = itk.Iso(data=dummy, model=model, opt=itk.AdamRegularized(), key=0)
    t_setup = time.time() - t0

    # compile the training program concurrently with data generation
    compile_err = []

    def compile_train():
        try:
            t0 = time.time()
            iso.precompile_fused(NX, NK, EPISODES)
            log(f"train program compiled in {time.time() - t0:.1f}s (thread)")
        except Exception as e:       # pragma: no cover
            compile_err.append(e)

    th = threading.Thread(target=compile_train)
    th.start()

    t0 = time.time()
    data = SimulationData.from_sim(sim, nx=NX, nk=NK,
                                   key=jax.random.PRNGKey(1))
    t_data = time.time() - t0
    th.join()
    if compile_err:
        raise compile_err[0]
    iso.data = data

    t0 = time.time()
    iso.run(EPISODES)
    t_train = time.time() - t0

    total = time.time() - t_start
    log(f"setup {t_setup:.1f}s  datagen {t_data:.1f}s  train100 {t_train:.1f}s"
        f"  total {total:.1f}s")
    log(f"loss {iso.losses[0]:.4f} -> {iso.losses[-1]:.4f}")

    chi = np.asarray(iso.chis())
    ok = bool(np.all(np.isfinite(chi)))
    log("chi finite:", ok, "range", float(chi.min()), float(chi.max()))

    # walker-throughput telemetry (hot-path MD speed, excluded from metric)
    from isokann_tpu.md import integrators as I
    from isokann_tpu.md.forces import force_flat
    m3, T, g, dt = sim.masses3, sim.temp, sim.friction, sim.step
    ff = lambda z: force_flat(sim.system, z)
    B = 4096
    run1k = jax.jit(lambda x, v, k: I.langevin_middle(ff, x, v, m3, T, g, dt,
                                                      1000, k))
    x = jnp.tile(sim.coords[None, :], (B, 1))
    v = I.maxwell_boltzmann(jax.random.PRNGKey(2), m3, T, x.shape)
    jax.block_until_ready(run1k(x, v, jax.random.PRNGKey(3)))
    t0 = time.time()
    jax.block_until_ready(run1k(x, v, jax.random.PRNGKey(4)))
    rate = B * 1000 / (time.time() - t0)
    log(f"MD throughput: {rate:.3g} walker-steps/s/chip "
        f"(ref CPU: ~950 steps/s single walker)")

    baseline = 60.0   # target wall-clock from BASELINE.md north star
    print(json.dumps({
        "metric": "ala2_100ep_wall_s",
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": round(baseline / total, 3),
    }))


if __name__ == "__main__":
    main()
