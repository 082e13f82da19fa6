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

Robustness: the TPU tunnel is flaky (backend init can fail transiently or
block for minutes).  Device discovery retries with exponential backoff for
up to 8 minutes (wait_for_devices), clearing jax's cached backend error
between attempts; if the benchmark still cannot run, the JSON metric line
is emitted anyway with value=null and an "error" field so the driver
record stays parseable.
"""

import json
import os
import sys
import threading
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))


_PROCESS_T0 = time.time()

METRIC = "ala2_100ep_wall_s"


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def _reset_jax_backends(log=_log):
    """Drop jax's cached backend-init state so the next jax.devices() call
    re-attempts initialization.  jax caches backend-init *failures*
    (xla_bridge._backend_errors), so a plain retry loop would just re-raise
    the cached error forever."""
    try:
        import jax.extend.backend
        jax.extend.backend.clear_backends()
    except Exception as e:                               # pragma: no cover
        log("  clear_backends failed:", type(e).__name__, e)
    try:
        from jax._src import xla_bridge as xb
        with xb._backend_lock:
            xb._backends.clear()
            xb._backend_errors.clear()
    except Exception as e:                               # pragma: no cover
        log("  xla_bridge cache reset failed:", type(e).__name__, e)


def wait_for_devices(get_devices=None, reset=None, sleep=time.sleep,
                     monotonic=time.monotonic, log=_log,
                     max_wait=480.0, base_delay=2.0, max_delay=60.0):
    """Return jax.devices(), retrying backend init with exponential backoff.

    The TPU tunnel on this backend is flaky: device claims can block or fail
    transiently for minutes (CLAUDE.md).  Retry for up to `max_wait` seconds
    (default 8 min), resetting jax's cached backend error between attempts.
    Raises the last error once the deadline passes.
    """
    if get_devices is None:
        import jax
        get_devices = jax.devices
    if reset is None:
        reset = _reset_jax_backends
    t0 = monotonic()
    delay = base_delay
    attempt = 0
    while True:
        attempt += 1
        try:
            devices = get_devices()
            if attempt > 1:
                log(f"backend up after {attempt} attempts "
                    f"({monotonic() - t0:.0f}s)")
            return devices
        except Exception as e:
            elapsed = monotonic() - t0
            if elapsed + delay > max_wait:
                log(f"backend init failed permanently after {attempt} "
                    f"attempts / {elapsed:.0f}s: {type(e).__name__}: {e}")
                raise
            log(f"backend init attempt {attempt} failed "
                f"({type(e).__name__}: {e}); retrying in {delay:.0f}s "
                f"({elapsed:.0f}/{max_wait:.0f}s elapsed)")
            sleep(delay)
            delay = min(delay * 2, max_delay)
            reset(log)


def probe_devices_subprocess(timeout=150.0, log=_log):
    """One device-discovery probe in a THROWAWAY subprocess.

    The in-process retry loop only survives discovery that *raises*; the
    tunnel also fails by HANGING the first device op indefinitely (seen
    2026-08-18), which no in-process retry can escape.  A subprocess
    probe can be killed on timeout, keeping the benchmark process
    responsive.  Raises on probe failure/timeout; returns device count."""
    import subprocess
    code = "import jax; print('NDEV', len(jax.devices()))"
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       timeout=timeout, text=True)
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()[-3:]
        raise RuntimeError(f"device probe failed: {' | '.join(tail)}")
    for line in r.stdout.splitlines():
        if line.startswith("NDEV"):
            return int(line.split()[1])
    raise RuntimeError("device probe produced no output")


def wait_for_devices_hang_safe(max_wait=480.0, probe_timeout=150.0,
                               sleep=time.sleep, monotonic=time.monotonic,
                               log=_log, probe=None, wait=None):
    """Hang-safe discovery: subprocess probes (killable) with backoff
    until the backend answers, THEN the in-process discovery (fast once
    the tunnel is healthy, and itself retry-wrapped)."""
    import subprocess
    probe = probe_devices_subprocess if probe is None else probe
    wait = wait_for_devices if wait is None else wait
    t0 = monotonic()
    delay = 2.0
    attempt = 0
    while True:
        attempt += 1
        try:
            n = probe(timeout=probe_timeout)
            log(f"subprocess probe ok ({n} device(s), attempt {attempt})")
            break
        except (subprocess.TimeoutExpired, Exception) as e:
            elapsed = monotonic() - t0
            if elapsed + delay > max_wait:
                log(f"device probe failed permanently after {attempt} "
                    f"attempts / {elapsed:.0f}s")
                raise
            log(f"device probe attempt {attempt} failed "
                f"({type(e).__name__}); retrying in {delay:.0f}s")
            sleep(delay)
            delay = min(delay * 2, 60.0)
    remaining = max(60.0, max_wait - (monotonic() - t0))
    return wait(max_wait=remaining)


def failure_json(exc):
    """The JSON metric line emitted when the benchmark cannot run: keeps the
    driver record parseable (metric/unit present, value null, error set)."""
    return json.dumps({
        "metric": METRIC,
        "value": None,
        "unit": "s",
        "vs_baseline": None,
        "error": f"{type(exc).__name__}: {exc}",
    })


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np
    import isokann_tpu as itk
    from isokann_tpu.data import SimulationData

    log = _log

    log("devices:", wait_for_devices_hang_safe())

    # warm up the compile channel (remote-compile backends pay a large
    # first-compile latency) — not part of the measured algorithm
    warm = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (c * 1.0001, None), x, None, length=8)[0])
    jax.block_until_ready(warm(jnp.ones((4, 4))))

    NX, NK, EPISODES = 100, 5, 100

    sim = itk.MDSimulation(steps=100)   # default ala2 (pre-minimized fixture)
    nfeat = sim.natoms * (sim.natoms - 1) // 2
    model = sim.defaultmodel(n=nfeat, key=jax.random.PRNGKey(0))
    dummy = SimulationData.from_coords(
        sim, jnp.zeros((1, sim.dim)), jnp.zeros((1, NK, sim.dim)),
        features=(jnp.zeros((1, nfeat)), jnp.zeros((1, NK, nfeat))))

    def pipeline(seed, iso_prev=None):
        """The full north-star pipeline: datagen + 100 training episodes.
        The training program is AOT-compiled on a thread concurrent with
        data generation (remote compiles parallelize)."""
        iso = itk.Iso(data=dummy, model=model, opt=itk.AdamRegularized(),
                      key=seed)
        if iso_prev is not None:
            iso._jit_cache = iso_prev._jit_cache        # reuse executables
        compile_err = []

        def compile_train():
            try:
                t0 = time.time()
                iso.precompile_fused(NX, NK, EPISODES)
                log(f"  train program ready in {time.time() - t0:.1f}s (thread)")
            except Exception as e:       # pragma: no cover
                compile_err.append(e)

        th = None
        from isokann_tpu.iso import bucket_capacity
        key_ = ("fused", bucket_capacity(NX), NK, nfeat, EPISODES, 1, False)
        if key_ not in iso._jit_cache:
            th = threading.Thread(target=compile_train)
            th.start()
        t0 = time.time()
        data = SimulationData.from_sim(sim, nx=NX, nk=NK,
                                       key=jax.random.PRNGKey(seed))
        t_data = time.time() - t0
        if th is not None:
            th.join()
        if compile_err:
            raise compile_err[0]
        iso.data = data
        t0 = time.time()
        iso.run(EPISODES)
        t_train = time.time() - t0
        log(f"  datagen {t_data:.1f}s  train{EPISODES} {t_train:.1f}s")
        return iso

    params0 = jax.tree_util.tree_map(lambda x: x, model.params)

    # warmup pass: compiles every program (remote-compile latency is
    # 10-200s and excluded from the steady-state metric)
    log("warmup pass (compiles):")
    t0 = time.time()
    iso = pipeline(1)
    log(f"  warmup total {time.time() - t0:.1f}s")

    # measured pass: fresh params + fresh data, all programs hot
    model.params = params0
    log("measured pass:")
    t_start = time.time()
    iso = pipeline(2, iso_prev=iso)
    total = time.time() - t_start
    log(f"total {total:.2f}s")
    log(f"loss {iso.losses[0]:.4f} -> {iso.losses[-1]:.4f}")

    chi = np.asarray(iso.chis())
    ok = bool(np.all(np.isfinite(chi)))
    log("chi finite:", ok, "range", float(chi.min()), float(chi.max()))

    # walker-throughput telemetry (hot-path MD speed, excluded from metric);
    # skipped when compiles already ate the wall-clock budget
    from isokann_tpu.md import integrators as I
    m3, T = sim.masses3, sim.temp
    B = 16384
    if time.time() - _PROCESS_T0 > 500:
        log("skipping throughput telemetry (compile budget exhausted)")
        B = 0
    x = jnp.tile(sim.coords[None, :], (B, 1))
    v = I.maxwell_boltzmann(jax.random.PRNGKey(2), m3, T, x.shape)
    extras = {}
    try:
        if B == 0:
            raise TimeoutError("budget")
        from isokann_tpu.md.pallas_md import langevin_middle_fused, PallasMDPlan
        from isokann_tpu.utils.flops import fused_md_flops, mfu
        run1k = jax.jit(lambda x, v, k: langevin_middle_fused(
            sim.system, x, v, T, sim.friction, sim.step, 1000, k, block=256))
        jax.block_until_ready(run1k(x, v, jax.random.PRNGKey(3))[0])
        t0 = time.time()
        jax.block_until_ready(run1k(x, v, jax.random.PRNGKey(4))[0])
        rate = B * 1000 / (time.time() - t0)
        u = mfu(fused_md_flops(PallasMDPlan(sim.system)), rate)
        # regression gate (VERDICT r4 Weak #6): historical range on this
        # config is 4.5-6.0e7 walker-steps/s; below the floor is a tracked
        # signal, not runtime variance
        floor = 4.0e7
        extras = {
            "md_walker_steps_per_s": round(rate, -3),
            "md_pct_mxu_bf16": round(u["pct_mxu_bf16"], 4),
            "md_pct_vpu_f32": round(u["pct_vpu_f32"], 4),
            "md_roofline_bound": u["bound"],
            "md_floor_ok": bool(rate >= floor),
        }
        log(f"MD throughput (pallas fused): {rate:.3g} walker-steps/s/chip "
            f"(ref CPU: ~950 steps/s single walker); "
            f"{100 * u['pct_mxu_bf16']:.1f}% MXU-bf16 / "
            f"{100 * u['pct_vpu_f32']:.1f}% VPU-f32 peak ({u['bound']}-bound)"
            + ("" if rate >= floor else
               f"  ** REGRESSION: below the {floor:.1e} floor **"))
    except Exception as e:
        log("pallas throughput unavailable:", type(e).__name__)

    baseline = 60.0   # target wall-clock from BASELINE.md north star
    print(json.dumps({
        "metric": METRIC,
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": round(baseline / total, 3),
        **extras,
    }))


def _watchdog(seconds):
    """Last-resort guarantee of a parseable record: device ops through the
    tunnel can hang forever (not just fail), and a hung benchmark process
    emits nothing.  After `seconds`, print the failure JSON and hard-exit."""
    def fire():
        time.sleep(seconds)
        _log(f"watchdog: no result after {seconds:.0f}s; emitting "
             "failure record")
        print(failure_json(TimeoutError(f"benchmark hung > {seconds:.0f}s")),
              flush=True)
        os._exit(2)
    th = threading.Thread(target=fire, daemon=True)
    th.start()


if __name__ == "__main__":
    _watchdog(float(os.environ.get("BENCH_WATCHDOG_S", 2400)))
    try:
        main()
    except Exception as e:
        # always emit the metric line: the driver parses stdout regardless
        # of rc, and a missing line (round 2) left no perf record at all
        traceback.print_exc()
        print(failure_json(e))
        sys.exit(1)
