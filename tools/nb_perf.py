"""Neighbor-engine perf + v5e fault retest harness (ROADMAP round-2 #1).

Builds the 7.7k-atom solvated-peptide benchmark system and measures the
propagation rate and the raw sweep cost under different configurations,
then retests the two v5e backend faults round 1 engineered around:
  (a) >4-walker batches of the sweep kernel inside lax.scan
  (b) tight capacity margins / specific C geometries (e.g. C=208)

Usage: python tools/nb_perf.py [--quick] [--fault-only|--perf-only]
"""

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def build(small=False):
    import numpy as np
    import isokann_tpu as itk
    from isokann_tpu.md.fixtures import peptide_pdb

    out = os.path.join(ROOT, "out", "nb_perf")
    os.makedirs(out, exist_ok=True)
    seq = "AQGS" if small else "AQGSAELAKVM"
    pdb = f"{out}/peptide.pdb"
    if not os.path.exists(pdb):
        # prep is CPU work (run `--prep-only` under JAX_PLATFORMS=cpu
        # first so the TPU session doesn't burn its window on the
        # minimizer's mini-compiles)
        peptide_pdb(seq, pdb, minimize=True,
                    maxiter=150 if small else 300)
    sim = itk.MDSimulation(pdb=pdb, addwater=True,
                           padding=0.7 if small else 1.0,
                           steps=100, dense_pairs=False)
    print(f"{sim.natoms} atoms, box {sim.system.box}", flush=True)
    return sim


def measure_propagate(sim, nwalk, steps=100, label=""):
    import jax
    import numpy as np

    x0 = np.tile(np.asarray(sim.coords)[None, :], (nwalk, 1))
    t0 = time.time()
    ys = sim.propagate(x0, 1, steps=steps, key=jax.random.PRNGKey(0))
    jax.block_until_ready(ys)
    t_compile = time.time() - t0
    t0 = time.time()
    reps = 3
    for r in range(reps):
        ys = sim.propagate(np.asarray(ys)[:, 0], 1, steps=steps,
                           key=jax.random.PRNGKey(r + 1))
        jax.block_until_ready(ys)
    dt = (time.time() - t0) / reps
    rate = steps * nwalk / dt
    fin = bool(np.isfinite(np.asarray(ys)).all())
    print(f"[{label}] walkers={nwalk}: {steps / dt * 1:.1f} steps/s/batch, "
          f"{rate:.0f} walker-steps/s ({rate / nwalk:.1f} steps/s/walker), "
          f"compile {t_compile:.0f}s, finite={fin}")
    return rate, fin


def measure_sweep(sim, nwalk, label="", use_pallas=True, reps=20):
    """Raw force-call cost (jitted, no integrator)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from isokann_tpu.md.neighbor import NeighborPlan, force_flat_neighbor

    s = sim.system
    plan = sim._nbplan if getattr(sim, "_nbplan", None) is not None else \
        NeighborPlan(s, x0=np.asarray(sim.coords).reshape(-1, 3))
    sim._nbplan = plan
    xb = jnp.asarray(np.tile(np.asarray(sim.coords)[None, :], (nwalk, 1)))
    fn = jax.jit(lambda z: force_flat_neighbor(s, z, plan,
                                               use_pallas=use_pallas))
    t0 = time.time()
    jax.block_until_ready(fn(xb))
    t_compile = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        jax.block_until_ready(fn(xb))
    dt = (time.time() - t0) / reps
    print(f"[{label}] force call walkers={nwalk}: {dt * 1e3:.2f} ms "
          f"({nwalk / dt:.0f} force-evals/s), compile {t_compile:.0f}s")
    return dt


def measure_verlet(nwalk=4, steps=100, small=False, skin=0.2,
                   rebuild_every=None, verlet_only=False):
    """Propagation rate through the Verlet-list mode (md/verlet.py) on
    the same fixture, vs the default cell/Pallas mode — the measurement
    deciding whether verlet becomes the sparse-system default.

    ``verlet_only`` skips the in-process cells baseline: on the v5e the
    full-scale cells measurement followed by the verlet one in the SAME
    process trips the class-c fault (docs/v5e_fault_report.md), so the
    two modes are measured from separate fresh processes and the
    speedup computed against a cells number passed via
    ISOKANN_CELLS_RATE (walker-steps/s) when available."""
    import json

    import isokann_tpu as itk

    out = os.path.join(ROOT, "out", "nb_perf")
    pdb = f"{out}/peptide_small.pdb" if small else f"{out}/peptide.pdb"
    res = {}
    if verlet_only == "cells":
        # fresh-process cells baseline feeding ISOKANN_CELLS_RATE
        modes = (("cells", {}),)
    elif verlet_only:
        modes = (("verlet", dict(neighbor_mode="verlet", skin=skin)),)
    else:
        modes = (("cells", {}),
                 ("verlet", dict(neighbor_mode="verlet", skin=skin)))
    for mode, kw in modes:
        sim = itk.MDSimulation(pdb=pdb, addwater=True,
                               padding=0.7 if small else 1.0,
                               steps=steps, dense_pairs=False, **kw)
        if mode == "verlet" and rebuild_every is not None:
            from isokann_tpu.md.verlet import VerletPlan
            import numpy as np
            sim._vplan = VerletPlan(sim.system,
                                    x0=np.asarray(sim.coords).reshape(-1, 3),
                                    skin=skin, rebuild_every=rebuild_every)
        rate, fin = measure_propagate(sim, nwalk, steps=steps, label=mode)
        res[mode] = dict(walker_steps_per_s=rate, finite=fin)
        plan = getattr(sim, "_nbplan", None)
        if mode == "cells" and plan is not None:
            # %-of-peak normalization (VERDICT r4: auditable MFU, not
            # bare rates) — candidates/atom = stencil cells x slot cap
            from isokann_tpu.utils.flops import neighbor_sweep_flops, mfu
            u = mfu(neighbor_sweep_flops(sim.natoms, plan.S * plan.C), rate)
            res[mode].update(
                candidates_per_atom=int(plan.S * plan.C),
                pct_vpu_f32=round(u["pct_vpu_f32"], 5))
            print(f"[{mode}] {100 * u['pct_vpu_f32']:.2f}% VPU-f32 peak "
                  f"(candidate-pair flops)")
        if mode == "verlet":
            vp = sim._vplan
            res[mode].update(K=int(vp.K), rebuild_every=int(vp.rebuild_every),
                             rv=float(vp.rv))
    if verlet_only == "cells":
        json.dump(res, open(f"{out}/cells_perf.json", "w"), indent=1)
        print(f"wrote {out}/cells_perf.json")
        return
    if verlet_only:
        cells_rate = float(os.environ.get("ISOKANN_CELLS_RATE", "0") or 0)
        if cells_rate <= 0 and os.path.exists(f"{out}/cells_perf.json"):
            prev = json.load(open(f"{out}/cells_perf.json"))
            cells_rate = float(prev["cells"]["walker_steps_per_s"])
        if cells_rate > 0:
            res["cells"] = dict(walker_steps_per_s=cells_rate,
                                source="separate fresh process "
                                       "(cells_perf.json / env)")
    if "cells" in res:
        res["speedup"] = (res["verlet"]["walker_steps_per_s"]
                          / res["cells"]["walker_steps_per_s"])
        print(f"[verlet] speedup vs cells: {res['speedup']:.2f}x")
    suffix = "_only" if verlet_only else ""
    json.dump(res, open(f"{out}/verlet_perf{suffix}.json", "w"), indent=1)
    print(f"wrote {out}/verlet_perf{suffix}.json")


def fault_tests(sim):
    """Retest the v5e faults on the current runtime."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from isokann_tpu.md.neighbor import (NeighborPlan, neighbor_sweep_pallas)

    s = sim.system
    x0 = np.asarray(sim.coords).reshape(-1, 3)

    def scan_probe(nwalk, plan, label):
        xb = jnp.asarray(np.tile(np.asarray(sim.coords)[None, :],
                                 (nwalk, 1)))

        def body(c, _):
            f = neighbor_sweep_pallas(s, plan, c)
            return c + 1e-6 * f, None

        try:
            t0 = time.time()
            out = jax.jit(lambda z: jax.lax.scan(body, z, None, length=3)[0])(xb)
            jax.block_until_ready(out)
            ok = bool(np.isfinite(np.asarray(out)).all())
            print(f"[fault] {label}: OK ({time.time() - t0:.0f}s, "
                  f"finite={ok})")
            return True
        except Exception as e:
            print(f"[fault] {label}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:140]})")
            return False

    plan = NeighborPlan(s, x0=x0)
    print(f"default plan: nc={plan.nc} C={plan.C} S={plan.S} "
          f"newton={plan.newton} div={plan.cell_div}")

    # (a) >4-walker batch inside lax.scan: lift the chunk guard and run
    # a genuinely unchunked B=8/B=16 kernel in a scan
    import isokann_tpu.md.neighbor as nbm
    scan_probe(4, plan, "4-walker in-scan (control)")
    old = nbm._SCAN_CHUNK
    try:
        nbm._SCAN_CHUNK = 64
        for nb_ in (8, 16):
            scan_probe(nb_, plan, f"UNCHUNKED {nb_}-walker in-scan")
    finally:
        nbm._SCAN_CHUNK = old

    # (b) tight margin / odd C geometry
    for margin, label in [(1.25, "margin 1.25"), (1.1, "margin 1.1")]:
        try:
            p2 = NeighborPlan(s, x0=x0, margin=margin)
            print(f"[fault] {label}: C={p2.C}", end=" ")
            scan_probe(4, p2, f"{label} (C={p2.C})")
        except Exception as e:
            print(f"[fault] {label} plan build failed: {e}")
    try:
        p3 = NeighborPlan(s, x0=x0, capacity=208, cell_div=1)
        scan_probe(4, p3, f"div=1 C={p3.C}")
    except Exception as e:
        print(f"[fault] C=208 probe failed early: {e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--fault-only", action="store_true")
    ap.add_argument("--perf-only", action="store_true")
    ap.add_argument("--prep-only", action="store_true")
    ap.add_argument("--verlet", action="store_true",
                    help="measure the Verlet-list mode vs the cell mode")
    ap.add_argument("--verlet-only", action="store_true",
                    help="measure ONLY the Verlet mode (fresh-process "
                         "mitigation for the v5e class-c fault; the cells "
                         "rate comes from a prior --cells-only run or "
                         "ISOKANN_CELLS_RATE)")
    ap.add_argument("--cells-only", action="store_true",
                    help="measure ONLY the cells mode and write "
                         "out/nb_perf/cells_perf.json (the fresh-process "
                         "baseline for a later --verlet-only run)")
    ap.add_argument("--walkers", type=int, default=4)
    ap.add_argument("--skin", type=float, default=0.2)
    ap.add_argument("--rebuild-every", type=int, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin hijacks "
                         "JAX_PLATFORMS, so the env var is NOT enough — "
                         "and a stray TPU claim collides with the single-"
                         "tenant device)")
    args = ap.parse_args()

    if args.prep_only or args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.verlet or args.verlet_only or args.cells_only:
        build(small=args.quick)      # ensure the fixture exists
        measure_verlet(nwalk=args.walkers, small=args.quick,
                       skin=args.skin, rebuild_every=args.rebuild_every,
                       verlet_only=("cells" if args.cells_only
                                    else args.verlet_only))
        return
    sim = build(small=args.quick)
    if args.prep_only:
        return
    if not args.fault_only:
        measure_propagate(sim, 4, label="baseline pallas")
        measure_sweep(sim, 4, label="pallas sweep")
        measure_sweep(sim, 4, label="xla sweep", use_pallas=False)
    if not args.perf_only:
        fault_tests(sim)


if __name__ == "__main__":
    main()
