"""Minimal repro for the two v5e Pallas neighbor-sweep faults, isolated
per-probe so one fault cannot wedge the rest of the retest.

Faults being tracked (see CLAUDE.md / ROADMAP.md item 7):
  (a) in-scan batch fault: `neighbor_sweep_pallas` inside `lax.scan`
      crashes the TPU worker for large walker batches.  Round-1: B>4
      faulted; round-2 retest: B=8 clean (guard raised), B=16 still
      faults.  Standalone (non-scan) calls are fine at any B.
  (b) block-geometry fault: some 3-D cell-grid geometries (per-cell
      capacity C~208-248) fault flakily; column plans run clean.

Each probe runs in a FRESH subprocess (a fault wedges the whole TPU
worker process) with a timeout; the parent never imports jax.  Results
land in out/v5e_faults.json — suitable for attaching to an upstream
report and for re-running in minutes after any runtime update.

Usage:
  python tools/repro_v5e_faults.py            # full retest (7.7k atoms)
  python tools/repro_v5e_faults.py --small    # ~2k-atom quick variant
  python tools/repro_v5e_faults.py --timeout 1200

The TPU is single-tenant: do not run this while another TPU process is
alive.  Probe order is safest-first; expected current outcome:
control_b4 PASS, unchunked_b8 PASS, unchunked_b16 FAULT, geom_c208
FAULT-or-PASS (flaky).
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PROBES = ["control_b4", "unchunked_b8", "unchunked_b16", "geom_c208"]

# GB/dense-path large-batch fault (round-4: the trp-cage lag sweep's
# 1024-walker OBC2 propagate crashed the TPU worker at 02:02 UTC
# 2026-08-19 while the pilot's own 800-walker bootstrap ran clean).
# Probes call the exact propagate program at fixed walker counts.
GB_PROBES = ["gb_b512", "gb_b800", "gb_b1024", "gb_b1024_long"]

# Verlet-mode worker crash (round-4 tail: verletperf2-6 logs): the
# chunked langevin_middle_verlet program crashes the worker at its
# SMALLEST size (2 walkers x ~R steps, fresh process), so the fault is
# the program content, not cumulative work.  Bisect, safest-first:
# build alone, mapped build, one force eval, the step scan with FIXED
# lists, one build+scan block, then the full entry point that crashed.
VERLET_PROBES = ["v_build1", "v_buildmap", "v_force",
                 "v_scan_fixedlists", "v_block", "v_full"]


# ------------------------------------------------------------------ child
def run_probe(name: str, pdb: str):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import isokann_tpu as itk
    import isokann_tpu.md.neighbor as nbm
    from isokann_tpu.md.neighbor import NeighborPlan, neighbor_sweep_pallas

    print(f"probe {name}: devices={jax.devices()}", flush=True)
    if name.startswith("gb_"):
        B, nsteps = {"gb_b512": (512, 100), "gb_b800": (800, 100),
                     "gb_b1024": (1024, 100),
                     "gb_b1024_long": (1024, 2500)}[name]
        sim = itk.MDSimulation(pdb=pdb, implicit="obc2", steps=nsteps)
        print(f"system: {sim.natoms} atoms OBC2 dense, B={B} "
              f"nsteps={nsteps}", flush=True)
        xb = jnp.asarray(np.tile(np.asarray(sim.coords).reshape(1, -1),
                                 (B, 1)), jnp.float32)
        t0 = time.time()
        out = sim._propagate_fn(B, nsteps, False)(xb, jax.random.PRNGKey(0))
        jax.block_until_ready(out)
        fin = bool(np.isfinite(np.asarray(out)).all())
        print(f"probe {name}: completed in {time.time() - t0:.0f}s "
              f"finite={fin}", flush=True)
        print("PROBE PASS" if fin else "PROBE NONFINITE", flush=True)
        sys.exit(0 if fin else 3)
    sim = itk.MDSimulation(pdb=pdb, addwater=True, padding=1.0,
                           steps=10, dense_pairs=False)
    s = sim.system
    x0 = np.asarray(sim.coords).reshape(-1, 3)
    print(f"system: {sim.natoms} atoms, box {np.asarray(s.box)}",
          flush=True)

    if name.startswith("v_"):
        from isokann_tpu.md import integrators as I
        from isokann_tpu.md.verlet import (
            VerletPlan, build_lists, force_verlet, langevin_middle_verlet)

        vp = VerletPlan(s, x0=x0, skin=0.2)
        R = int(vp.rebuild_every)
        W = 2
        print(f"verlet plan: K={vp.K} rebuild_every={R} rv={vp.rv:.3f} "
              f"W={W}", flush=True)
        xb = jnp.asarray(np.tile(x0.reshape(1, -1), (W, 1)), jnp.float32)
        xw = xb.reshape(W, -1, 3)
        key = jax.random.PRNGKey(0)
        masses3 = jnp.asarray(np.repeat(np.asarray(s.masses), 3),
                              jnp.float32)
        T, gamma, dt = 310.0, 1.0, float(sim.step)
        t0 = time.time()
        if name == "v_build1":
            lists, nov = jax.jit(
                lambda x: build_lists(vp, s, x))(xw[0])
            out = lists
        elif name == "v_buildmap":
            out, nov = jax.jit(lambda xs: jax.lax.map(
                lambda x: build_lists(vp, s, x), xs))(xw)
        elif name == "v_force":
            lists, _ = jax.jit(lambda xs: jax.lax.map(
                lambda x: build_lists(vp, s, x), xs))(xw)
            jax.block_until_ready(lists)
            out = jax.jit(jax.vmap(
                lambda xi, li: force_verlet(s, xi, li)))(xw, lists)
        elif name == "v_scan_fixedlists":
            lists, _ = jax.jit(lambda xs: jax.lax.map(
                lambda x: build_lists(vp, s, x), xs))(xw)
            jax.block_until_ready(lists)
            v0 = jnp.zeros_like(xb)

            def step(c, k):
                x, v = c
                f = lambda xf: jax.vmap(
                    lambda xi, li: force_verlet(s, xi.reshape(-1, 3), li)
                    .reshape(-1))(xf, lists)
                return I.langevin_middle_step(
                    f, x, v, masses3, T, gamma, dt, k), None

            def prog(x, v, key):
                ks = jax.random.split(key, R)
                return jax.lax.scan(step, (x, v), ks)[0][0]

            out = jax.jit(prog)(xb, v0, key)
        elif name == "v_block":
            v0 = jnp.zeros_like(xb)
            out = jax.jit(
                lambda x, v, k: langevin_middle_verlet(
                    s, vp, x, v, masses3, T, gamma, dt, R, k)[0]
            )(xb, v0, key)
        elif name == "v_full":
            v0 = jnp.zeros_like(xb)
            nsteps = 2 * R + R // 2       # blocks scan + remainder block
            out = jax.jit(
                lambda x, v, k: langevin_middle_verlet(
                    s, vp, x, v, masses3, T, gamma, dt, nsteps, k)[0]
            )(xb, v0, key)
        jax.block_until_ready(out)
        fin = bool(np.isfinite(
            np.asarray(out, dtype=np.float64)).all())
        print(f"probe {name}: completed in {time.time() - t0:.0f}s "
              f"finite={fin}", flush=True)
        print("PROBE PASS" if fin else "PROBE NONFINITE", flush=True)
        sys.exit(0 if fin else 3)

    if name == "geom_c208":
        plan = NeighborPlan(s, x0=x0, capacity=208, cell_div=1)
        nwalk = 4
    else:
        plan = NeighborPlan(s, x0=x0)
        nwalk = {"control_b4": 4, "unchunked_b8": 8,
                 "unchunked_b16": 16}[name]
        if name.startswith("unchunked"):
            nbm._SCAN_CHUNK = 64          # lift the guard: raw kernel batch
    print(f"plan: ncells={plan.ncells} C={plan.C} S={plan.S} "
          f"newton={plan.newton} B={nwalk}", flush=True)

    xb = jnp.asarray(np.tile(x0.reshape(1, -1), (nwalk, 1)), jnp.float32)

    def body(c, _):
        return c + 1e-6 * neighbor_sweep_pallas(s, plan, c), None

    t0 = time.time()
    out = jax.jit(lambda z: jax.lax.scan(body, z, None, length=3)[0])(xb)
    jax.block_until_ready(out)
    fin = bool(np.isfinite(np.asarray(out)).all())
    print(f"probe {name}: completed in {time.time() - t0:.0f}s "
          f"finite={fin}", flush=True)
    if not fin:
        print("PROBE NONFINITE", flush=True)
        sys.exit(3)
    print("PROBE PASS", flush=True)


# ----------------------------------------------------------------- parent
def prep_fixture(small: bool) -> str:
    """Build the peptide PDB on the CPU backend (a subprocess, so the
    parent stays jax-free and the TPU claim is untouched)."""
    out = os.path.join(ROOT, "out", "nb_perf")
    os.makedirs(out, exist_ok=True)
    seq = "AQGS" if small else "AQGSAELAKVM"
    pdb = os.path.join(out, "peptide_small.pdb" if small else "peptide.pdb")
    if os.path.exists(pdb):
        return pdb
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        f"import sys; sys.path.insert(0, {ROOT!r})\n"
        "from isokann_tpu.md.fixtures import peptide_pdb\n"
        f"peptide_pdb({seq!r}, {pdb!r}, minimize=True, maxiter="
        f"{150 if small else 300})\n")
    print(f"prep: building {pdb} (CPU subprocess)...", flush=True)
    subprocess.run([sys.executable, "-u", "-c", code], check=True,
                   timeout=1800)
    return pdb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", choices=PROBES + GB_PROBES + VERLET_PROBES,
                    help="(internal) run one probe in this process")
    ap.add_argument("--pdb", help="(internal) fixture path")
    ap.add_argument("--small", action="store_true",
                    help="~2k-atom quick variant")
    ap.add_argument("--verlet", action="store_true",
                    help="bisect the Verlet-mode worker crash "
                         "(langevin_middle_verlet, round-4 verletperf "
                         "logs); results land in out/v5e_faults_verlet"
                         ".json")
    ap.add_argument("--gb", action="store_true",
                    help="run the GB/dense-path large-batch probes "
                         "(trp-cage OBC2) instead of the neighbor-sweep "
                         "set; results land in out/v5e_faults_gb.json")
    ap.add_argument("--timeout", type=float, default=900.0,
                    help="per-probe wall-clock limit (compiles through "
                         "the tunnel can take minutes)")
    args = ap.parse_args()

    if args.probe:
        run_probe(args.probe, args.pdb)
        return

    if args.verlet:
        probes = VERLET_PROBES
        pdb = prep_fixture(args.small)
    elif args.gb:
        probes = GB_PROBES
        pdb = os.path.join(ROOT, "out", "trpcage.pdb")
        if not os.path.exists(pdb):
            code = (
                "import jax; jax.config.update('jax_platforms','cpu')\n"
                f"import sys; sys.path.insert(0, {ROOT!r})\n"
                "from isokann_tpu.md.fixtures import peptide_pdb\n"
                "peptide_pdb('NLYIQWLKDGGPSSGRPPPS', "
                f"{pdb!r}, minimize=True, implicit='obc2', maxiter=1500)\n")
            print(f"prep: building {pdb} (CPU subprocess)...", flush=True)
            subprocess.run([sys.executable, "-u", "-c", code], check=True,
                           timeout=1800)
    else:
        probes = PROBES
        pdb = prep_fixture(args.small)
    results = {}
    for name in probes:
        print(f"\n=== {name} ===", flush=True)
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-u", __file__, "--probe", name,
                 "--pdb", pdb],
                capture_output=True, text=True, timeout=args.timeout)
            dt = time.time() - t0
            tail = (r.stdout + r.stderr).strip().splitlines()[-12:]
            status = ("PASS" if r.returncode == 0
                      and "PROBE PASS" in r.stdout else "FAULT")
            print("\n".join(tail), flush=True)
        except subprocess.TimeoutExpired as e:
            dt = time.time() - t0
            tail = ((e.stdout or "") + (e.stderr or "")
                    ).strip().splitlines()[-12:]
            status = "TIMEOUT"
            print("\n".join(tail), flush=True)
        results[name] = {"status": status, "seconds": round(dt, 1),
                         "tail": tail[-4:]}
        print(f"--> {name}: {status} ({dt:.0f}s)", flush=True)

    results["_meta"] = {"small": args.small, "pdb": pdb,
                        "timeout": args.timeout,
                        "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    path = os.path.join(
        ROOT, "out",
        "v5e_faults_verlet.json" if args.verlet
        else "v5e_faults_gb.json" if args.gb else "v5e_faults.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwrote {path}")
    for name in probes:
        print(f"  {name:16s} {results[name]['status']}")


if __name__ == "__main__":
    main()
