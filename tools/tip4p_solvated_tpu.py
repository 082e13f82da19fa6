"""TIP4P-Ew solvated validation on the O(n) neighbor path (TPU).

Exercises the round-2 additions together at production scale: 4-site
water (virtual M sites placed/redistributed around the Pallas sweep),
stride-4 rigid-water constraints, PME electrostatics, and the neighbor
engine — and compares throughput against the TIP3P equivalent.

Usage:
  JAX_PLATFORMS=cpu python tools/tip4p_solvated_tpu.py --prep-only
  python -u tools/tip4p_solvated_tpu.py          # TPU measurement
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OUT = os.path.join(ROOT, "out", "tip4p_solvated")


def build(model, quick=False):
    import isokann_tpu as itk
    from isokann_tpu.md.fixtures import peptide_pdb

    os.makedirs(OUT, exist_ok=True)
    pdb = f"{OUT}/peptide.pdb"
    if not os.path.exists(pdb):
        peptide_pdb("AQGSAELAKVM", pdb, minimize=True, maxiter=300)
    sim = itk.MDSimulation(pdb=pdb, addwater=True, water_model=model,
                           padding=0.55 if quick else 0.85,
                           steps=100, method="PME", dense_pairs=False)
    cs = sim.constraint_set
    print(f"{model}: {sim.natoms} atoms, box {sim.system.box}, "
          f"vsites {int(sim.system.vs_idx.shape[0]) if sim.system.vs_idx is not None else 0}, "
          f"rigid waters {cs.nwater} (stride {cs.wstride}, "
          f"generic {cs.ngeneric})", flush=True)
    return sim


def measure(sim, nwalk=4, steps=100):
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
    yl = np.asarray(ys).reshape(nwalk, -1, 3)
    fin = bool(np.isfinite(yl).all())

    checks = {}
    # rigid O-H after 400 steps
    from isokann_tpu.md.solvate import water_triplets, R_OH, M_WEIGHTS
    trip = water_triplets(sim.structure)
    d = np.linalg.norm(yl[:, trip[:, 0]] - yl[:, trip[:, 1]], axis=-1)
    checks["oh_max_err"] = float(np.abs(d - R_OH).max())
    if sim.system.vs_idx is not None and sim.system.vs_idx.shape[0]:
        vs = np.asarray(sim.system.vs_idx)
        par = np.asarray(sim.system.vs_gather)[vs]
        w = M_WEIGHTS
        err = 0.0
        for f in yl:
            want = (w[0] * f[par[:, 0]] + w[1] * f[par[:, 1]]
                    + w[2] * f[par[:, 2]])
            err = max(err, float(np.abs(f[vs] - want).max()))
        checks["m_placement_err"] = err
    e = float(sim.potential(yl[0].reshape(-1)))
    checks["energy_final"] = e
    rate = steps * nwalk / dt
    per_walker = steps / dt
    print(f"  compile+first {t_compile:.1f}s; steady {dt:.2f}s per "
          f"{nwalk}x{steps} steps = {rate:.0f} walker-steps/s "
          f"({per_walker:.0f} steps/s/walker); finite={fin}; {checks}",
          flush=True)
    return dict(natoms=sim.natoms, nwalk=nwalk, steps=steps,
                compile_s=t_compile, steady_s=dt,
                walker_steps_per_s=rate, steps_per_s_per_walker=per_walker,
                finite=fin, **checks)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prep-only", action="store_true")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.prep_only:
        import jax
        jax.config.update("jax_platforms", "cpu")
        build("tip4pew", quick=args.quick)
        build("tip3p", quick=args.quick)
        print("prep done")
        return
    results = {}
    for model in ("tip4pew", "tip3p"):
        sim = build(model, quick=args.quick)
        results[model] = measure(sim, nwalk=4,
                                 steps=20 if args.quick else 100)
        del sim
    with open(f"{OUT}/results.json", "w") as f:
        json.dump(results, f, indent=1)
    r4, r3 = results["tip4pew"], results["tip3p"]
    print(json.dumps({
        "tip4pew_steps_per_s_per_walker": r4["steps_per_s_per_walker"],
        "tip3p_steps_per_s_per_walker": r3["steps_per_s_per_walker"],
        "relative_cost": r3["steps_per_s_per_walker"]
        / max(r4["steps_per_s_per_walker"], 1e-9)}))


if __name__ == "__main__":
    main()
