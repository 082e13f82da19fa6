"""Chi-correlation acceptance against actual reference output.

The BASELINE.md acceptance metric — |corr(chi_ours, chi_reference)| >=
0.99 on the same coordinates — cannot be computed in this environment
(no Julia/OpenMM to produce reference output; the committed Ulam/MSM
golden anchors stand in, ``out/golden_md.json``).  This tool is the
ready-to-run protocol for the moment a reference dump exists.

Reference-side export (Julia, reference quickstart README.md:27-37):

    using ISOKANN, JLD2, NPZ
    iso = Iso(OpenMMSimulation(), nx=100, nk=5)
    run!(iso, 500)
    xs = iso.data.coords[1]                 # (dim, n) coordinates [nm]
    npzwrite("ref_chi.npz", Dict(
        "coords" => permutedims(xs),        # -> (n, dim), batch-leading
        "chi"    => vec(chis(iso))))

Then here:

    python tools/chi_acceptance.py ref_chi.npz            # trains ours
    python tools/chi_acceptance.py ref_chi.npz --iso my.pkl

Writes out/chi_acceptance.json; exits 1 if |corr| < 0.99.
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ACCEPT = 0.99


def correlate(chi_ours, chi_ref):
    import numpy as np
    a = np.asarray(chi_ours, np.float64).ravel()
    b = np.asarray(chi_ref, np.float64).ravel()
    if a.std() == 0 or b.std() == 0:
        return 0.0
    return float(abs(np.corrcoef(a, b)[0, 1]))


def main(ref_path, iso_path=None, train_iters=500, pdb=None, out=None):
    import numpy as np
    import isokann_tpu as itk

    ref = np.load(ref_path)
    coords = np.asarray(ref["coords"], np.float32)
    chi_ref = np.asarray(ref["chi"], np.float64).ravel()
    assert coords.shape[0] == len(chi_ref), (coords.shape, chi_ref.shape)

    if iso_path is not None:
        iso = itk.load(iso_path)
    else:
        sim = itk.MDSimulation(pdb=pdb) if pdb else itk.MDSimulation()
        iso = itk.Iso(sim=sim, nx=100, nk=5, key=0,
                      opt=itk.AdamRegularized())
        iso.run(train_iters)

    chi_ours = np.asarray(iso.chicoords(coords)).ravel()
    corr = correlate(chi_ours, chi_ref)

    res = dict(ref=os.path.abspath(ref_path), n=len(chi_ref),
               corr=corr, accept_threshold=ACCEPT,
               accepted=bool(corr >= ACCEPT))
    out = out or os.path.join(ROOT, "out", "chi_acceptance.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    json.dump(res, open(out, "w"), indent=1)
    print(json.dumps(res, indent=1))
    return 0 if res["accepted"] else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("ref", help="npz with coords (n, dim) [nm] and chi (n,)")
    ap.add_argument("--iso", default=None, help="trained iso pickle")
    ap.add_argument("--train-iters", type=int, default=500)
    ap.add_argument("--pdb", default=None)
    args = ap.parse_args()
    sys.exit(main(args.ref, iso_path=args.iso,
                  train_iters=args.train_iters, pdb=args.pdb))
