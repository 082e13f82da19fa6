"""Ligand-charge fidelity quantification (VERDICT r2 weak: ligand charges).

The built-in perception pipeline assigns Gasteiger (PEOE) charges; the
reference's ligands get openmmforcefields GAFF templates with
AM1-BCC/MMFF94-class charges (``src/simulators/mopenmm.py:30-50``).  No
AM1-BCC implementation exists in this environment, so the builtin
path's error is quantified two ways:

1. **Methanol anchor** (exact): the test fixture mol2 carries the
   published AM1-BCC methanol charges; the Gasteiger-vs-AM1-BCC
   per-atom |dq| and the per-term energy difference of the two charge
   sets on the same geometry are computed exactly.

2. **6O0K sensitivity study** (bound): per-atom charge perturbations of
   AM1-BCC-vs-Gasteiger-typical size (sigma 0.10 e on N/O/S + polar H,
   0.03 e on C + nonpolar H, net charge preserved) are sampled K times;
   the induced spread of (a) the intra-ligand Coulomb energy and (b)
   the ligand<->protein Coulomb interaction energy brackets the energy
   error the builtin charges can carry on the reference's own system.

Writes out/ligand_fidelity.json; the table in docs/ligand_fidelity.md
is generated from it.  Runs on CPU (small systems, host math for the
interaction sums).

Usage: python -u tools/ligand_charge_fidelity.py
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REF_LIG = "/root/reference/data/chris/6O0K_ligand-only.pdb"
REF_FULL = "/root/reference/data/chris/6O0K_full.pdb"

KE = 138.935458          # kJ mol^-1 nm e^-2  (1/(4 pi eps0))

# published AM1-BCC methanol charges (same set as the import-test mol2)
MOH_AM1BCC = {"C1": 0.0900, "O1": -0.5988, "H1": 0.0372, "H2": 0.0372,
              "H3": 0.0372, "H4": 0.3972}
MOH_XYZ_A = {"C1": (0.000, 0.000, 0.000), "O1": (1.410, 0.000, 0.000),
             "H1": (-0.360, 1.030, 0.000), "H2": (-0.360, -0.520, 0.890),
             "H3": (-0.360, -0.520, -0.890), "H4": (1.730, 0.890, 0.000)}


def coulomb_intra(q, xyz_nm, bonds):
    """Plain 1-4-excluded... no: FULL intra Coulomb sum minus 1-2/1-3
    exclusions, 0.8333 scaling on 1-4 (Amber convention)."""
    import numpy as np

    n = len(q)
    adj = {i: set() for i in range(n)}
    for a, b in bonds:
        adj[a].add(b)
        adj[b].add(a)
    # bonded distance <= 3 classification
    scale = np.ones((n, n))
    for i in range(n):
        for j in adj[i]:
            scale[i, j] = 0.0
            for k in adj[j]:
                if k != i:
                    scale[i, k] = 0.0
                    for l in adj[k]:
                        if l not in (i, j) and scale[i, l] == 1.0:
                            scale[i, l] = 1.0 / 1.2
    scale = np.minimum(scale, scale.T)
    d = np.linalg.norm(xyz_nm[:, None, :] - xyz_nm[None, :, :], axis=-1)
    np.fill_diagonal(d, 1.0)
    iu = np.triu_indices(n, 1)
    return float(KE * np.sum(scale[iu] * q[iu[0]] * q[iu[1]] / d[iu]))


def methanol_anchor():
    import numpy as np
    from isokann_tpu.md.ligand import gasteiger_charges, perceive

    names = list(MOH_AM1BCC)
    els = ["C", "O", "H", "H", "H", "H"]
    xyz = np.array([MOH_XYZ_A[n] for n in names]) / 10.0
    perc = perceive(els, xyz)
    qg = gasteiger_charges(perc.elements, perc.bonds, perc.hybrid,
                           perc.formal)
    qa = np.array([MOH_AM1BCC[n] for n in names])
    dq = qg - qa
    e_g = coulomb_intra(qg, xyz, perc.bonds)
    e_a = coulomb_intra(qa, xyz, perc.bonds)
    # dipole (e nm -> Debye)
    mu = lambda q: float(np.linalg.norm((q[:, None] * xyz).sum(0))) * 48.0329
    return dict(
        atoms=names,
        q_gasteiger=np.round(qg, 4).tolist(),
        q_am1bcc=qa.tolist(),
        abs_dq_mean=float(np.abs(dq).mean()),
        abs_dq_max=float(np.abs(dq).max()),
        e_coul_intra_gasteiger_kj=e_g,
        e_coul_intra_am1bcc_kj=e_a,
        e_coul_intra_diff_kj=abs(e_g - e_a),
        dipole_gasteiger_D=mu(qg),
        dipole_am1bcc_D=mu(qa),
    )


def sixo0k_sensitivity(K=64, seed=0):
    import numpy as np
    from isokann_tpu.md.ligand import parameterize_ligand
    from isokann_tpu.md.pdbio import read_pdb

    tmpl, lig = parameterize_ligand("LBM", REF_LIG, residue_filter="LBM")
    names = lig.atom_names
    q0 = np.array([tmpl["atoms"][n][1] for n in names])
    els = lig.elements
    xyz = np.asarray(lig.coords)
    bonds = [(names.index(a), names.index(b)) for a, b in tmpl["bonds"]]

    # protein environment from the full complex (ligand excluded)
    inter = None
    if os.path.exists(REF_FULL):
        full = read_pdb(REF_FULL)
        psel = [i for i in range(full.natoms)
                if full.res_names[i] != "LBM"
                and full.res_names[i] != "HOH"]
        from isokann_tpu.md import amber
        # per-atom protein charges via template lookup where possible;
        # unknown -> 0 (conservative: only bounds the known part)
        pq, pxyz = [], []
        for i in psel:
            rn, an = full.res_names[i], full.atom_names[i]
            t = amber.RESIDUES.get(rn, {}).get("atoms", {}).get(an)
            if t is not None:
                pq.append(t[1])
                pxyz.append(full.coords[i])
        pq = np.array(pq)
        pxyz = np.asarray(pxyz)
        d = np.linalg.norm(xyz[:, None, :] - pxyz[None, :, :], axis=-1)
        d = np.maximum(d, 0.05)
        ew = KE * (pq[None, :] / d)            # (nlig, nprot) kernel
        g = ew.sum(axis=1)                     # dE_inter/dq_i
        inter = dict(n_protein_charges=int(len(pq)),
                     e_inter_coul_kj=float(np.dot(q0, g)))

    # perturbation ensemble
    rng = np.random.default_rng(seed)
    sigma = np.array([0.10 if e in ("N", "O", "S") else 0.03 for e in els])
    # polar hydrogens (bonded to N/O/S)
    for a, b in bonds:
        if els[a] == "H" and els[b] in ("N", "O", "S"):
            sigma[a] = 0.10
        if els[b] == "H" and els[a] in ("N", "O", "S"):
            sigma[b] = 0.10
    e_intra0 = coulomb_intra(q0, xyz, bonds)
    d_intra, d_inter = [], []
    for _ in range(K):
        dq = rng.normal(0.0, sigma)
        dq -= dq.mean()                        # preserve net charge
        d_intra.append(coulomb_intra(q0 + dq, xyz, bonds) - e_intra0)
        if inter is not None:
            d_inter.append(float(np.dot(dq, g)))
    out = dict(
        natoms=len(names),
        net_charge=float(q0.sum()),
        sigma_polar=0.10, sigma_apolar=0.03, K=K,
        e_coul_intra_kj=e_intra0,
        intra_spread_kj=dict(
            std=float(np.std(d_intra)),
            p95_abs=float(np.percentile(np.abs(d_intra), 95))),
    )
    if inter is not None:
        out["inter"] = inter
        out["inter_spread_kj"] = dict(
            std=float(np.std(d_inter)),
            p95_abs=float(np.percentile(np.abs(d_inter), 95)))
    return out


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    res = dict(methanol_anchor=methanol_anchor())
    if os.path.exists(REF_LIG):
        res["sixo0k_sensitivity"] = sixo0k_sensitivity()
    os.makedirs(os.path.join(ROOT, "out"), exist_ok=True)
    json.dump(res, open(os.path.join(ROOT, "out",
                                     "ligand_fidelity.json"), "w"),
              indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
