"""MDSystem: force-field parameters as a JAX pytree + system builder.

Bridges topology (host) to the batched device force kernels (forces.py).
Unit conventions follow OpenMM: nm, kJ/mol, ps, amu, elementary charges.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import amber
from .pdbio import PDBStructure, read_pdb
from .topology import Topology, build_topology

KCAL = 4.184                    # kJ per kcal
COULOMB = 138.935456            # kJ mol^-1 nm e^-2  (OpenMM ONE_4PI_EPS0)
KB = 0.00831446261815324        # kJ/mol/K


@jax.tree_util.register_pytree_node_class
@dataclass
class MDSystem:
    """All per-system parameter arrays needed by the force kernels."""

    # bonded.  Index arrays are kept for inspection; the force kernels use
    # the *incidence matrices* below — dense (nterms, natoms) +/-1 selection
    # matrices so that difference vectors are matmuls (MXU) instead of
    # gathers, whose scatter-based VJPs are poison for the TPU compiler.
    bond_idx: jnp.ndarray       # (nb, 2) int32
    bond_k: jnp.ndarray         # (nb,) kJ/mol/nm^2  (E = k (r-r0)^2)
    bond_r0: jnp.ndarray        # (nb,) nm
    angle_idx: jnp.ndarray      # (na, 3)
    angle_k: jnp.ndarray        # (na,) kJ/mol/rad^2
    angle_t0: jnp.ndarray       # (na,) rad
    dih_idx: jnp.ndarray        # (nd, 4)  (one row per torsion *term*)
    dih_pk: jnp.ndarray         # (nd,) kJ/mol
    dih_phase: jnp.ndarray      # (nd,) rad
    dih_n: jnp.ndarray          # (nd,) float periodicity
    # incidence matrices (difference operators)
    bond_D: jnp.ndarray         # (nb, natoms): row = e_i - e_j
    angle_U: jnp.ndarray        # (na, natoms): a - b
    angle_V: jnp.ndarray        # (na, natoms): c - b
    dih_B1: jnp.ndarray         # (nd, natoms): p1 - p0
    dih_B2: jnp.ndarray         # (nd, natoms): p2 - p1
    dih_B3: jnp.ndarray         # (nd, natoms): p3 - p2
    # nonbonded
    charges: jnp.ndarray        # (n,)
    rmin_half: jnp.ndarray      # (n,) nm
    eps: jnp.ndarray            # (n,) kJ/mol
    qq_scale: jnp.ndarray       # (n, n) Coulomb pair scale (0 excl, scee 1-4, 1)
    lj_scale: jnp.ndarray       # (n, n)
    masses: jnp.ndarray         # (n,) amu
    # implicit solvent (OBC2); zero-size arrays when disabled
    gb_radii: jnp.ndarray = None     # (n,) intrinsic Born radii [nm]
    gb_scales: jnp.ndarray = None    # (n,) OBC scale factors
    # sparse exception pairs (the scalable counterpart of qq/lj_scale;
    # consumed by the neighbor-list engine, md/neighbor.py)
    excl_idx: jnp.ndarray = None     # (m, 2) int32, i<j
    excl_qq: jnp.ndarray = None      # (m,) target Coulomb scale
    excl_lj: jnp.ndarray = None      # (m,) target LJ scale
    # Ewald reciprocal-space tables (method="Ewald"/"PME"; zero-size
    # otherwise).  See md/ewald.py — structure-factor matmul formulation.
    ewald_kvecs: jnp.ndarray = None   # (nk, 3) [1/nm]
    ewald_coefs: jnp.ndarray = None   # (nk,) [kJ/mol per |S|^2]
    # LJPME (method="LJPME"): dispersion handled by the same k-vector list
    q6: jnp.ndarray = None            # (n,) sqrt(c6_ii) geometric amplitudes
    ljpme_coefs: jnp.ndarray = None   # (nk,) signed: -h^(k)/(2V)
    # virtual sites (massless interaction sites, e.g. the TIP4P-Ew M
    # site): all-gather placement / force-redistribution tables built by
    # ``md/vsites.py:attach_vsites`` — scatter-free by construction.
    # Zero-size (or None on old pickles) when the system has none.
    vs_idx: jnp.ndarray = None        # (nv,) int32 site atom indices
    vs_gather: jnp.ndarray = None     # (n, 3) int32 parent (or self) idx
    vs_w: jnp.ndarray = None          # (n, 3) placement weights
    vs_rev: jnp.ndarray = None        # (n, kmax) int32 owning-site idx
    vs_rev_w: jnp.ndarray = None      # (n, kmax) redistribution weights
    # out-of-plane sites only (zero-size otherwise): cross-term weight
    # per atom [1/nm] and the parent-slot of each reverse entry (1/2/3)
    vs_wc: jnp.ndarray = None         # (n,) or (0,)
    vs_rev_slot: jnp.ndarray = None   # (n, kmax) int32 or (0, 0)
    # CMAP torsion-torsion correction maps (ff19SB / CHARMM class;
    # md/cmap.py).  Zero-size (or None on old pickles) when absent.
    cmap_idx: jnp.ndarray = None      # (nc, 8) int32 two torsion quads
    cmap_type: jnp.ndarray = None     # (nc,) int32 map index
    cmap_coefs: jnp.ndarray = None    # (nt, R, R, 4, 4) bicubic patches
    # nonbonded method (static)
    method: str = "CutoffPeriodic"
    cutoff: float = 1.0         # nm
    eps_rf: float = 78.5        # reaction-field dielectric
    box: Optional[tuple] = None  # (3,) nm box lengths, or None
    implicit: Optional[str] = None   # None or "obc2"
    # False for large systems: the dense (n, n) scale matrices and the
    # (nterms, n) incidence matrices are left empty and every force/energy
    # call routes through the O(n) neighbor-list engine
    dense_pairs: bool = True
    ewald_alpha: float = 0.0    # splitting parameter [1/nm] (static)
    # isotropic long-range LJ tail correction (OpenMM's
    # useDispersionCorrection, on by default for periodic methods).
    # Coordinate-independent but volume-dependent: E(V) = 2 pi / V *
    # (S12 / 9 rc^9 - S6 / 3 rc^3), so it contributes NPT virial only.
    use_dispersion: bool = False
    disp_c6sum: float = 0.0     # sum_ij 2 eps_ij rmin_ij^6  [kJ/mol nm^6]
    disp_c12sum: float = 0.0    # sum_ij  eps_ij rmin_ij^12  [kJ/mol nm^12]
    ljpme_beta: float = 0.0     # dispersion splitting parameter [1/nm]

    def tree_flatten(self):
        children = (self.bond_idx, self.bond_k, self.bond_r0,
                    self.angle_idx, self.angle_k, self.angle_t0,
                    self.dih_idx, self.dih_pk, self.dih_phase, self.dih_n,
                    self.bond_D, self.angle_U, self.angle_V,
                    self.dih_B1, self.dih_B2, self.dih_B3,
                    self.charges, self.rmin_half, self.eps,
                    self.qq_scale, self.lj_scale, self.masses,
                    self.gb_radii, self.gb_scales,
                    self.excl_idx, self.excl_qq, self.excl_lj,
                    self.ewald_kvecs, self.ewald_coefs,
                    self.q6, self.ljpme_coefs,
                    self.vs_idx, self.vs_gather, self.vs_w,
                    self.vs_rev, self.vs_rev_w,
                    self.vs_wc, self.vs_rev_slot,
                    self.cmap_idx, self.cmap_type, self.cmap_coefs)
        aux = (self.method, self.cutoff, self.eps_rf, self.box, self.implicit,
               self.dense_pairs, self.ewald_alpha,
               self.use_dispersion, self.disp_c6sum, self.disp_c12sum,
               self.ljpme_beta)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, method=aux[0], cutoff=aux[1], eps_rf=aux[2],
                   box=aux[3], implicit=aux[4], dense_pairs=aux[5],
                   ewald_alpha=aux[6], use_dispersion=aux[7],
                   disp_c6sum=aux[8], disp_c12sum=aux[9],
                   ljpme_beta=aux[10])

    @property
    def natoms(self):
        return self.charges.shape[0]

    @property
    def dim(self):
        return 3 * self.natoms


def sparse_exclusions(top: Topology, scee: float, scnb: float):
    """Sparse exception list: (idx (m, 2) i<j, qq_w (m,), lj_w (m,)) with the
    *target* pair scales (0 for 1-2/1-3, scee/scnb for 1-4).  O(n * degree)
    — the scalable counterpart of the dense ``_exclusion_scales`` matrices
    (an exception pair that is both 1-4 and 1-2/1-3 resolves to the stronger
    exclusion, as in Amber)."""
    adj = top.neighbors()
    w = {}
    for (i, j, k, l) in top.propers:
        if i != l:
            w[(min(i, l), max(i, l))] = (scee, scnb)
    for a in range(top.natoms):
        for b in adj[a]:
            w[(min(a, b), max(a, b))] = (0.0, 0.0)
            for c in adj[b]:
                if c != a:
                    w[(min(a, c), max(a, c))] = (0.0, 0.0)
    items = sorted(w.items())
    idx = np.asarray([p for p, _ in items], np.int32).reshape(-1, 2)
    qq_w = np.asarray([v[0] for _, v in items])
    lj_w = np.asarray([v[1] for _, v in items])
    return idx, qq_w, lj_w


def _exclusion_scales(top: Topology, scee: float, scnb: float):
    """Dense (n, n) pair-scale matrices: 0 for 1-2/1-3, scee/scnb for 1-4,
    1 elsewhere, 0 diagonal."""
    n = top.natoms
    adj = top.neighbors()
    qq = np.ones((n, n))
    lj = np.ones((n, n))
    np.fill_diagonal(qq, 0.0)
    np.fill_diagonal(lj, 0.0)

    # 1-4 first, then 1-2/1-3 override (an atom pair can be both 1-4 and 1-3
    # in rings; the stronger exclusion wins, as in Amber)
    for (i, j, k, l) in top.propers:
        if i != l:
            qq[i, l] = qq[l, i] = scee
            lj[i, l] = lj[l, i] = scnb
    for a in range(n):
        for b in adj[a]:
            qq[a, b] = qq[b, a] = 0.0
            lj[a, b] = lj[b, a] = 0.0
            for c in adj[b]:
                if c != a:
                    qq[a, c] = qq[c, a] = 0.0
                    lj[a, c] = lj[c, a] = 0.0
    return qq, lj


# OBC2 intrinsic radii [nm] and scale factors by element (OpenMM defaults)
_GB_RADII = {"H": 0.12, "C": 0.17, "N": 0.155, "O": 0.15, "F": 0.15,
             "P": 0.185, "S": 0.18}
_GB_SCALES = {"H": 0.85, "C": 0.72, "N": 0.79, "O": 0.85, "F": 0.88,
              "P": 0.86, "S": 0.96}


def _gb_params(top: Topology):
    radii = np.empty(top.natoms)
    scales = np.empty(top.natoms)
    adj = top.neighbors()
    for i, t in enumerate(top.atom_types):
        el = "H" if t.startswith("H") else t[0]
        r = _GB_RADII.get(el, 0.15)
        if el == "H":
            # mbondi-style: H on N gets 0.13
            for j in adj[i]:
                if top.atom_types[j].startswith("N"):
                    r = 0.13
                    break
        radii[i] = r
        scales[i] = _GB_SCALES.get(el, 0.8)
    return radii, scales


DENSE_PAIRS_MAX = 4000   # above this, build_system(dense_pairs="auto")
                         # switches to the O(n) neighbor-engine layout


def _dispersion_sums(rmin_half, eps):
    """(S6, S12) over all ordered atom pairs for the isotropic LJ tail
    correction, via unique-type grouping (O(T^2), not O(n^2)).

    OpenMM's NonbondedForceImpl::calcDispersionCorrection homogeneous-fluid
    approximation: exclusions/1-4 scaling are ignored, self-type pairs
    included.  Amber Rmin/eps form: c6 = 2 eps rmin^6, c12 = eps rmin^12."""
    pars = np.stack([np.asarray(rmin_half, np.float64),
                     np.asarray(eps, np.float64)], axis=1)
    uniq, counts = np.unique(pars, axis=0, return_counts=True)
    rmin = uniq[:, 0][:, None] + uniq[:, 0][None, :]
    epsij = np.sqrt(uniq[:, 1][:, None] * uniq[:, 1][None, :])
    w = counts[:, None].astype(np.float64) * counts[None, :]
    s6 = float(np.sum(w * 2.0 * epsij * rmin ** 6))
    s12 = float(np.sum(w * epsij * rmin ** 12))
    return s6, s12


def system_from_tables(*, masses, charges, rmin_half, eps,
                       bond_idx=None, bond_k=None, bond_r0=None,
                       angle_idx=None, angle_k=None, angle_t0=None,
                       dih_idx=None, dih_pk=None, dih_phase=None, dih_n=None,
                       excl_idx=None, excl_qq=None, excl_lj=None,
                       method: str = "NoCutoff", cutoff: float = 1.0,
                       eps_rf: float = 78.5, box=None,
                       gb_radii=None, gb_scales=None,
                       cmap_idx=None, cmap_type=None, cmap_grids=None,
                       dense_pairs="auto", ewald_tol: float = 5e-4,
                       dispersion_correction: bool = True,
                       dtype=jnp.float32) -> MDSystem:
    """Construct an MDSystem directly from fully-resolved numeric tables.

    The entry point for *exact-parameter* imports (Amber prmtop,
    serialized OpenMM System XML — ``md/amberio.py`` / ``md/openmm_xml.py``)
    where every per-term constant is already known and no force-field
    lookup should run.  All quantities are in internal units: kJ/mol, nm,
    rad, e, amu; harmonic terms follow the Amber convention
    ``E = k (x - x0)^2`` (half of OpenMM's ``k``).

    ``excl_idx/excl_qq/excl_lj``: sparse exception list (i < j) with the
    *target* pair scales on the combined parameters (0 for 1-2/1-3,
    1/1.2 and 1/2 for Amber 1-4); pairs not listed interact at scale 1.
    ``gb_radii``/``gb_scales`` (intrinsic Born radii [nm] + OBC factors)
    switch on OBC2 implicit solvent.

    ``cmap_idx`` (nc, 8) / ``cmap_type`` (nc,) / ``cmap_grids`` (list of
    (R, R) energy grids [kJ], angle origin -pi): CMAP torsion-torsion
    corrections (ff19SB/CHARMM class, ``md/cmap.py``); bicubic patch
    coefficients are precomputed here in f64.
    """
    def np1(a, dt=np.float64):
        return (np.zeros((0,), dt) if a is None
                else np.asarray(a, dt).reshape(-1))

    masses = np1(masses)
    charges = np1(charges)
    rmin_half = np1(rmin_half)
    eps = np1(eps)
    natoms = masses.shape[0]
    if not (charges.shape[0] == rmin_half.shape[0] == eps.shape[0]
            == natoms):
        raise ValueError("per-atom table lengths disagree")

    bi = (np.zeros((0, 2), np.int32) if bond_idx is None
          else np.asarray(bond_idx, np.int32).reshape(-1, 2))
    ai = (np.zeros((0, 3), np.int32) if angle_idx is None
          else np.asarray(angle_idx, np.int32).reshape(-1, 3))
    di = (np.zeros((0, 4), np.int32) if dih_idx is None
          else np.asarray(dih_idx, np.int32).reshape(-1, 4))
    eidx = (np.zeros((0, 2), np.int32) if excl_idx is None
            else np.asarray(excl_idx, np.int32).reshape(-1, 2))
    eidx = np.stack([eidx.min(axis=1), eidx.max(axis=1)], axis=1) \
        if len(eidx) else eidx
    eqq = np1(excl_qq)
    elj_w = np1(excl_lj)

    ci = (np.zeros((0, 8), np.int32) if cmap_idx is None
          else np.asarray(cmap_idx, np.int32).reshape(-1, 8))
    ct = (np.zeros((0,), np.int32) if cmap_type is None
          else np.asarray(cmap_type, np.int32).reshape(-1))
    if len(ci):
        from .cmap import bicubic_coefs
        cc = np.stack([bicubic_coefs(g) for g in cmap_grids])
    else:
        cc = np.zeros((0, 0, 0, 4, 4))

    implicit = "obc2" if gb_radii is not None else None
    if implicit is not None:
        method = "NoCutoff"
    if method in ("Ewald", "PME", "LJPME") and box is None:
        raise ValueError(f"method={method} requires a periodic box")
    if box is not None and method in ("CutoffPeriodic", "Ewald", "PME",
                                      "LJPME"):
        cutoff = min(cutoff, 0.999 * float(min(box)) / 2)

    ewald_alpha_v = 0.0
    ekv = np.zeros((0, 3), np.float32)
    ecf = np.zeros((0,), np.float32)
    if method in ("Ewald", "PME", "LJPME"):
        from .ewald import ewald_alpha, ewald_kvectors
        ewald_alpha_v = ewald_alpha(float(cutoff), ewald_tol)
        ekv, ecf = ewald_kvectors(box, ewald_alpha_v, ewald_tol)

    use_disp = bool(dispersion_correction and box is not None
                    and method in ("CutoffPeriodic", "Ewald", "PME"))
    s6, s12 = _dispersion_sums(rmin_half, eps) if use_disp else (0.0, 0.0)

    q6_v = np.zeros((0,))
    lj6cf = np.zeros((0,))
    ljpme_beta_v = 0.0
    if method == "LJPME":
        from .ewald import ljpme_coefs
        q6_v = np.sqrt(2.0 * eps) * (2.0 * rmin_half) ** 3
        ljpme_beta_v = ewald_alpha_v
        lj6cf = ljpme_coefs(box, ljpme_beta_v, ekv)

    if dense_pairs == "auto":
        dense_pairs = natoms <= DENSE_PAIRS_MAX
    if dense_pairs:
        qq = np.ones((natoms, natoms))
        lj = np.ones((natoms, natoms))
        np.fill_diagonal(qq, 0.0)
        np.fill_diagonal(lj, 0.0)
        for (a, b), wq, wl in zip(eidx, eqq, elj_w):
            qq[a, b] = qq[b, a] = wq
            lj[a, b] = lj[b, a] = wl
    else:
        qq = lj = np.zeros((0, 0))

    def incidence(pairs):
        if not dense_pairs:
            return np.zeros((0, natoms), dtype=np.float32)
        D = np.zeros((len(pairs), natoms), dtype=np.float32)
        for r, (a, b) in enumerate(pairs):
            D[r, a] += 1.0
            D[r, b] -= 1.0
        return D

    def arr(x, dt=dtype):
        return jnp.asarray(np.asarray(x), dt)

    return MDSystem(
        bond_idx=arr(bi, jnp.int32),
        bond_k=arr(np1(bond_k)), bond_r0=arr(np1(bond_r0)),
        angle_idx=arr(ai, jnp.int32),
        angle_k=arr(np1(angle_k)), angle_t0=arr(np1(angle_t0)),
        dih_idx=arr(di, jnp.int32),
        dih_pk=arr(np1(dih_pk)), dih_phase=arr(np1(dih_phase)),
        dih_n=arr(np1(dih_n)),
        bond_D=arr(incidence(bi)),
        angle_U=arr(incidence(ai[:, [0, 1]])),
        angle_V=arr(incidence(ai[:, [2, 1]])),
        dih_B1=arr(incidence(di[:, [1, 0]])),
        dih_B2=arr(incidence(di[:, [2, 1]])),
        dih_B3=arr(incidence(di[:, [3, 2]])),
        charges=arr(charges), rmin_half=arr(rmin_half), eps=arr(eps),
        qq_scale=arr(qq), lj_scale=arr(lj), masses=arr(masses),
        gb_radii=arr(np1(gb_radii) if gb_radii is not None else np.zeros(0)),
        gb_scales=arr(np1(gb_scales) if gb_scales is not None
                      else np.zeros(0)),
        excl_idx=arr(eidx, jnp.int32), excl_qq=arr(eqq), excl_lj=arr(elj_w),
        ewald_kvecs=arr(ekv), ewald_coefs=arr(ecf),
        ewald_alpha=float(ewald_alpha_v),
        q6=arr(q6_v), ljpme_coefs=arr(lj6cf),
        ljpme_beta=float(ljpme_beta_v),
        cmap_idx=arr(ci, jnp.int32), cmap_type=arr(ct, jnp.int32),
        cmap_coefs=arr(cc),
        use_dispersion=use_disp, disp_c6sum=s6, disp_c12sum=s12,
        method=method, cutoff=float(cutoff), eps_rf=float(eps_rf),
        box=tuple(float(b) for b in box) if box is not None else None,
        implicit=implicit, dense_pairs=bool(dense_pairs),
    )


def build_system(source, method: str = "auto", cutoff: float = 1.0,
                 eps_rf: float = 78.5, implicit: str = None,
                 dense_pairs="auto", ewald_tol: float = 5e-4,
                 dispersion_correction: bool = True,
                 dtype=jnp.float32) -> MDSystem:
    """Construct an MDSystem from a PDB path / PDBStructure / Topology.

    ``method='auto'`` mirrors the reference's nonbonded auto-selection
    (``src/simulators/mopenmm.py:103-115``): CutoffPeriodic when the PDB has
    a box, CutoffNonPeriodic otherwise.  ``method='Ewald'``/``'PME'``
    (reference pass-through ``mopenmm.py:101-115``) enables full periodic
    electrostatics via the structure-factor Ewald module (``md/ewald.py``;
    both names select the same exact matmul formulation — the TPU-first
    replacement for grid PME) with error tolerance ``ewald_tol`` (OpenMM's
    ewaldErrorTolerance).  ``implicit='obc2'`` enables GBSA implicit
    solvent (forces NoCutoff, as for OpenMM implicit setups).

    ``dispersion_correction``: isotropic long-range LJ tail correction for
    periodic cutoff methods (OpenMM's ``useDispersionCorrection``, default
    True there too).  Coordinate-independent — identical NVT dynamics —
    but volume-dependent, so NPT pressures are correct under truncation.

    ``dense_pairs``: True keeps the dense (n, n) scale and (nterms, n)
    incidence matrices (small/medium systems — everything on the MXU);
    False skips them (O(n) memory) and energies/forces run through the
    cell-list neighbor engine (``md/neighbor.py``); "auto" switches at
    ``DENSE_PAIRS_MAX`` atoms."""
    box = None
    if isinstance(source, str):
        struct = read_pdb(source)
        box = struct.box
        top = build_topology(struct)
    elif isinstance(source, PDBStructure):
        struct = source
        box = struct.box
        top = build_topology(struct)
    else:
        top = source

    if implicit is not None:
        method = "NoCutoff"
    if method == "auto":
        method = "CutoffPeriodic" if box is not None else "CutoffNonPeriodic"
    if method in ("Ewald", "PME", "LJPME") and box is None:
        raise ValueError(f"method={method} requires a periodic box")
    if box is not None and method in ("CutoffPeriodic", "Ewald", "PME",
                                      "LJPME"):
        # OpenMM requires cutoff < box/2
        cutoff = min(cutoff, 0.999 * float(min(box)) / 2)

    ewald_alpha_v = 0.0
    ekv = np.zeros((0, 3), np.float32)
    ecf = np.zeros((0,), np.float32)
    if method in ("Ewald", "PME", "LJPME"):
        from .ewald import ewald_alpha, ewald_kvectors
        ewald_alpha_v = ewald_alpha(float(cutoff), ewald_tol)
        ekv, ecf = ewald_kvectors(box, ewald_alpha_v, ewald_tol)

    types = top.atom_types

    bond_idx, bond_k, bond_r0 = [], [], []
    for (a, b) in top.bonds:
        k, r0 = amber.lookup_bond(types[a], types[b])
        bond_idx.append((a, b))
        bond_k.append(k * KCAL * 100.0)   # kcal/A^2 -> kJ/nm^2
        bond_r0.append(r0 / 10.0)

    angle_idx, angle_k, angle_t0 = [], [], []
    for (a, b, c) in top.angles:
        k, t0 = amber.lookup_angle(types[a], types[b], types[c])
        angle_idx.append((a, b, c))
        angle_k.append(k * KCAL)
        angle_t0.append(np.deg2rad(t0))

    dih_idx, dih_pk, dih_phase, dih_n = [], [], [], []
    for (i, j, k, l) in top.propers:
        for (pk, phase, n) in amber.lookup_dihedral(types[i], types[j],
                                                    types[k], types[l]):
            if pk == 0.0:
                continue
            dih_idx.append((i, j, k, l))
            dih_pk.append(pk * KCAL)
            dih_phase.append(np.deg2rad(phase))
            dih_n.append(float(n))
    for (i, j, c, l) in top.impropers:
        par = amber.lookup_improper(types[i], types[j], types[c], types[l])
        if par is None:
            continue
        pk, phase, n = par
        dih_idx.append((i, j, c, l))
        dih_pk.append(pk * KCAL)
        dih_phase.append(np.deg2rad(phase))
        dih_n.append(float(n))

    rmin_half = np.array([amber.lj_params(t)[0] / 10.0 for t in types])
    eps = np.array([amber.lj_params(t)[1] * KCAL for t in types])
    use_disp = bool(dispersion_correction and box is not None
                    and method in ("CutoffPeriodic", "Ewald", "PME"))
    s6, s12 = _dispersion_sums(rmin_half, eps) if use_disp else (0.0, 0.0)

    # LJPME: geometric dispersion amplitudes + signed k-space coefficients
    # on the same k-vector list as the Coulomb part (tail correction is
    # replaced by the k=0/self terms — see md/ewald.py)
    q6_v = np.zeros((0,))
    lj6cf = np.zeros((0,))
    ljpme_beta_v = 0.0
    if method == "LJPME":
        from .ewald import ljpme_coefs
        q6_v = np.sqrt(2.0 * eps) * (2.0 * rmin_half) ** 3
        ljpme_beta_v = ewald_alpha_v
        lj6cf = ljpme_coefs(box, ljpme_beta_v, ekv)
    if dense_pairs == "auto":
        dense_pairs = top.natoms <= DENSE_PAIRS_MAX
    if dense_pairs:
        qq, lj = _exclusion_scales(top, amber.SCEE, amber.SCNB)
    else:
        qq = lj = np.zeros((0, 0))
    eidx, eqq, elj_w = sparse_exclusions(top, amber.SCEE, amber.SCNB)

    def arr(x, dt=dtype):
        return jnp.asarray(np.asarray(x), dt)

    natoms = top.natoms

    def incidence(pairs):
        """Dense difference operator: row k = e_{pairs[k][0]} - e_{pairs[k][1]}."""
        if not dense_pairs:
            return np.zeros((0, natoms), dtype=np.float32)
        D = np.zeros((len(pairs), natoms), dtype=np.float32)
        for r, (a, b) in enumerate(pairs):
            D[r, a] += 1.0
            D[r, b] -= 1.0
        return D

    bi = np.asarray(bond_idx, np.int32).reshape(-1, 2)
    ai = np.asarray(angle_idx, np.int32).reshape(-1, 3)
    di = np.asarray(dih_idx, np.int32).reshape(-1, 4)

    sys = MDSystem(
        bond_idx=arr(bi, jnp.int32),
        bond_k=arr(bond_k), bond_r0=arr(bond_r0),
        angle_idx=arr(ai, jnp.int32),
        angle_k=arr(angle_k), angle_t0=arr(angle_t0),
        dih_idx=arr(di, jnp.int32),
        dih_pk=arr(dih_pk), dih_phase=arr(dih_phase), dih_n=arr(dih_n),
        bond_D=arr(incidence(bi)),
        angle_U=arr(incidence(ai[:, [0, 1]])),
        angle_V=arr(incidence(ai[:, [2, 1]])),
        dih_B1=arr(incidence(di[:, [1, 0]])),
        dih_B2=arr(incidence(di[:, [2, 1]])),
        dih_B3=arr(incidence(di[:, [3, 2]])),
        charges=arr(top.charges), rmin_half=arr(rmin_half), eps=arr(eps),
        qq_scale=arr(qq), lj_scale=arr(lj), masses=arr(top.masses),
        gb_radii=arr(_gb_params(top)[0] if implicit else np.zeros(0)),
        gb_scales=arr(_gb_params(top)[1] if implicit else np.zeros(0)),
        excl_idx=arr(eidx, jnp.int32), excl_qq=arr(eqq), excl_lj=arr(elj_w),
        ewald_kvecs=arr(ekv), ewald_coefs=arr(ecf),
        ewald_alpha=float(ewald_alpha_v),
        q6=arr(q6_v), ljpme_coefs=arr(lj6cf),
        ljpme_beta=float(ljpme_beta_v),
        use_dispersion=use_disp, disp_c6sum=s6, disp_c12sum=s12,
        method=method, cutoff=float(cutoff), eps_rf=float(eps_rf),
        box=tuple(float(b) for b in box) if box is not None else None,
        implicit=implicit, dense_pairs=bool(dense_pairs),
    )
    return sys
