"""Force-field parameter provenance: diff every constant in
``isokann_tpu.md.amber`` against the independent transcription in
``tests/data/parm_fixture.py`` and prove the lookup fallbacks are
unreachable for standard residues.

Reference counterpart: the reference outsources all of this to OpenMM's
authoritative amber14 XMLs (``src/simulators/mopenmm.py:55-76``); this
rebuild embeds the tables, so their fidelity needs its own regression net.
"""

import ast
import collections
import os
import sys
import warnings

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
import parm_fixture as fx                                  # noqa: E402

from isokann_tpu.md import amber                           # noqa: E402


def _sym2(table, key):
    return table.get(key) or table.get(key[::-1])


def _sym3(table, key):
    return table.get(key) or table.get(key[::-1])


# --------------------------------------------------------------------------
# table diffs
# --------------------------------------------------------------------------

def test_atom_types_match_fixture():
    bad = []
    for t, (m, r, e) in fx.ATOM_TYPES_HIGH.items():
        got = amber.ATOM_TYPES.get(t)
        if got is None:
            bad.append((t, "missing"))
            continue
        gm, gr, ge = got
        # HO/HW rmin may use a tiny epsilon instead of exactly 0
        rtol = 1e-3 if r == 0.0 else 0.0
        if abs(gm - m) > 1e-6 or abs(gr - r) > rtol + 1e-9 or abs(ge - e) > 1e-9:
            bad.append((t, got, (m, r, e)))
    assert not bad, f"LJ/mass mismatches vs parm fixture: {bad}"


def test_bonds_match_fixture():
    bad = []
    for k, v in fx.BONDS_HIGH.items():
        got = _sym2(amber.BONDS, k)
        if got is None or abs(got[0] - v[0]) > 1e-9 or abs(got[1] - v[1]) > 1e-9:
            bad.append((k, got, v))
    assert not bad, f"bond mismatches vs parm fixture: {bad}"


def test_angles_match_fixture():
    bad = []
    for k, v in fx.ANGLES_HIGH.items():
        got = _sym3(amber.ANGLES, k)
        if got is None or abs(got[0] - v[0]) > 1e-9 or abs(got[1] - v[1]) > 1e-9:
            bad.append((k, got, v))
    assert not bad, f"angle mismatches vs parm fixture: {bad}"


def test_angles_fully_tracked():
    """Every implemented angle entry is either asserted HIGH or explicitly
    documented as approximate -- nothing untracked."""
    tracked = set()
    for k in list(fx.ANGLES_HIGH) + list(fx.ANGLES_APPROX):
        tracked.add(k)
        tracked.add(k[::-1])
    untracked = [k for k in amber.BUILTIN_ANGLES if k not in tracked]
    assert not untracked, f"angle entries without provenance: {untracked}"


def test_angles_approx_document_implemented_values():
    """The APPROX notes must describe what is actually implemented (K value
    in slot 0), so the documentation cannot drift."""
    bad = []
    for k, (impl_k, _cands, _note) in fx.ANGLES_APPROX.items():
        got = _sym3(amber.ANGLES, k)
        if got is None or abs(got[0] - impl_k) > 1e-9:
            bad.append((k, got, impl_k))
    assert not bad, f"APPROX docs out of date: {bad}"


def test_dihedrals_match_fixture():
    bad = []
    for k, terms in fx.DIHEDRALS_HIGH.items():
        got = amber.DIHEDRALS.get(k) or amber.DIHEDRALS.get(k[::-1])
        if got is None:
            bad.append((k, "missing"))
            continue
        want = sorted((round(pk / idivf, 10), ph, n)
                      for idivf, pk, ph, n in terms)
        have = sorted((round(pk, 10), ph, n) for pk, ph, n in got)
        if len(want) != len(have) or any(
                abs(w[0] - h[0]) > 1e-9 or w[1] != h[1] or w[2] != h[2]
                for w, h in zip(want, have)):
            bad.append((k, got, terms))
    assert not bad, f"dihedral mismatches vs parm fixture: {bad}"


def test_dihedrals_fully_tracked():
    tracked = set()
    for k in fx.DIHEDRALS_HIGH:
        tracked.add(k)
        tracked.add(k[::-1])
    untracked = [k for k in amber.BUILTIN_DIHEDRALS if k not in tracked]
    assert not untracked, f"dihedral entries without provenance: {untracked}"


def test_impropers_match_fixture():
    bad = []
    for k, v in fx.IMPROPERS_HIGH.items():
        t1, t2, tc, t4 = k
        got = (amber.IMPROPERS.get(k) or amber.IMPROPERS.get((t2, t1, tc, t4)))
        if got is None or tuple(got) != tuple(v):
            bad.append((k, got, v))
    assert not bad, f"improper mismatches vs parm fixture: {bad}"
    tracked = set()
    for (t1, t2, tc, t4) in fx.IMPROPERS_HIGH:
        tracked.add((t1, t2, tc, t4))
        tracked.add((t2, t1, tc, t4))
    untracked = [k for k in amber.BUILTIN_IMPROPERS if k not in tracked]
    assert not untracked, f"improper entries without provenance: {untracked}"


def test_scale_factors():
    assert amber.SCEE == fx.SCEE
    assert amber.SCNB == fx.SCNB


# --------------------------------------------------------------------------
# charges
# --------------------------------------------------------------------------

def test_charges_match_fixture_exactly():
    """ff94 charges survive import-time normalization bit-exactly: if the
    normalizer had to touch a standard residue, some charge was wrong."""
    bad = []
    for res, table in fx.CHARGES_HIGH.items():
        tmpl = amber.RESIDUES[res]
        for atom, q in table.items():
            t, got = tmpl["atoms"][atom]
            if abs(got - q) > 1e-9:
                bad.append((res, atom, got, q))
        extra = set(tmpl["atoms"]) - set(table)
        if extra:
            bad.append((res, "extra atoms", sorted(extra)))
    assert not bad, f"charge mismatches vs ff94 fixture: {bad}"


def test_raw_charge_sums_are_exact():
    """Published ff94 residue charge sets sum exactly to the formal charge
    (RESP fit constraint) -- the fixture must reproduce that, which catches
    any single mis-recalled charge in the fixture itself."""
    for res, table in fx.CHARGES_HIGH.items():
        formal = fx.FORMAL.get(res, 0)
        s = sum(table.values())
        assert abs(s - formal) < 1e-4, f"{res}: fixture sum {s} != {formal}"


def test_approx_residues_are_documented():
    assert "CYX" in fx.CHARGES_APPROX
    # CYX template still sums exactly to 0 after normalization
    s = sum(q for _, q in amber.RESIDUES["CYX"]["atoms"].values())
    assert abs(s) < 1e-9


# --------------------------------------------------------------------------
# source hygiene: no duplicate keys in the parameter dict literals
# --------------------------------------------------------------------------

def test_no_duplicate_dict_keys_in_amber_source():
    src_path = os.path.join(os.path.dirname(amber.__file__), "amber.py")
    tree = ast.parse(open(src_path).read())
    dups = []

    class V(ast.NodeVisitor):
        def visit_Dict(self, node):
            keys = []
            for k in node.keys:
                if k is None:
                    continue
                try:
                    keys.append(ast.literal_eval(k))
                except ValueError:
                    pass
            for k, c in collections.Counter(keys).items():
                if c > 1:
                    dups.append((node.lineno, k))
            self.generic_visit(node)

    V().visit(tree)
    assert not dups, f"duplicate dict keys in amber.py: {dups}"


# --------------------------------------------------------------------------
# fallback unreachability: one system per residue class builds with zero
# lookup_* fallback warnings
# --------------------------------------------------------------------------

# one-letter codes for all standard residues incl. tautomers; CYX (disulfide)
# is exercised by the solvate/topology tests instead (needs paired geometry)
_CLASSES = ["A", "G", "V", "L", "I", "P", "S", "T", "C", "M",
            "D", "E", "N", "Q", "K", "R", "F", "Y", "W", "H"]


def _build_no_warn(seq, capped=True, **kw):
    from isokann_tpu.md.fixtures import build_peptide
    from isokann_tpu.md.system import build_system

    struct = build_peptide(seq, capped=capped)
    amber._warned.clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sys_ = build_system(struct, **kw)
    msgs = [str(x.message) for x in w
            if "parameters for" in str(x.message)
            or "fallback" in str(x.message)]
    return sys_, msgs


@pytest.mark.parametrize("aa", _CLASSES)
def test_no_fallback_capped(aa):
    sys_, msgs = _build_no_warn([{"H": "HID"}.get(aa, None) or aa]
                                if aa == "H" else aa)
    assert not msgs, f"fallback parameters hit for {aa}: {msgs}"
    # total charge is an exact integer
    q = float(np.sum(np.asarray(sys_.charges)))
    assert abs(q - round(q)) < 1e-4


def test_no_fallback_his_tautomers():
    for tau in ("HIS", "HID", "HIP"):
        sys_, msgs = _build_no_warn([tau])
        assert not msgs, f"fallback parameters hit for {tau}: {msgs}"


def test_no_fallback_uncapped_termini():
    sys_, msgs = _build_no_warn("AG", capped=False)
    assert not msgs, f"fallback parameters hit for zwitterionic AG: {msgs}"
    q = float(np.sum(np.asarray(sys_.charges)))
    assert abs(q - round(q)) < 1e-4


def test_no_fallback_bundled_alanine_fixture():
    from isokann_tpu.md.fixtures import alanine_dipeptide_pdb
    from isokann_tpu.md.system import build_system

    amber._warned.clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        build_system(alanine_dipeptide_pdb())
    msgs = [str(x.message) for x in w if "parameters for" in str(x.message)]
    assert not msgs


# --------------------------------------------------------------------------
# improper coverage: the parm94-specific ring/proline impropers are actually
# generated by the topology builder
# --------------------------------------------------------------------------

def _improper_types(seq):
    from isokann_tpu.md.fixtures import build_peptide
    from isokann_tpu.md.topology import build_topology

    top = build_topology(build_peptide(seq))
    out = []
    for (i, j, c, l) in top.impropers:
        t = top.atom_types
        par = amber.lookup_improper(t[i], t[j], t[c], t[l])
        out.append(((t[i], t[j], t[c], t[l]), par))
    return out


def test_proline_n_improper_generated():
    found = [(k, p) for k, p in _improper_types("AP")
             if k[2] == "N" and p is not None and "H" not in k]
    assert found, "PRO tertiary-amide N improper missing"
    assert all(p == (1.0, 180.0, 2) for _, p in found)


@pytest.mark.parametrize("aa,center", [("F", "CA"), ("W", "C*"),
                                       ("H", "CC"), ("Y", "CA")])
def test_ring_substituent_improper_generated(aa, center):
    found = [(k, p) for k, p in _improper_types(aa)
             if k[2] == center and k[3] == "CT" and p is not None]
    assert found, f"{aa} ring-substituent improper at {center} missing"
    assert all(p == (1.1, 180.0, 2) for _, p in found)
