"""Ligand-charge fidelity bounds (VERDICT r2: ligand charges).

Pins the Gasteiger-vs-AM1-BCC methanol anchor (published AM1-BCC
charges, same set as the import-test mol2 fixture) and the loud
accuracy warning on the builtin path; docs/ligand_fidelity.md carries
the full study (tools/ligand_charge_fidelity.py).

Reference counterpart: openmmforcefields GAFF/AM1-BCC ligand setup,
``src/simulators/mopenmm.py:30-50``.
"""

import os
import sys
import warnings

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tools"))
from ligand_charge_fidelity import (MOH_AM1BCC, MOH_XYZ_A,   # noqa: E402
                                    coulomb_intra, methanol_anchor)


def test_methanol_anchor_bounds():
    res = methanol_anchor()
    # Gasteiger under-polarizes the hydroxyl: the deviation is real,
    # bounded, and of the documented size
    assert 0.04 < res["abs_dq_mean"] < 0.12
    assert 0.12 < res["abs_dq_max"] < 0.25
    # per-term Coulomb energy difference bounded (docs table: 5.3 kJ/mol)
    assert res["e_coul_intra_diff_kj"] < 10.0
    # both dipoles physical, Gasteiger's smaller (under-polarization)
    assert 1.0 < res["dipole_gasteiger_D"] < res["dipole_am1bcc_D"] < 2.5


def test_coulomb_intra_exclusions():
    # three collinear unit charges, 1 A apart: 1-2 and 1-3 are excluded,
    # so the only surviving pair is... none (all within 2 bonds)
    q = np.array([1.0, 1.0, 1.0])
    xyz = np.array([[0.0, 0, 0], [0.1, 0, 0], [0.2, 0, 0]])
    assert coulomb_intra(q, xyz, [(0, 1), (1, 2)]) == 0.0
    # a 4-chain: only the 1-4 pair survives, scaled by 1/1.2
    q = np.array([1.0, 0.0, 0.0, 1.0])
    xyz = np.array([[0.0, 0, 0], [0.1, 0, 0], [0.2, 0, 0], [0.3, 0, 0]])
    e = coulomb_intra(q, xyz, [(0, 1), (1, 2), (2, 3)])
    assert e == pytest.approx(138.935458 / 0.3 / 1.2, rel=1e-9)


def test_gasteiger_warning_fires():
    from isokann_tpu.md.ligand import parameterize_ligand
    from isokann_tpu.md.pdbio import PDBStructure

    names = list(MOH_AM1BCC)
    xyz = np.array([MOH_XYZ_A[n] for n in names]) / 10.0
    struct = PDBStructure(
        atom_names=names, res_names=["MOH"] * 6, res_ids=[1] * 6,
        chain_ids=["A"] * 6, elements=["C", "O", "H", "H", "H", "H"],
        coords=xyz)
    with pytest.warns(UserWarning, match="Gasteiger"):
        parameterize_ligand("MOH", struct, add_h=False, register=False)
    # explicit charges suppress the warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        parameterize_ligand("MOH", struct, add_h=False, register=False,
                            charges=[MOH_AM1BCC[n] for n in names])
