"""Embedded Amber-type protein force field (ff99SB-class).

Replaces the reference's OpenMM ForceField machinery
(``src/simulators/mopenmm.py:10-98`` building amber14 systems) with a
self-contained parameter set: residue templates (atom types, charges,
bonds) plus bond/angle/dihedral/improper/LJ tables of the Cornell-type
Amber protein force field with the ff99SB backbone-torsion corrections.

Parameters are plain Python data — kcal/mol & Angstrom as in the Amber
parameter files; ``build_system`` (system.py) converts to kJ/mol & nm.

The residue library currently covers the capped-peptide systems exercised
by the reference test/benchmark suite and is extensible by adding entries
to ``RESIDUES``.
"""

from __future__ import annotations

import math

# ==========================================================================
# Atom type properties: mass (amu), LJ Rmin/2 (Angstrom), LJ eps (kcal/mol)
# ==========================================================================

ATOM_TYPES = {
    #        mass    rmin_half  eps
    "CT": (12.010, 1.9080, 0.1094),
    "C":  (12.010, 1.9080, 0.0860),
    "N":  (14.010, 1.8240, 0.1700),
    "N3": (14.010, 1.8240, 0.1700),
    "O":  (16.000, 1.6612, 0.2100),
    "O2": (16.000, 1.6612, 0.2100),
    "OH": (16.000, 1.7210, 0.2104),
    "H":  (1.008, 0.6000, 0.0157),
    "HC": (1.008, 1.4870, 0.0157),
    "H1": (1.008, 1.3870, 0.0157),
    "HP": (1.008, 1.1000, 0.0157),
    "HO": (1.008, 0.0001, 0.0000),
    "HS": (1.008, 0.6000, 0.0157),
    "S":  (32.060, 2.0000, 0.2500),
    "SH": (32.060, 2.0000, 0.2500),
    # aromatics / sidechain types (subset)
    "CA": (12.010, 1.9080, 0.0860),
    "HA": (1.008, 1.4590, 0.0150),
    "H4": (1.008, 1.4090, 0.0150),
    "H5": (1.008, 1.3590, 0.0150),
    "N2": (14.010, 1.8240, 0.1700),
    "NA": (14.010, 1.8240, 0.1700),
    "NB": (14.010, 1.8240, 0.1700),
    "CC": (12.010, 1.9080, 0.0860),
    "CR": (12.010, 1.9080, 0.0860),
    "CV": (12.010, 1.9080, 0.0860),
    "CW": (12.010, 1.9080, 0.0860),
    "CB": (12.010, 1.9080, 0.0860),
    "CN": (12.010, 1.9080, 0.0860),
    "C*": (12.010, 1.9080, 0.0860),
}

# ==========================================================================
# Bond parameters: (type1, type2) -> (K [kcal/mol/A^2], r0 [A])
# Amber convention E = K (r - r0)^2 (no 1/2).
# ==========================================================================

BONDS = {
    ("C", "N"): (490.0, 1.335),
    ("C", "O"): (570.0, 1.229),
    ("C", "O2"): (656.0, 1.250),
    ("C", "CT"): (317.0, 1.522),
    ("CT", "CT"): (310.0, 1.526),
    ("CT", "HC"): (340.0, 1.090),
    ("CT", "H1"): (340.0, 1.090),
    ("CT", "HP"): (340.0, 1.090),
    ("CT", "N"): (337.0, 1.449),
    ("CT", "N3"): (367.0, 1.471),
    ("N", "H"): (434.0, 1.010),
    ("N3", "H"): (434.0, 1.010),
    ("CT", "OH"): (320.0, 1.410),
    ("OH", "HO"): (553.0, 0.960),
    ("CT", "S"): (227.0, 1.810),
    ("CT", "SH"): (237.0, 1.810),
    ("S", "S"): (166.0, 2.038),
    ("SH", "HS"): (274.0, 1.336),
}

# ==========================================================================
# Angle parameters: (t1, t2, t3) -> (K [kcal/mol/rad^2], theta0 [deg])
# ==========================================================================

ANGLES = {
    ("C", "N", "CT"): (50.0, 121.90),
    ("C", "N", "H"): (50.0, 120.00),
    ("CT", "C", "N"): (70.0, 116.60),
    ("CT", "C", "O"): (80.0, 120.40),
    ("CT", "C", "O2"): (70.0, 117.00),
    ("N", "C", "O"): (80.0, 122.90),
    ("O2", "C", "O2"): (80.0, 126.00),
    ("CT", "CT", "C"): (63.0, 111.10),
    ("CT", "CT", "N"): (80.0, 109.70),
    ("CT", "CT", "N3"): (80.0, 111.20),
    ("CT", "CT", "CT"): (40.0, 109.50),
    ("CT", "CT", "HC"): (50.0, 109.50),
    ("CT", "CT", "H1"): (50.0, 109.50),
    ("CT", "CT", "HP"): (50.0, 109.50),
    ("CT", "CT", "OH"): (50.0, 109.50),
    ("CT", "CT", "S"): (50.0, 114.70),
    ("CT", "CT", "SH"): (50.0, 108.60),
    ("HC", "CT", "HC"): (35.0, 109.50),
    ("H1", "CT", "H1"): (35.0, 109.50),
    ("HP", "CT", "HP"): (35.0, 109.50),
    ("C", "CT", "HC"): (50.0, 109.50),
    ("C", "CT", "H1"): (50.0, 109.50),
    ("C", "CT", "HP"): (50.0, 109.50),
    ("C", "CT", "N"): (63.0, 110.10),
    ("C", "CT", "N3"): (80.0, 111.20),
    ("C", "CT", "CT"): (63.0, 111.10),
    ("H1", "CT", "N"): (50.0, 109.50),
    ("H1", "CT", "N3"): (50.0, 109.50),
    ("HP", "CT", "N3"): (50.0, 109.50),
    ("H1", "CT", "OH"): (50.0, 109.50),
    ("H1", "CT", "S"): (50.0, 109.50),
    ("H1", "CT", "SH"): (50.0, 109.50),
    ("CT", "N", "H"): (38.0, 118.04),  # the reference "H-N-CT" parm99 angle
    ("CT", "N", "CT"): (50.0, 118.00),
    ("CT", "N3", "H"): (50.0, 109.50),
    ("H", "N", "H"): (35.0, 120.00),
    ("H", "N3", "H"): (35.0, 109.50),
    ("CT", "OH", "HO"): (55.0, 108.50),
    ("CT", "S", "CT"): (62.0, 98.90),
    ("CT", "S", "S"): (68.0, 103.70),
    ("CT", "SH", "HS"): (43.0, 96.00),
}

# ==========================================================================
# Proper dihedrals.
# key -> list of (PK/IDIVF [kcal/mol], phase [deg], periodicity n).
# "X" is a wildcard.  Specific entries override the generic X-entry
# (Amber most-specific-match rule).  ff99SB backbone corrections included.
# ==========================================================================

DIHEDRALS = {
    ("X", "C", "N", "X"): [(10.0 / 4, 180.0, 2)],
    ("X", "CT", "N", "X"): [(0.0, 0.0, 2)],
    ("X", "C", "CT", "X"): [(0.0, 0.0, 2)],
    ("X", "CT", "CT", "X"): [(1.40 / 9, 0.0, 3)],
    ("X", "CT", "N3", "X"): [(1.40 / 9, 0.0, 3)],
    ("X", "CT", "OH", "X"): [(0.50 / 3, 0.0, 3)],
    ("X", "CT", "S", "X"): [(1.00 / 3, 0.0, 3)],
    ("X", "CT", "SH", "X"): [(0.75 / 3, 0.0, 3)],
    # parm99 specific peptide terms
    ("H", "N", "C", "O"): [(2.50, 180.0, 2), (2.00, 0.0, 1)],
    # ff99SB phi: C-N-CA-C
    ("C", "N", "CT", "C"): [(0.00, 0.0, 4), (0.42, 0.0, 3),
                            (0.27, 0.0, 2), (0.00, 0.0, 1)],
    # ff99SB psi: N-CA-C-N
    ("N", "CT", "C", "N"): [(0.00, 0.0, 4), (0.55, 180.0, 3),
                            (1.58, 180.0, 2), (0.45, 180.0, 1)],
    # ff99SB phi': CB-CA-N-C  (CT-CT-N-C)
    ("CT", "CT", "N", "C"): [(0.00, 0.0, 4), (0.40, 0.0, 3),
                             (2.00, 0.0, 2), (2.00, 0.0, 1)],
    # ff99SB psi': CB-CA-C-N  (CT-CT-C-N)
    ("CT", "CT", "C", "N"): [(0.00, 0.0, 4), (0.40, 0.0, 3),
                             (0.20, 0.0, 2), (0.20, 0.0, 1)],
}

# Impropers: (t1, t2, t3=central, t4) -> (PK, phase, n)
IMPROPERS = {
    ("X", "X", "C", "O"): (10.5, 180.0, 2),
    ("X", "X", "N", "H"): (1.0, 180.0, 2),
    ("X", "O2", "C", "O2"): (10.5, 180.0, 2),
}

# 1-4 scaling factors (Amber convention)
SCEE = 1.0 / 1.2      # electrostatic 1-4 scale
SCNB = 1.0 / 2.0      # LJ 1-4 scale


# ==========================================================================
# Residue templates: name -> dict(atoms={name: (type, charge)}, bonds=[...])
# Charges are the Cornell et al. (ff94/ff99SB/ff14SB) values.
# Backbone C connects to the next residue's N (handled by the topology
# builder via the implicit ("C", "+N") linkage).
# ==========================================================================

_BB_N = [("N", "H"), ("N", "CA")]
_BB_C = [("CA", "C"), ("C", "O")]


RESIDUES = {
    "ACE": {
        "atoms": {
            "HH31": ("HC", 0.1123), "CH3": ("CT", -0.3662),
            "HH32": ("HC", 0.1123), "HH33": ("HC", 0.1123),
            "C": ("C", 0.5972), "O": ("O", -0.5679),
        },
        "bonds": [("CH3", "HH31"), ("CH3", "HH32"), ("CH3", "HH33"),
                  ("CH3", "C"), ("C", "O")],
    },
    "NME": {
        "atoms": {
            "N": ("N", -0.4157), "H": ("H", 0.2719),
            "CH3": ("CT", -0.1490),
            "HH31": ("H1", 0.0976), "HH32": ("H1", 0.0976), "HH33": ("H1", 0.0976),
        },
        "bonds": [("N", "H"), ("N", "CH3"),
                  ("CH3", "HH31"), ("CH3", "HH32"), ("CH3", "HH33")],
    },
    "NHE": {
        "atoms": {"N": ("N", -0.4630), "HN1": ("H", 0.2315), "HN2": ("H", 0.2315)},
        "bonds": [("N", "HN1"), ("N", "HN2")],
    },
    "ALA": {
        "atoms": {
            "N": ("N", -0.4157), "H": ("H", 0.2719),
            "CA": ("CT", 0.0337), "HA": ("H1", 0.0823),
            "CB": ("CT", -0.1825),
            "HB1": ("HC", 0.0603), "HB2": ("HC", 0.0603), "HB3": ("HC", 0.0603),
            "C": ("C", 0.5973), "O": ("O", -0.5679),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"),
                          ("CB", "HB1"), ("CB", "HB2"), ("CB", "HB3")] + _BB_C,
    },
    "GLY": {
        "atoms": {
            "N": ("N", -0.4157), "H": ("H", 0.2719),
            "CA": ("CT", -0.0252), "HA2": ("H1", 0.0698), "HA3": ("H1", 0.0698),
            "C": ("C", 0.5973), "O": ("O", -0.5679),
        },
        "bonds": _BB_N + [("CA", "HA2"), ("CA", "HA3")] + _BB_C,
    },
    "VAL": {
        "atoms": {
            "N": ("N", -0.4157), "H": ("H", 0.2719),
            "CA": ("CT", -0.0875), "HA": ("H1", 0.0969),
            "CB": ("CT", 0.2985), "HB": ("HC", -0.0297),
            "CG1": ("CT", -0.3192),
            "HG11": ("HC", 0.0791), "HG12": ("HC", 0.0791), "HG13": ("HC", 0.0791),
            "CG2": ("CT", -0.3192),
            "HG21": ("HC", 0.0791), "HG22": ("HC", 0.0791), "HG23": ("HC", 0.0791),
            "C": ("C", 0.5973), "O": ("O", -0.5679),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB"),
                          ("CB", "CG1"), ("CG1", "HG11"), ("CG1", "HG12"), ("CG1", "HG13"),
                          ("CB", "CG2"), ("CG2", "HG21"), ("CG2", "HG22"), ("CG2", "HG23")] + _BB_C,
    },
    "LEU": {
        "atoms": {
            "N": ("N", -0.4157), "H": ("H", 0.2719),
            "CA": ("CT", -0.0518), "HA": ("H1", 0.0922),
            "CB": ("CT", -0.1102), "HB2": ("HC", 0.0457), "HB3": ("HC", 0.0457),
            "CG": ("CT", 0.3531), "HG": ("HC", -0.0361),
            "CD1": ("CT", -0.4121),
            "HD11": ("HC", 0.1000), "HD12": ("HC", 0.1000), "HD13": ("HC", 0.1000),
            "CD2": ("CT", -0.4121),
            "HD21": ("HC", 0.1000), "HD22": ("HC", 0.1000), "HD23": ("HC", 0.1000),
            "C": ("C", 0.5973), "O": ("O", -0.5679),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB2"), ("CB", "HB3"),
                          ("CB", "CG"), ("CG", "HG"),
                          ("CG", "CD1"), ("CD1", "HD11"), ("CD1", "HD12"), ("CD1", "HD13"),
                          ("CG", "CD2"), ("CD2", "HD21"), ("CD2", "HD22"), ("CD2", "HD23")] + _BB_C,
    },
    "ILE": {
        "atoms": {
            "N": ("N", -0.4157), "H": ("H", 0.2719),
            "CA": ("CT", -0.0597), "HA": ("H1", 0.0869),
            "CB": ("CT", 0.1303), "HB": ("HC", 0.0187),
            "CG2": ("CT", -0.3204),
            "HG21": ("HC", 0.0882), "HG22": ("HC", 0.0882), "HG23": ("HC", 0.0882),
            "CG1": ("CT", -0.0430), "HG12": ("HC", 0.0236), "HG13": ("HC", 0.0236),
            "CD1": ("CT", -0.0660),
            "HD11": ("HC", 0.0186), "HD12": ("HC", 0.0186), "HD13": ("HC", 0.0186),
            "C": ("C", 0.5973), "O": ("O", -0.5679),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB"),
                          ("CB", "CG2"), ("CG2", "HG21"), ("CG2", "HG22"), ("CG2", "HG23"),
                          ("CB", "CG1"), ("CG1", "HG12"), ("CG1", "HG13"),
                          ("CG1", "CD1"), ("CD1", "HD11"), ("CD1", "HD12"), ("CD1", "HD13")] + _BB_C,
    },
    "PRO": {
        "atoms": {
            "N": ("N", -0.2548),
            "CD": ("CT", 0.0192), "HD2": ("H1", 0.0391), "HD3": ("H1", 0.0391),
            "CG": ("CT", 0.0189), "HG2": ("HC", 0.0213), "HG3": ("HC", 0.0213),
            "CB": ("CT", -0.0070), "HB2": ("HC", 0.0253), "HB3": ("HC", 0.0253),
            "CA": ("CT", -0.0266), "HA": ("H1", 0.0641),
            "C": ("C", 0.5896), "O": ("O", -0.5748),
        },
        "bonds": [("N", "CD"), ("N", "CA"),
                  ("CD", "HD2"), ("CD", "HD3"), ("CD", "CG"),
                  ("CG", "HG2"), ("CG", "HG3"), ("CG", "CB"),
                  ("CB", "HB2"), ("CB", "HB3"), ("CB", "CA"),
                  ("CA", "HA"), ("CA", "C"), ("C", "O")],
    },
    "SER": {
        "atoms": {
            "N": ("N", -0.4157), "H": ("H", 0.2719),
            "CA": ("CT", -0.0249), "HA": ("H1", 0.0843),
            "CB": ("CT", 0.2117), "HB2": ("H1", 0.0352), "HB3": ("H1", 0.0352),
            "OG": ("OH", -0.6546), "HG": ("HO", 0.4275),
            "C": ("C", 0.5973), "O": ("O", -0.5679),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB2"), ("CB", "HB3"),
                          ("CB", "OG"), ("OG", "HG")] + _BB_C,
    },
    "THR": {
        "atoms": {
            "N": ("N", -0.4157), "H": ("H", 0.2719),
            "CA": ("CT", -0.0389), "HA": ("H1", 0.1007),
            "CB": ("CT", 0.3654), "HB": ("H1", 0.0043),
            "CG2": ("CT", -0.2438),
            "HG21": ("HC", 0.0642), "HG22": ("HC", 0.0642), "HG23": ("HC", 0.0642),
            "OG1": ("OH", -0.6761), "HG1": ("HO", 0.4102),
            "C": ("C", 0.5973), "O": ("O", -0.5679),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB"),
                          ("CB", "CG2"), ("CG2", "HG21"), ("CG2", "HG22"), ("CG2", "HG23"),
                          ("CB", "OG1"), ("OG1", "HG1")] + _BB_C,
    },
    "CYS": {
        "atoms": {
            "N": ("N", -0.4157), "H": ("H", 0.2719),
            "CA": ("CT", 0.0213), "HA": ("H1", 0.1124),
            "CB": ("CT", -0.1231), "HB2": ("H1", 0.1112), "HB3": ("H1", 0.1112),
            "SG": ("SH", -0.3119), "HG": ("HS", 0.1933),
            "C": ("C", 0.5973), "O": ("O", -0.5679),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB2"), ("CB", "HB3"),
                          ("CB", "SG"), ("SG", "HG")] + _BB_C,
    },
    "MET": {
        "atoms": {
            "N": ("N", -0.4157), "H": ("H", 0.2719),
            "CA": ("CT", -0.0237), "HA": ("H1", 0.0880),
            "CB": ("CT", 0.0342), "HB2": ("HC", 0.0241), "HB3": ("HC", 0.0241),
            "CG": ("CT", 0.0018), "HG2": ("H1", 0.0440), "HG3": ("H1", 0.0440),
            "SD": ("S", -0.2737),
            "CE": ("CT", -0.0536),
            "HE1": ("H1", 0.0684), "HE2": ("H1", 0.0684), "HE3": ("H1", 0.0684),
            "C": ("C", 0.5973), "O": ("O", -0.5679),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB2"), ("CB", "HB3"),
                          ("CB", "CG"), ("CG", "HG2"), ("CG", "HG3"),
                          ("CG", "SD"), ("SD", "CE"),
                          ("CE", "HE1"), ("CE", "HE2"), ("CE", "HE3")] + _BB_C,
    },
}


def lj_params(atom_type: str):
    """(rmin_half [A], eps [kcal/mol])."""
    m, r, e = ATOM_TYPES[atom_type]
    return r, e


def mass(atom_type: str):
    return ATOM_TYPES[atom_type][0]


def lookup_bond(t1, t2):
    k = BONDS.get((t1, t2)) or BONDS.get((t2, t1))
    if k is None:
        raise KeyError(f"no bond parameters for {t1}-{t2}")
    return k


def lookup_angle(t1, t2, t3):
    k = ANGLES.get((t1, t2, t3)) or ANGLES.get((t3, t2, t1))
    if k is None:
        raise KeyError(f"no angle parameters for {t1}-{t2}-{t3}")
    return k


def lookup_dihedral(t1, t2, t3, t4):
    """Most-specific-match proper dihedral lookup."""
    for key in [(t1, t2, t3, t4), (t4, t3, t2, t1)]:
        if key in DIHEDRALS:
            return DIHEDRALS[key]
    for key in [("X", t2, t3, "X"), ("X", t3, t2, "X")]:
        if key in DIHEDRALS:
            return DIHEDRALS[key]
    return [(0.0, 0.0, 2)]


def lookup_improper(t1, t2, tc, t4):
    """Improper lookup with central atom third (Amber convention)."""
    if (t1, t2, tc, t4) in IMPROPERS:
        return IMPROPERS[(t1, t2, tc, t4)]
    for key, val in IMPROPERS.items():
        k1, k2, kc, k4 = key
        if kc != tc:
            continue
        if (k1 in ("X", t1) and k2 in ("X", t2) and k4 in ("X", t4)):
            return val
    return None
