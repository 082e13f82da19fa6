"""Embedded Amber-type protein force field (ff99SB-class).

Replaces the reference's OpenMM ForceField machinery
(``src/simulators/mopenmm.py:10-98`` building amber14 systems) with a
self-contained parameter set: residue templates (atom types, charges,
bonds) plus bond/angle/dihedral/improper/LJ tables of the Cornell-type
Amber protein force field with the ff99SB backbone-torsion corrections.

Parameters are plain Python data — kcal/mol & Angstrom as in the Amber
parameter files; ``build_system`` (system.py) converts to kJ/mol & nm.

Provenance: bond/angle/dihedral/LJ constants follow parm94/parm99 (Cornell
et al. 1995; Wang, Cieplak & Kollman 2000) with the ff99SB backbone-torsion
corrections (Hornak et al. 2006); residue charges are the ff94 set
(all_amino94.lib), which ff99SB (and ff14SB, for side chains) kept
unchanged.  Every entry is cross-checked against an independent
transcription in ``tests/data/parm_fixture.py`` — entries whose exact
authoritative value could not be re-derived with certainty in this offline
environment are documented there as approximate (``ANGLES_APPROX`` etc.;
all are stiff H-bend modes with negligible effect on conformational
free-energy surfaces).

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
    # TIP3P water (Jorgensen 1983) and parm99 monovalent ions
    "OW": (16.000, 1.7683, 0.1520),
    "HW": (1.008, 0.0001, 0.0000),
    "IP": (22.990, 1.8680, 0.00277),   # Na+
    "IM": (35.450, 2.4700, 0.1000),    # Cl-
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
    # aromatics / sidechain rings (parm99-class values)
    ("CA", "CA"): (469.0, 1.400),
    ("CA", "HA"): (367.0, 1.080),
    ("CA", "CT"): (317.0, 1.510),
    ("CA", "OH"): (450.0, 1.364),
    ("CA", "N2"): (481.0, 1.340),
    ("N2", "H"): (434.0, 1.010),
    ("CT", "N2"): (337.0, 1.463),
    ("CA", "CB"): (469.0, 1.404),
    ("CA", "CN"): (469.0, 1.400),
    ("C*", "CT"): (317.0, 1.495),
    ("C*", "CW"): (546.0, 1.352),
    ("C*", "CB"): (388.0, 1.459),
    ("CB", "CN"): (447.0, 1.419),
    ("CN", "NA"): (428.0, 1.380),
    ("CW", "NA"): (427.0, 1.381),
    ("CW", "H4"): (367.0, 1.080),
    ("NA", "H"): (434.0, 1.010),
    ("CC", "CT"): (317.0, 1.504),
    ("CC", "CW"): (518.0, 1.371),
    ("CC", "NB"): (410.0, 1.394),
    ("CC", "NA"): (422.0, 1.385),
    ("CR", "NB"): (488.0, 1.335),
    ("CR", "NA"): (477.0, 1.343),
    ("CR", "H5"): (367.0, 1.080),
    ("CV", "NB"): (410.0, 1.394),
    ("CV", "H4"): (367.0, 1.080),
    ("CC", "CV"): (512.0, 1.375),
    ("OW", "HW"): (553.0, 0.9572),    # flexible-TIP3P fallback (rigid by default)
}

# fallback bond constants by element pair (used with a warning when an
# exact typed entry is missing)
_BOND_FALLBACK = (320.0, 1.45)

# ==========================================================================
# Angle parameters: (t1, t2, t3) -> (K [kcal/mol/rad^2], theta0 [deg])
# ==========================================================================

ANGLES = {
    ("C", "N", "CT"): (50.0, 121.90),
    ("C", "N", "H"): (30.0, 120.00),
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
    # aromatic / ring angles (parm99-class)
    ("CA", "CA", "CA"): (63.0, 120.00),
    ("CA", "CA", "HA"): (50.0, 120.00),
    ("CA", "CA", "CT"): (70.0, 120.00),
    ("CA", "CA", "OH"): (70.0, 120.00),
    ("CA", "OH", "HO"): (50.0, 113.00),
    ("CT", "CT", "CA"): (63.0, 114.00),
    ("HC", "CT", "CA"): (50.0, 109.50),
    ("N2", "CA", "N2"): (70.0, 120.00),
    ("CA", "N2", "H"): (50.0, 120.00),
    ("H", "N2", "H"): (35.0, 120.00),
    ("CT", "N2", "CA"): (50.0, 123.20),
    ("CT", "N2", "H"): (38.0, 118.40),
    ("CT", "CT", "N2"): (80.0, 111.20),
    ("H1", "CT", "N2"): (50.0, 109.50),
    # tryptophan indole (parm94-class)
    ("CB", "C*", "CT"): (70.0, 128.60),
    ("CB", "C*", "CW"): (63.0, 106.40),
    ("CT", "C*", "CW"): (70.0, 125.00),
    ("C*", "CB", "CA"): (63.0, 134.90),
    ("C*", "CB", "CN"): (63.0, 108.80),
    ("CA", "CB", "CN"): (63.0, 116.20),
    ("C*", "CW", "H4"): (35.0, 120.00),
    ("C*", "CW", "NA"): (70.0, 108.70),
    ("H4", "CW", "NA"): (35.0, 120.00),
    ("CB", "CN", "CA"): (63.0, 122.70),
    ("CB", "CN", "NA"): (70.0, 104.40),
    ("CA", "CN", "NA"): (70.0, 132.80),
    ("CW", "NA", "CN"): (70.0, 111.60),
    ("CW", "NA", "H"): (30.0, 120.00),
    ("CN", "NA", "H"): (30.0, 120.00),
    ("CT", "CT", "C*"): (63.0, 115.60),
    ("C*", "CT", "HC"): (50.0, 109.50),
    ("CA", "CA", "CB"): (63.0, 120.00),
    ("CA", "CA", "CN"): (63.0, 120.00),
    ("CB", "CA", "HA"): (35.0, 120.00),
    ("CN", "CA", "HA"): (35.0, 120.00),
    # histidine imidazole ring (parm99-class; HIE/HID/HIP tautomer types)
    ("CC", "CT", "CT"): (63.0, 113.10),
    ("CC", "CT", "HC"): (50.0, 109.50),
    ("CT", "CC", "CV"): (70.0, 120.00),
    ("CT", "CC", "CW"): (70.0, 120.00),
    ("CT", "CC", "NA"): (70.0, 120.00),
    ("CT", "CC", "NB"): (70.0, 120.00),
    ("CV", "CC", "NA"): (70.0, 120.00),
    ("CW", "CC", "NA"): (70.0, 120.00),
    ("CW", "CC", "NB"): (70.0, 120.00),
    ("CC", "CV", "H4"): (50.0, 120.00),
    ("CC", "CV", "NB"): (70.0, 120.00),
    ("H4", "CV", "NB"): (50.0, 120.00),
    ("CC", "CW", "H4"): (50.0, 120.00),
    ("CC", "CW", "NA"): (70.0, 120.00),
    # (H4, CW, NA) is defined once above in the tryptophan block
    ("CC", "NA", "CR"): (70.0, 120.00),
    ("CC", "NA", "H"): (30.0, 120.00),
    ("CR", "NA", "CW"): (70.0, 120.00),
    ("CR", "NA", "H"): (30.0, 120.00),
    ("CC", "NB", "CR"): (70.0, 117.00),
    ("CR", "NB", "CV"): (70.0, 117.00),
    ("H5", "CR", "NA"): (50.0, 120.00),
    ("H5", "CR", "NB"): (50.0, 120.00),
    ("NA", "CR", "NA"): (70.0, 120.00),
    ("NA", "CR", "NB"): (70.0, 120.00),
    ("HW", "OW", "HW"): (100.0, 104.52),   # flexible-TIP3P fallback
}

_SP2_TYPES = {"CA", "C", "C*", "CB", "CC", "CN", "CR", "CV", "CW",
              "N2", "NA", "NB", "N"}
_ANGLE_FALLBACK_SP2 = (63.0, 120.0)
_ANGLE_FALLBACK_SP3 = (50.0, 109.5)

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
    ("X", "S", "S", "X"): [(3.50, 0.0, 2), (0.60, 0.0, 3)],
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
    # ring torsions keep aromatic systems planar (parm99-class barriers)
    ("X", "CA", "CA", "X"): [(14.50 / 4, 180.0, 2)],
    ("X", "CA", "CB", "X"): [(14.00 / 4, 180.0, 2)],
    ("X", "CA", "CN", "X"): [(14.50 / 4, 180.0, 2)],
    ("X", "C*", "CW", "X"): [(26.10 / 4, 180.0, 2)],
    ("X", "C*", "CB", "X"): [(6.70 / 4, 180.0, 2)],
    ("X", "CB", "CN", "X"): [(12.00 / 4, 180.0, 2)],
    ("X", "CC", "CW", "X"): [(21.50 / 4, 180.0, 2)],
    ("X", "CC", "CV", "X"): [(20.60 / 4, 180.0, 2)],
    ("X", "CC", "NB", "X"): [(4.80 / 2, 180.0, 2)],
    ("X", "CC", "NA", "X"): [(5.60 / 4, 180.0, 2)],
    ("X", "CR", "NB", "X"): [(10.00 / 2, 180.0, 2)],
    ("X", "CR", "NA", "X"): [(9.30 / 4, 180.0, 2)],
    ("X", "CV", "NB", "X"): [(4.80 / 2, 180.0, 2)],
    ("X", "CW", "NA", "X"): [(6.00 / 4, 180.0, 2)],
    ("X", "CN", "NA", "X"): [(6.10 / 4, 180.0, 2)],
    ("X", "CA", "N2", "X"): [(9.60 / 4, 180.0, 2)],
    ("X", "CT", "N2", "X"): [(0.00, 0.0, 3)],
    ("X", "CA", "OH", "X"): [(1.80 / 2, 180.0, 2)],
    ("X", "CT", "CA", "X"): [(0.00, 0.0, 2)],
    ("X", "CT", "CC", "X"): [(0.00, 0.0, 2)],
    ("X", "CT", "C*", "X"): [(0.00, 0.0, 2)],
}

# Impropers: (t1, t2, t3=central, t4) -> (PK, phase, n)
IMPROPERS = {
    ("X", "X", "C", "O"): (10.5, 180.0, 2),
    ("X", "X", "N", "H"): (1.0, 180.0, 2),
    ("X", "O2", "C", "O2"): (10.5, 180.0, 2),
    # tertiary amide N (proline backbone, parm94 "X-CT-N-CT")
    ("X", "CT", "N", "CT"): (1.0, 180.0, 2),
    # ring-planarity impropers
    ("X", "X", "CA", "HA"): (1.1, 180.0, 2),
    ("X", "X", "CW", "H4"): (1.1, 180.0, 2),
    ("X", "X", "CR", "H5"): (1.1, 180.0, 2),
    ("X", "X", "CV", "H4"): (1.1, 180.0, 2),
    ("X", "X", "NA", "H"): (1.0, 180.0, 2),
    ("X", "X", "N2", "H"): (1.0, 180.0, 2),
    ("X", "N2", "CA", "N2"): (10.5, 180.0, 2),
    # ring-substituent planarity (parm94 specific impropers)
    ("CA", "CA", "CA", "CT"): (1.1, 180.0, 2),    # PHE/TYR CG
    ("NA", "CV", "CC", "CT"): (1.1, 180.0, 2),    # HID CG
    ("NB", "CW", "CC", "CT"): (1.1, 180.0, 2),    # HIE CG
    ("NA", "CW", "CC", "CT"): (1.1, 180.0, 2),    # HIP CG
    ("CW", "CB", "C*", "CT"): (1.1, 180.0, 2),    # TRP CG
}

# 1-4 scaling factors (Amber convention)
SCEE = 1.0 / 1.2      # electrostatic 1-4 scale
SCNB = 1.0 / 2.0      # LJ 1-4 scale

# snapshot of the built-in protein tables, taken before any runtime
# registration (register_residue / ligand parameterization extends the
# live tables; provenance tests diff only the builtin entries)
BUILTIN_ATOM_TYPES = frozenset(ATOM_TYPES)
BUILTIN_BONDS = frozenset(BONDS)
BUILTIN_ANGLES = frozenset(ANGLES)
BUILTIN_DIHEDRALS = frozenset(DIHEDRALS)
BUILTIN_IMPROPERS = frozenset(IMPROPERS)


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
    # disulfide-bonded cysteine (no HG; the SG-SG bond is added by the
    # topology builder from geometry).  amber94-class charges; SG absorbs
    # the residual so the template sums exactly to 0 (documented fallback).
    "CYX": {
        "atoms": {
            "N": ("N", -0.4157), "H": ("H", 0.2719),
            "CA": ("CT", 0.0429), "HA": ("H1", 0.0766),
            "CB": ("CT", -0.0790), "HB2": ("H1", 0.0950), "HB3": ("H1", 0.0950),
            "SG": ("S", -0.1161),
            "C": ("C", 0.5973), "O": ("O", -0.5679),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB2"), ("CB", "HB3"),
                          ("CB", "SG")] + _BB_C,
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
    # TIP3P water (rigid by default through ConstraintSet water triplets;
    # flexible bond/angle params exist as fallback)
    "HOH": {
        "atoms": {
            "O": ("OW", -0.834), "H1": ("HW", 0.417), "H2": ("HW", 0.417),
        },
        "bonds": [("O", "H1"), ("O", "H2")],
    },
    # monovalent counterions (parm99 IP/IM)
    "NA": {"atoms": {"NA": ("IP", 1.0)}, "bonds": [], "formal_charge": 1},
    "CL": {"atoms": {"CL": ("IM", -1.0)}, "bonds": [], "formal_charge": -1},
}


# --- remaining standard residues -------------------------------------------
# Charges follow the Cornell-type values; each template is validated (and,
# for the entries marked approximate, renormalized) against its formal
# charge at import time (see _normalize_templates below), so every built
# system carries an exactly integer total charge.

RESIDUES.update({
    "ASP": {
        "formal_charge": -1,
        "atoms": {
            "N": ("N", -0.5163), "H": ("H", 0.2936),
            "CA": ("CT", 0.0381), "HA": ("H1", 0.0880),
            "CB": ("CT", -0.0303), "HB2": ("HC", -0.0122), "HB3": ("HC", -0.0122),
            "CG": ("C", 0.7994), "OD1": ("O2", -0.8014), "OD2": ("O2", -0.8014),
            "C": ("C", 0.5366), "O": ("O", -0.5819),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB2"), ("CB", "HB3"),
                          ("CB", "CG"), ("CG", "OD1"), ("CG", "OD2")] + _BB_C,
    },
    "GLU": {
        "formal_charge": -1,
        "atoms": {
            "N": ("N", -0.5163), "H": ("H", 0.2936),
            "CA": ("CT", 0.0397), "HA": ("H1", 0.1105),
            "CB": ("CT", 0.0560), "HB2": ("HC", -0.0173), "HB3": ("HC", -0.0173),
            "CG": ("CT", 0.0136), "HG2": ("HC", -0.0425), "HG3": ("HC", -0.0425),
            "CD": ("C", 0.8054), "OE1": ("O2", -0.8188), "OE2": ("O2", -0.8188),
            "C": ("C", 0.5366), "O": ("O", -0.5819),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB2"), ("CB", "HB3"),
                          ("CB", "CG"), ("CG", "HG2"), ("CG", "HG3"),
                          ("CG", "CD"), ("CD", "OE1"), ("CD", "OE2")] + _BB_C,
    },
    "ASN": {
        "atoms": {
            "N": ("N", -0.4157), "H": ("H", 0.2719),
            "CA": ("CT", 0.0143), "HA": ("H1", 0.1048),
            "CB": ("CT", -0.2041), "HB2": ("HC", 0.0797), "HB3": ("HC", 0.0797),
            "CG": ("C", 0.7130), "OD1": ("O", -0.5931),
            "ND2": ("N", -0.9191), "HD21": ("H", 0.4196), "HD22": ("H", 0.4196),
            "C": ("C", 0.5973), "O": ("O", -0.5679),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB2"), ("CB", "HB3"),
                          ("CB", "CG"), ("CG", "OD1"),
                          ("CG", "ND2"), ("ND2", "HD21"), ("ND2", "HD22")] + _BB_C,
    },
    "GLN": {
        "atoms": {
            "N": ("N", -0.4157), "H": ("H", 0.2719),
            "CA": ("CT", -0.0031), "HA": ("H1", 0.0850),
            "CB": ("CT", -0.0036), "HB2": ("HC", 0.0171), "HB3": ("HC", 0.0171),
            "CG": ("CT", -0.0645), "HG2": ("HC", 0.0352), "HG3": ("HC", 0.0352),
            "CD": ("C", 0.6951), "OE1": ("O", -0.6086),
            "NE2": ("N", -0.9407), "HE21": ("H", 0.4251), "HE22": ("H", 0.4251),
            "C": ("C", 0.5973), "O": ("O", -0.5679),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB2"), ("CB", "HB3"),
                          ("CB", "CG"), ("CG", "HG2"), ("CG", "HG3"),
                          ("CG", "CD"), ("CD", "OE1"),
                          ("CD", "NE2"), ("NE2", "HE21"), ("NE2", "HE22")] + _BB_C,
    },
    "LYS": {
        "formal_charge": 1,
        "atoms": {
            "N": ("N", -0.3479), "H": ("H", 0.2747),
            "CA": ("CT", -0.2400), "HA": ("H1", 0.1426),
            "CB": ("CT", -0.0094), "HB2": ("HC", 0.0362), "HB3": ("HC", 0.0362),
            "CG": ("CT", 0.0187), "HG2": ("HC", 0.0103), "HG3": ("HC", 0.0103),
            "CD": ("CT", -0.0479), "HD2": ("HC", 0.0621), "HD3": ("HC", 0.0621),
            "CE": ("CT", -0.0143), "HE2": ("HP", 0.1135), "HE3": ("HP", 0.1135),
            "NZ": ("N3", -0.3854),
            "HZ1": ("H", 0.3400), "HZ2": ("H", 0.3400), "HZ3": ("H", 0.3400),
            "C": ("C", 0.7341), "O": ("O", -0.5894),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB2"), ("CB", "HB3"),
                          ("CB", "CG"), ("CG", "HG2"), ("CG", "HG3"),
                          ("CG", "CD"), ("CD", "HD2"), ("CD", "HD3"),
                          ("CD", "CE"), ("CE", "HE2"), ("CE", "HE3"),
                          ("CE", "NZ"), ("NZ", "HZ1"), ("NZ", "HZ2"),
                          ("NZ", "HZ3")] + _BB_C,
    },
    "ARG": {
        "formal_charge": 1,
        "atoms": {
            "N": ("N", -0.3479), "H": ("H", 0.2747),
            "CA": ("CT", -0.2637), "HA": ("H1", 0.1560),
            "CB": ("CT", -0.0007), "HB2": ("HC", 0.0327), "HB3": ("HC", 0.0327),
            "CG": ("CT", 0.0390), "HG2": ("HC", 0.0285), "HG3": ("HC", 0.0285),
            "CD": ("CT", 0.0486), "HD2": ("H1", 0.0687), "HD3": ("H1", 0.0687),
            "NE": ("N2", -0.5295), "HE": ("H", 0.3456),
            "CZ": ("CA", 0.8076),
            "NH1": ("N2", -0.8627), "HH11": ("H", 0.4478), "HH12": ("H", 0.4478),
            "NH2": ("N2", -0.8627), "HH21": ("H", 0.4478), "HH22": ("H", 0.4478),
            "C": ("C", 0.7341), "O": ("O", -0.5894),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB2"), ("CB", "HB3"),
                          ("CB", "CG"), ("CG", "HG2"), ("CG", "HG3"),
                          ("CG", "CD"), ("CD", "HD2"), ("CD", "HD3"),
                          ("CD", "NE"), ("NE", "HE"), ("NE", "CZ"),
                          ("CZ", "NH1"), ("NH1", "HH11"), ("NH1", "HH12"),
                          ("CZ", "NH2"), ("NH2", "HH21"), ("NH2", "HH22")] + _BB_C,
    },
    # neutral histidine, epsilon tautomer (Amber HIE; PDB name HIS)
    "HIS": {
        "atoms": {
            "N": ("N", -0.4157), "H": ("H", 0.2719),
            "CA": ("CT", -0.0581), "HA": ("H1", 0.1360),
            "CB": ("CT", -0.0074), "HB2": ("HC", 0.0367), "HB3": ("HC", 0.0367),
            "CG": ("CC", 0.1868),
            "ND1": ("NB", -0.5432),
            "CE1": ("CR", 0.1635), "HE1": ("H5", 0.1435),
            "NE2": ("NA", -0.2795), "HE2": ("H", 0.3339),
            "CD2": ("CW", -0.2207), "HD2": ("H4", 0.1862),
            "C": ("C", 0.5973), "O": ("O", -0.5679),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB2"), ("CB", "HB3"),
                          ("CB", "CG"), ("CG", "ND1"), ("ND1", "CE1"),
                          ("CE1", "HE1"), ("CE1", "NE2"), ("NE2", "HE2"),
                          ("NE2", "CD2"), ("CD2", "HD2"), ("CD2", "CG")] + _BB_C,
    },
    "PHE": {
        "atoms": {
            "N": ("N", -0.4157), "H": ("H", 0.2719),
            "CA": ("CT", -0.0024), "HA": ("H1", 0.0978),
            "CB": ("CT", -0.0343), "HB2": ("HC", 0.0295), "HB3": ("HC", 0.0295),
            "CG": ("CA", 0.0118),
            "CD1": ("CA", -0.1256), "HD1": ("HA", 0.1330),
            "CE1": ("CA", -0.1704), "HE1": ("HA", 0.1430),
            "CZ": ("CA", -0.1072), "HZ": ("HA", 0.1297),
            "CE2": ("CA", -0.1704), "HE2": ("HA", 0.1430),
            "CD2": ("CA", -0.1256), "HD2": ("HA", 0.1330),
            "C": ("C", 0.5973), "O": ("O", -0.5679),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB2"), ("CB", "HB3"),
                          ("CB", "CG"), ("CG", "CD1"), ("CD1", "HD1"),
                          ("CD1", "CE1"), ("CE1", "HE1"), ("CE1", "CZ"),
                          ("CZ", "HZ"), ("CZ", "CE2"), ("CE2", "HE2"),
                          ("CE2", "CD2"), ("CD2", "HD2"), ("CD2", "CG")] + _BB_C,
    },
    "TYR": {
        "atoms": {
            "N": ("N", -0.4157), "H": ("H", 0.2719),
            "CA": ("CT", -0.0014), "HA": ("H1", 0.0876),
            "CB": ("CT", -0.0152), "HB2": ("HC", 0.0295), "HB3": ("HC", 0.0295),
            "CG": ("CA", -0.0011),
            "CD1": ("CA", -0.1906), "HD1": ("HA", 0.1699),
            "CE1": ("CA", -0.2341), "HE1": ("HA", 0.1656),
            "CZ": ("CA", 0.3226),
            "OH": ("OH", -0.5579), "HH": ("HO", 0.3992),
            "CE2": ("CA", -0.2341), "HE2": ("HA", 0.1656),
            "CD2": ("CA", -0.1906), "HD2": ("HA", 0.1699),
            "C": ("C", 0.5973), "O": ("O", -0.5679),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB2"), ("CB", "HB3"),
                          ("CB", "CG"), ("CG", "CD1"), ("CD1", "HD1"),
                          ("CD1", "CE1"), ("CE1", "HE1"), ("CE1", "CZ"),
                          ("CZ", "OH"), ("OH", "HH"), ("CZ", "CE2"),
                          ("CE2", "HE2"), ("CE2", "CD2"), ("CD2", "HD2"),
                          ("CD2", "CG")] + _BB_C,
    },
    "TRP": {
        "atoms": {
            "N": ("N", -0.4157), "H": ("H", 0.2719),
            "CA": ("CT", -0.0275), "HA": ("H1", 0.1123),
            "CB": ("CT", -0.0050), "HB2": ("HC", 0.0339), "HB3": ("HC", 0.0339),
            "CG": ("C*", -0.1415),
            "CD1": ("CW", -0.1638), "HD1": ("H4", 0.2062),
            "NE1": ("NA", -0.3418), "HE1": ("H", 0.3412),
            "CE2": ("CN", 0.1380),
            "CZ2": ("CA", -0.2601), "HZ2": ("HA", 0.1572),
            "CH2": ("CA", -0.1134), "HH2": ("HA", 0.1417),
            "CZ3": ("CA", -0.1972), "HZ3": ("HA", 0.1447),
            "CE3": ("CA", -0.2387), "HE3": ("HA", 0.1700),
            "CD2": ("CB", 0.1243),
            "C": ("C", 0.5973), "O": ("O", -0.5679),
        },
        "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB2"), ("CB", "HB3"),
                          ("CB", "CG"), ("CG", "CD1"), ("CD1", "HD1"),
                          ("CD1", "NE1"), ("NE1", "HE1"), ("NE1", "CE2"),
                          ("CE2", "CZ2"), ("CZ2", "HZ2"), ("CZ2", "CH2"),
                          ("CH2", "HH2"), ("CH2", "CZ3"), ("CZ3", "HZ3"),
                          ("CZ3", "CE3"), ("CE3", "HE3"), ("CE3", "CD2"),
                          ("CD2", "CG"), ("CD2", "CE2")] + _BB_C,
    },
})

# delta tautomer (H on ND1): Amber HID
RESIDUES["HID"] = {
    "atoms": {
        "N": ("N", -0.4157), "H": ("H", 0.2719),
        "CA": ("CT", 0.0188), "HA": ("H1", 0.0881),
        "CB": ("CT", -0.0462), "HB2": ("HC", 0.0402), "HB3": ("HC", 0.0402),
        "CG": ("CC", -0.0266),
        "ND1": ("NA", -0.3811), "HD1": ("H", 0.3649),
        "CE1": ("CR", 0.2057), "HE1": ("H5", 0.1392),
        "NE2": ("NB", -0.5727),
        "CD2": ("CV", 0.1292), "HD2": ("H4", 0.1147),
        "C": ("C", 0.5973), "O": ("O", -0.5679),
    },
    "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB2"), ("CB", "HB3"),
                      ("CB", "CG"), ("CG", "ND1"), ("ND1", "HD1"),
                      ("ND1", "CE1"), ("CE1", "HE1"), ("CE1", "NE2"),
                      ("NE2", "CD2"), ("CD2", "HD2"), ("CD2", "CG")] + _BB_C,
}

# doubly protonated histidine (+1): Amber HIP
RESIDUES["HIP"] = {
    "formal_charge": 1,
    "atoms": {
        "N": ("N", -0.3479), "H": ("H", 0.2747),
        "CA": ("CT", -0.1354), "HA": ("H1", 0.1212),
        "CB": ("CT", -0.0414), "HB2": ("HC", 0.0810), "HB3": ("HC", 0.0810),
        "CG": ("CC", -0.0012),
        "ND1": ("NA", -0.1513), "HD1": ("H", 0.3866),
        "CE1": ("CR", -0.0170), "HE1": ("H5", 0.2681),
        "NE2": ("NA", -0.1718), "HE2": ("H", 0.3911),
        "CD2": ("CW", -0.1141), "HD2": ("H4", 0.2317),
        "C": ("C", 0.7341), "O": ("O", -0.5894),
    },
    "bonds": _BB_N + [("CA", "HA"), ("CA", "CB"), ("CB", "HB2"), ("CB", "HB3"),
                      ("CB", "CG"), ("CG", "ND1"), ("ND1", "HD1"),
                      ("ND1", "CE1"), ("CE1", "HE1"), ("CE1", "NE2"),
                      ("NE2", "HE2"), ("NE2", "CD2"), ("CD2", "HD2"),
                      ("CD2", "CG")] + _BB_C,
}

# PDB tautomer aliases
RESIDUES["HIE"] = RESIDUES["HIS"]


def _normalize_templates():
    """Validate template charge sums against the formal charge; distribute
    any residual uniformly over heavy atoms (keeps totals exactly integer —
    entries that close to <1e-3 are untouched)."""
    for name, tmpl in RESIDUES.items():
        formal = float(tmpl.get("formal_charge", 0))
        atoms = tmpl["atoms"]
        s = sum(q for _, q in atoms.values())
        resid = s - formal
        if abs(resid) < 1e-3:
            continue
        heavy = [a for a, (t, q) in atoms.items() if not t.startswith("H")]
        corr = resid / len(heavy)
        for a in heavy:
            t, q = atoms[a]
            atoms[a] = (t, q - corr)


_normalize_templates()


# --- terminal residue variants ----------------------------------------------

def make_nterminal(resname: str):
    """N-terminal variant: NH3+ (type N3) replaces the backbone N-H.
    Registered as 'N<resname>' (Amber convention).  Charges: standard
    N-terminal aminium charges on the new atoms; the rest inherited and
    renormalized to formal charge + 1."""
    import copy
    base = RESIDUES[resname]
    t = copy.deepcopy(base)
    atoms, bonds = t["atoms"], t["bonds"]
    if "N" not in atoms:
        raise ValueError(f"{resname} has no backbone N")
    atoms["N"] = ("N3", 0.1414)
    atoms.pop("H", None)
    for h in ("H1", "H2", "H3"):
        atoms[h] = ("H", 0.1997)
    # alpha hydrogens next to N3 use HP
    for ha in ("HA", "HA2", "HA3"):
        if ha in atoms:
            atoms[ha] = ("HP", atoms[ha][1])
    t["bonds"] = [b for b in bonds if b != ("N", "H")] + [
        ("N", "H1"), ("N", "H2"), ("N", "H3")]
    t["formal_charge"] = base.get("formal_charge", 0) + 1
    RESIDUES["N" + resname] = t
    _normalize_one(t)
    return t


def make_cterminal(resname: str):
    """C-terminal variant: carboxylate C(=O)O- with OXT.  Registered as
    'C<resname>'; formal charge - 1."""
    import copy
    base = RESIDUES[resname]
    t = copy.deepcopy(base)
    atoms = t["atoms"]
    atoms["O"] = ("O2", -0.8055)
    atoms["OXT"] = ("O2", -0.8055)
    tC, qC = atoms["C"]
    atoms["C"] = (tC, 0.7731)
    t["bonds"] = t["bonds"] + [("C", "OXT")]
    t["formal_charge"] = base.get("formal_charge", 0) - 1
    RESIDUES["C" + resname] = t
    _normalize_one(t)
    return t


def _normalize_one(tmpl):
    formal = float(tmpl.get("formal_charge", 0))
    atoms = tmpl["atoms"]
    s = sum(q for _, q in atoms.values())
    resid = s - formal
    heavy = [a for a, (ty, q) in atoms.items() if not ty.startswith("H")]
    corr = resid / len(heavy)
    for a in heavy:
        ty, q = atoms[a]
        atoms[a] = (ty, q - corr)


for _r in list(RESIDUES):
    if _r in ("ACE", "NME", "NHE", "HIE"):
        continue
    try:
        make_nterminal(_r)
        make_cterminal(_r)
    except (ValueError, KeyError):
        pass


def register_residue(name: str, atoms: dict, bonds: list,
                     formal_charge: int = 0, atom_types: dict = None,
                     bond_params: dict = None, angle_params: dict = None,
                     dihedral_params: dict = None, normalize: bool = True):
    """Register a custom residue template (ligands, modified amino acids).

    The reference parameterizes small molecules through external tooling
    (openmmforcefields/GAFF, ``src/simulators/mopenmm.py:30-50``); here
    the user supplies the parameters explicitly:

    - ``atoms``: {atom_name: (atom_type, partial_charge)}
    - ``bonds``: [(name_a, name_b), ...] intra-residue bonds
    - ``atom_types``: new LJ types {type: (mass_amu, rmin_half_A, eps_kcal)}
    - ``bond_params``: {(t1, t2): (K_kcal_A2, r0_A)}
    - ``angle_params``: {(t1, t2, t3): (K_kcal_rad2, theta0_deg)}
    - ``dihedral_params``: {(t1, t2, t3, t4): [(pk, phase_deg, n), ...]}
      ("X" wildcards allowed, Amber most-specific-match rule)
    - ``normalize``: spread any residual charge over heavy atoms so the
      template sums exactly to ``formal_charge``

    Angles/dihedrals are derived from the bond graph automatically; any
    missing parameters fall back with a warning (see ``lookup_angle``).
    If the residue has backbone N/H/CA/C/O atoms, N- and C-terminal
    variants are generated too.
    """
    # validate everything before touching any shared table (a failed
    # registration must not leave the global force field polluted)
    missing = ({t for t, _ in atoms.values()}
               - set(ATOM_TYPES) - set(atom_types or {}))
    if missing:
        raise ValueError(f"unknown atom types {sorted(missing)}; pass them "
                         f"via atom_types")
    names = set(atoms)
    for a, b in bonds:
        if a not in names or b not in names:
            raise ValueError(f"bond ({a}, {b}) references unknown atoms")
    for table, new in ((ATOM_TYPES, atom_types), (BONDS, bond_params),
                       (ANGLES, angle_params), (DIHEDRALS, dihedral_params)):
        if new:
            table.update(new)
    tmpl = {"atoms": dict(atoms), "bonds": list(bonds),
            "formal_charge": formal_charge}
    RESIDUES[name] = tmpl
    if normalize:
        _normalize_one(tmpl)
    if {"N", "H", "CA", "C", "O"} <= names:
        try:
            make_nterminal(name)
            make_cterminal(name)
        except (ValueError, KeyError):
            pass
    return tmpl


def lj_params(atom_type: str):
    """(rmin_half [A], eps [kcal/mol])."""
    m, r, e = ATOM_TYPES[atom_type]
    return r, e


def mass(atom_type: str):
    return ATOM_TYPES[atom_type][0]


_warned = set()


def _warn_once(msg):
    if msg not in _warned:
        _warned.add(msg)
        import warnings
        warnings.warn(msg)


def lookup_bond(t1, t2):
    k = BONDS.get((t1, t2)) or BONDS.get((t2, t1))
    if k is None:
        _warn_once(f"no bond parameters for {t1}-{t2}; using generic fallback")
        return _BOND_FALLBACK
    return k


def lookup_angle(t1, t2, t3):
    k = ANGLES.get((t1, t2, t3)) or ANGLES.get((t3, t2, t1))
    if k is None:
        fb = (_ANGLE_FALLBACK_SP2 if t2 in _SP2_TYPES
              else _ANGLE_FALLBACK_SP3)
        _warn_once(f"no angle parameters for {t1}-{t2}-{t3}; "
                   f"using {fb[1]:.1f} deg fallback")
        return fb
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
    """Improper lookup with central atom third (Amber convention).  The two
    peripheral slots (t1, t2) match in either order; exact matches win over
    wildcard entries (peripheral slot order is not energetically significant
    for the 180-deg/n=2 planarity terms)."""
    for key in ((t1, t2, tc, t4), (t2, t1, tc, t4)):
        if key in IMPROPERS:
            return IMPROPERS[key]
    for key, val in IMPROPERS.items():
        k1, k2, kc, k4 = key
        if kc != tc or k4 not in ("X", t4):
            continue
        if ((k1 in ("X", t1) and k2 in ("X", t2))
                or (k1 in ("X", t2) and k2 in ("X", t1))):
            return val
    return None
