"""Explicit solvent: TIP3P box construction, counterions, rigid water,
periodic reaction-field dynamics (reference ``modeller.addSolvent``,
``src/simulators/mopenmm.py:59-66``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isokann_tpu as itk
from isokann_tpu.md.solvate import solvate, water_triplets, WATER_SPACING


@pytest.fixture(scope="module")
def wsim():
    return itk.MDSimulation(addwater=True, padding=0.55, steps=3)


def test_solvated_system(wsim):
    s = wsim.system
    assert s.method == "CutoffPeriodic"
    assert s.box is not None and min(s.box) > 1.0
    assert abs(float(jnp.sum(s.charges))) < 1e-5
    nwat = sum(1 for r in wsim.structure.res_names if r == "HOH") // 3
    assert nwat > 50
    # solute atoms keep their leading indices
    assert wsim.structure.atom_names[:4] == ["HH31", "CH3", "HH32", "HH33"]


def test_density_reasonable():
    from isokann_tpu.md.fixtures import alanine_dipeptide_pdb
    from isokann_tpu.md.pdbio import read_pdb
    struct = solvate(read_pdb(alanine_dipeptide_pdb()), padding=0.8)
    nwat = sum(1 for r in struct.res_names if r == "HOH") // 3
    vol = float(np.prod(struct.box))
    # lattice density minus the solute exclusion shell
    assert 22.0 < nwat / vol < 36.0


def test_counterions_neutralize(tmp_path):
    """A +2 solute (two lysines, zwitterionic backbone) gets 2 Cl-."""
    from isokann_tpu.md.fixtures import build_peptide
    from isokann_tpu.md.pdbio import write_pdb

    s = build_peptide("KK")
    p = str(tmp_path / "kk.pdb")
    write_pdb(p, s)
    solv = solvate(__import__("isokann_tpu").md.pdbio.read_pdb(p),
                   padding=0.55)
    assert sum(1 for r in solv.res_names if r == "CL") == 2
    assert sum(1 for r in solv.res_names if r == "NA") == 0
    sim = itk.MDSimulation(pdb=p, addwater=True, padding=0.55, steps=3)
    assert abs(float(jnp.sum(sim.system.charges))) < 1e-5


def test_ionic_strength():
    from isokann_tpu.md.fixtures import alanine_dipeptide_pdb
    from isokann_tpu.md.pdbio import read_pdb
    struct = solvate(read_pdb(alanine_dipeptide_pdb()), padding=0.8,
                     ionic_strength=0.5)
    nna = sum(1 for r in struct.res_names if r == "NA")
    ncl = sum(1 for r in struct.res_names if r == "CL")
    assert nna == ncl and nna >= 2


def test_rigid_water_constraints(wsim):
    nwat = sum(1 for r in wsim.structure.res_names if r == "HOH") // 3
    # constraints=None -> only the 3 rigid-water distances per water
    assert wsim.constraint_set.ncons == 3 * nwat
    trip = water_triplets(wsim.structure)
    assert trip.shape == (nwat, 3)


def test_solute_only_default_features(wsim):
    x = jnp.tile(wsim.coords[None], (2, 1))
    f = np.asarray(wsim.featurizer(x))
    assert f.shape == (2, 22 * 21 // 2)


def test_propagate_rigid_periodic(wsim, key):
    x0 = jnp.tile(wsim.coords[None], (2, 1))
    ys = wsim.propagate(x0, 1, key=key)
    y = ys[:, 0, :]
    assert bool(jnp.all(jnp.isfinite(y)))
    assert float(wsim.constraint_set.max_violation(y)) < 1e-4


def test_flexible_water_brownian_warns(tmp_path):
    from isokann_tpu.md.fixtures import alanine_dipeptide_pdb
    with pytest.warns(UserWarning, match="rigid water"):
        sim = itk.MDSimulation(pdb=alanine_dipeptide_pdb(), addwater=True,
                               padding=0.55, steps=2, integrator="brownian")
    assert sim.constraint_set is None
