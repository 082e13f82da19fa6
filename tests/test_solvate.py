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


def test_biased_constrained_aboba(key):
    """Girsanov ABOBA honors constraints (rigid water / HBonds)."""
    bias = lambda q, t, sigma, F: 0.01 * jnp.ones_like(q)
    sim = itk.MDSimulation(steps=5, constraints="HBonds", bias=bias)
    ws = sim.propagate(jnp.tile(sim.coords[None], (2, 1)), 1, key=key)
    viol = float(sim.constraint_set.max_violation(
        ws.values.reshape(-1, sim.dim)))
    assert viol < 1e-4
    assert bool(jnp.all(ws.weights > 0))


def test_nonpolymer_chain_break(tmp_path):
    """Waters/ions sharing the protein's chain id still terminate the
    peptide chain (reference ``villin water.pdb`` layout)."""
    from isokann_tpu.md.fixtures import build_peptide
    from isokann_tpu.md.pdbio import write_pdb, read_pdb
    from isokann_tpu.md.topology import build_topology

    s = build_peptide("AG", capped=False)     # zwitterion: needs CGLY match
    n = s.natoms
    s.atom_names += ["O", "H1", "H2"]
    s.res_names += ["HOH"] * 3
    s.res_ids += [max(s.res_ids) + 1] * 3
    s.chain_ids += [s.chain_ids[0]] * 3       # same chain id as the protein
    s.elements += ["O", "H", "H"]
    w = np.array([[1.5, 0, 0], [1.59, 0, 0], [1.47, 0.09, 0]])
    s.coords = np.concatenate([s.coords, s.coords.mean(0) + w + 2.0])
    p = str(tmp_path / "agw.pdb")
    write_pdb(p, s)
    top = build_topology(read_pdb(p))
    names = [r.name for r in top.residues]
    assert names == ["NALA", "CGLY", "HOH"]


def test_solvated_iso_roundtrip(tmp_path, wsim, key):
    """Iso on a solvated sim trains and save/load round-trips the exact
    solvated structure (waters, box, constraints)."""
    iso = itk.Iso(sim=wsim, nx=4, nk=1, key=0)
    iso.run(3)
    p = str(tmp_path / "iso.pkl")
    iso.save(p)
    iso2 = itk.load(p)
    s2 = iso2.data.sim
    assert s2.natoms == wsim.natoms
    assert np.allclose(np.asarray(s2.coords), np.asarray(wsim.coords))
    assert s2.constraint_set.ncons == wsim.constraint_set.ncons
    iso2.run(2)


def test_water_fast_path_any_atom_order(tmp_path):
    """The contiguous-water constraint fast path must map O/H roles by
    position, not assume O-first (regression: H1,H2,O ordering got the
    H-H distance assigned to an O-H pair)."""
    from isokann_tpu.md.fixtures import alanine_dipeptide_pdb
    from isokann_tpu.md.pdbio import read_pdb, write_pdb
    from isokann_tpu.md.solvate import solvate, R_OH

    struct = solvate(read_pdb(alanine_dipeptide_pdb()), padding=0.5)
    # permute every water block to (H1, H2, O)
    order = []
    i = 0
    while i < struct.natoms:
        if struct.res_names[i] == "HOH":
            order += [i + 1, i + 2, i]
            i += 3
        else:
            order.append(i)
            i += 1
    for attr in ("atom_names", "res_names", "res_ids", "chain_ids",
                 "elements"):
        setattr(struct, attr, [getattr(struct, attr)[k] for k in order])
    struct.coords = struct.coords[order]
    p = str(tmp_path / "hho.pdb")
    write_pdb(p, struct)
    sim = itk.MDSimulation(pdb=p, steps=2)
    cs = sim.constraint_set
    assert cs.nwater > 0                      # fast path engaged
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(np.asarray(sim.coords)[None], jnp.float32)
    x = x0 + jnp.asarray(rng.normal(scale=2e-3, size=x0.shape), jnp.float32)
    xs = cs.shake(x0, x)
    assert float(cs.max_violation(xs)) < 1e-5
    # O-H distances really are R_OH (not the H-H length)
    from isokann_tpu.md.solvate import water_triplets
    trip = water_triplets(sim.structure)
    xr = np.asarray(xs).reshape(-1, 3)
    doh = np.linalg.norm(xr[trip[:, 0]] - xr[trip[:, 1]], axis=-1)
    assert np.allclose(doh, R_OH, atol=1e-5)
