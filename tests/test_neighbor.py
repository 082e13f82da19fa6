"""Cell-list neighbor engine (md/neighbor.py): parity with the dense
all-pairs path, sparse-only system routing, end-to-end dynamics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isokann_tpu as itk
from isokann_tpu.md import forces as Fd
from isokann_tpu.md.neighbor import (
    NeighborPlan, neighbor_nonbonded_energy, neighbor_nonbonded_force,
    bonded_energy_sparse, bonded_force_sparse, force_neighbor,
    potential_energy_neighbor,
)


@pytest.fixture(scope="module")
def solvated():
    return itk.MDSimulation(addwater=True, padding=0.9, steps=3)


@pytest.fixture(scope="module")
def xcoords(solvated):
    rng = np.random.default_rng(0)
    s = solvated.system
    return jnp.asarray(np.asarray(solvated.coords).reshape(-1, 3)
                       + rng.normal(scale=0.003, size=(s.natoms, 3)),
                       jnp.float32)


def test_table_covers_all_atoms(solvated, xcoords):
    s = solvated.system
    plan = NeighborPlan(s, x0=np.asarray(xcoords))
    box = jnp.asarray(plan.box, jnp.float32)
    xw = xcoords - box * jnp.floor(xcoords / box)
    table, dropped = plan.table(xw)
    assert int(dropped) == 0
    entries = np.asarray(table).ravel()
    real = np.sort(entries[entries < s.natoms])
    assert np.array_equal(real, np.arange(s.natoms))


def test_energy_matches_dense(solvated, xcoords):
    s = solvated.system
    plan = NeighborPlan(s, x0=np.asarray(xcoords))
    e_ref = float(Fd.nonbonded_energy(s, xcoords))
    e_new = float(neighbor_nonbonded_energy(s, xcoords, plan))
    assert abs(e_ref - e_new) / abs(e_ref) < 1e-5


def test_force_matches_dense(solvated, xcoords):
    s = solvated.system
    plan = NeighborPlan(s, x0=np.asarray(xcoords))
    f_ref = np.asarray(-jax.grad(
        lambda z: Fd.nonbonded_energy(s, z))(xcoords))
    f_new = np.asarray(neighbor_nonbonded_force(s, xcoords, plan))
    assert np.abs(f_ref - f_new).max() / np.abs(f_ref).max() < 1e-5


def test_bonded_sparse_matches_incidence(solvated, xcoords):
    s = solvated.system
    e_ref = float(Fd.bond_energy(s, xcoords) + Fd.angle_energy(s, xcoords)
                  + Fd.dihedral_energy(s, xcoords))
    assert abs(e_ref - float(bonded_energy_sparse(s, xcoords))) < 1e-3
    f_ref = np.asarray(-jax.grad(lambda z: (
        Fd.bond_energy(s, z) + Fd.angle_energy(s, z)
        + Fd.dihedral_energy(s, z)))(xcoords))
    f_new = np.asarray(bonded_force_sparse(s, xcoords))
    assert np.abs(f_ref - f_new).max() / np.abs(f_ref).max() < 1e-5


def test_total_matches_dense(solvated, xcoords):
    s = solvated.system
    plan = NeighborPlan(s, x0=np.asarray(xcoords))
    f_ref = np.asarray(Fd.force(s, xcoords))
    f_new = np.asarray(force_neighbor(s, xcoords, plan))
    assert np.abs(f_ref - f_new).max() / np.abs(f_ref).max() < 1e-5
    e_ref = float(Fd.potential_energy(s, xcoords))
    e_new = float(potential_energy_neighbor(s, xcoords, plan))
    assert abs(e_ref - e_new) / abs(e_ref) < 1e-5


@pytest.mark.slow
def test_sparse_only_build_routes(solvated, xcoords):
    """A dense_pairs=False build of the same structure produces identical
    forces through the public force_flat/potential_energy entry points."""
    from isokann_tpu.md.system import build_system
    s_dense = solvated.system
    s_sparse = build_system(solvated.structure, dense_pairs=False)
    assert not s_sparse.dense_pairs
    assert s_sparse.qq_scale.shape == (0, 0)
    assert s_sparse.bond_D.shape[0] == 0
    xf = xcoords.reshape(1, -1)
    f_ref = np.asarray(Fd.force_flat(s_dense, xf))
    f_new = np.asarray(Fd.force_flat(s_sparse, xf))
    assert np.abs(f_ref - f_new).max() / np.abs(f_ref).max() < 1e-5
    e_ref = float(Fd.potential_energy_flat(s_dense, xf)[0])
    e_new = float(Fd.potential_energy_flat(s_sparse, xf)[0])
    assert abs(e_ref - e_new) / abs(e_ref) < 1e-5


@pytest.mark.slow
def test_sparse_simulation_dynamics(monkeypatch):
    """MDSimulation auto-switches to the neighbor engine above the
    threshold; short constrained dynamics stays finite with rigid water."""
    from isokann_tpu.md import system as S
    monkeypatch.setattr(S, "DENSE_PAIRS_MAX", 100)
    sim = itk.MDSimulation(addwater=True, padding=0.55, steps=5)
    assert not sim.system.dense_pairs
    ys = sim.propagate(jnp.tile(sim.coords[None], (2, 1)), 2)
    assert np.all(np.isfinite(np.asarray(ys)))
    # water constraints hold through the neighbor-engine dynamics
    viol = float(sim.constraint_set.max_violation(np.asarray(ys).reshape(
        -1, sim.dim)))
    assert viol < 1e-3
    # energy diagnostics route through the neighbor engine too
    e = np.asarray(sim.potential(np.asarray(ys).reshape(-1, sim.dim)))
    assert np.all(np.isfinite(e))


def test_overflow_diagnostic(solvated, xcoords):
    s = solvated.system
    plan = NeighborPlan(s, capacity=8)     # deliberately too small
    assert plan.overflow(xcoords.reshape(1, -1)) > 0


def test_pallas_sweep_matches_xla(solvated, xcoords):
    """VMEM pair-block kernel (interpret mode) == XLA sweep, non-Newton
    small-box plan."""
    from isokann_tpu.md.neighbor import neighbor_sweep_pallas, _sweep
    s = solvated.system
    plan = NeighborPlan(s, x0=np.asarray(xcoords))
    xb = jnp.stack([xcoords.reshape(-1), xcoords.reshape(-1) + 0.001])
    f_ref = np.asarray(jax.vmap(
        lambda xi: _sweep(s, plan, xi.reshape(-1, 3), True))(xb)
    ).reshape(2, -1)
    f_new = np.asarray(neighbor_sweep_pallas(s, plan, xb, interpret=True))
    assert np.abs(f_ref - f_new).max() / np.abs(f_ref).max() < 1e-5


@pytest.mark.slow
def test_pallas_sweep_newton_matches_xla():
    """Newton (half-stencil + inverse-permutation reaction) kernel parity
    on a box with >= 5 cells per dim."""
    from isokann_tpu.md.neighbor import neighbor_sweep_pallas, _sweep
    sim = itk.MDSimulation(addwater=True, padding=1.2, steps=3)
    s = sim.system
    plan = NeighborPlan(s, x0=np.asarray(sim.coords).reshape(-1, 3),
                        cell_div=2)
    assert plan.newton
    x = jnp.asarray(np.asarray(sim.coords).reshape(1, -1), jnp.float32)
    f_ref = np.asarray(jax.vmap(
        lambda xi: _sweep(s, plan, xi.reshape(-1, 3), True))(x)).reshape(1, -1)
    f_new = np.asarray(neighbor_sweep_pallas(s, plan, x, interpret=True))
    assert np.abs(f_ref - f_new).max() / np.abs(f_ref).max() < 1e-5


def test_overflow_safety_net(monkeypatch):
    """Density drift beyond the cell capacity triggers the warn + regrow +
    program-eviction path in MDSimulation."""
    import warnings
    from isokann_tpu.md import system as S
    from isokann_tpu.md.neighbor import NeighborPlan

    monkeypatch.setattr(S, "DENSE_PAIRS_MAX", 100)
    sim = itk.MDSimulation(addwater=True, padding=0.55, steps=2)
    # inject a deliberately under-sized plan
    sim._nbplan = NeighborPlan(sim.system, capacity=8)
    sim._jit_cache[("prop", 8, 2, False, "langevin", False, None)] = "stale"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sim._check_cell_overflow(np.tile(np.asarray(sim.coords)[None], (3, 1)))
    assert any("overflow" in str(x.message) for x in w)
    assert sim._nbplan.C > 8
    assert ("prop", 8, 2, False, "langevin", False, None) not in sim._jit_cache
    # NaN frames must not crash the check
    bad = np.full((2, sim.dim), np.nan, np.float32)
    sim._check_cell_overflow(bad)      # no exception
    # subsequent propagation works on the regrown plan
    ys = sim.propagate(np.tile(np.asarray(sim.coords)[None], (2, 1)), 1)
    assert np.isfinite(np.asarray(ys)).all()


def test_sparse_sim_save_load_roundtrip(tmp_path, monkeypatch):
    """Solvated sparse-system Iso checkpoints rebuild the neighbor plan and
    keep training after load."""
    from isokann_tpu.md import system as S
    monkeypatch.setattr(S, "DENSE_PAIRS_MAX", 100)
    sim = itk.MDSimulation(addwater=True, padding=0.55, steps=2)
    iso = itk.Iso(sim=sim, nx=4, nk=2, key=0, opt=itk.AdamRegularized())
    iso.run(3)
    p = str(tmp_path / "iso.pkl")
    iso.save(p)
    iso2 = itk.load(p)
    assert not iso2.data.sim.system.dense_pairs
    iso2.run(2)
    assert np.isfinite(iso2.losses).all() and len(iso2.losses) == 5
    ys = iso2.data.sim.propagate(np.tile(np.asarray(sim.coords)[None],
                                         (2, 1)), 1)
    assert np.isfinite(np.asarray(ys)).all()


def test_far_exclusion_partners(solvated, xcoords):
    """Hard exclusions beyond the 32-index bitmask window (disulfide-like)
    route through the narrow far-partner table; parity with the dense path."""
    s = solvated.system
    n = s.natoms
    i, j = 0, n - 5                        # far-apart artificial exclusion
    eidx = np.concatenate([np.asarray(s.excl_idx), [[i, j]]]).astype(np.int32)
    eqq = np.concatenate([np.asarray(s.excl_qq), [0.0]])
    elj = np.concatenate([np.asarray(s.excl_lj), [0.0]])
    qq = np.asarray(s.qq_scale).copy()
    lj = np.asarray(s.lj_scale).copy()
    qq[i, j] = qq[j, i] = 0.0
    lj[i, j] = lj[j, i] = 0.0
    s2 = dataclasses.replace(
        s, excl_idx=jnp.asarray(eidx), excl_qq=jnp.asarray(eqq),
        excl_lj=jnp.asarray(elj), qq_scale=jnp.asarray(qq, jnp.float32),
        lj_scale=jnp.asarray(lj, jnp.float32))
    plan = NeighborPlan(s2, x0=np.asarray(xcoords))
    assert int((np.asarray(plan.excl_far) >= 0).sum()) == 2
    e_ref = float(Fd.nonbonded_energy(s2, xcoords))
    e_new = float(neighbor_nonbonded_energy(s2, xcoords, plan))
    assert abs(e_ref - e_new) / abs(e_ref) < 1e-5
    f_ref = np.asarray(-jax.grad(lambda z: Fd.nonbonded_energy(s2, z))(xcoords))
    f_new = np.asarray(neighbor_nonbonded_force(s2, xcoords, plan))
    assert np.abs(f_ref - f_new).max() / np.abs(f_ref).max() < 1e-5
