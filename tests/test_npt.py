"""NPT / Monte Carlo barostat (md/barostat.py, docs/npt_design.md).

Reference counterpart: OpenMM MonteCarloBarostat + barostat box handling
(``src/simulators/mopenmm.py:204-212``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isokann_tpu as itk
from isokann_tpu.md.barostat import (MonteCarloBarostat, molecule_map,
                                     npt_langevin)
from isokann_tpu.md.forces import potential_energy


@pytest.fixture(scope="module")
def water_sim():
    # flexible water needs a 1 fs step (no constraints inside the NPT scan)
    return itk.MDSimulation(addwater=True, padding=0.62, steps=5,
                            rigidwater=False, integrator="langevin",
                            step=0.001)


def test_molecule_map(water_sim):
    mol = molecule_map(water_sim.system)
    # solute (1 molecule) + waters (+ any ions): every water triple shares
    # an id, ids are contiguous
    assert mol.min() == 0
    sizes = np.bincount(mol)
    assert (sizes == 3).sum() > 50          # waters
    assert sizes.max() == 22                # the alanine dipeptide


def test_traced_box_energy_matches_static(water_sim):
    """potential_energy(sys, x, box=sys.box) == potential_energy(sys, x)
    bitwise-close: the traced-box path reproduces the static one."""
    s = water_sim.system
    x = jnp.asarray(np.asarray(water_sim.coords).reshape(-1, 3))
    e0 = float(potential_energy(s, x))
    e1 = float(potential_energy(s, x, box=jnp.asarray(s.box)))
    assert abs(e0 - e1) < 1e-3 + 1e-6 * abs(e0)


def test_traced_box_energy_matches_rebuilt_system(water_sim):
    """Scaling the box via the traced argument equals building a system
    with the scaled static box (molecule positions fixed)."""
    from isokann_tpu.md.system import build_system
    import dataclasses

    s = water_sim.system
    x = jnp.asarray(np.asarray(water_sim.coords).reshape(-1, 3))
    f = 1.03
    box2 = tuple(b * f for b in s.box)
    s2 = dataclasses.replace(s, box=box2)
    e_traced = float(potential_energy(s, x, box=jnp.asarray(box2)))
    e_static = float(potential_energy(s2, x))
    assert abs(e_traced - e_static) < 1e-2 + 1e-5 * abs(e_static)


def test_mc_move_runs_and_scales_molecules(water_sim):
    s = water_sim.system
    baro = MonteCarloBarostat(s, pressure=1.0, temp=300.0)
    x = jnp.asarray(np.asarray(water_sim.coords).reshape(-1, 3))
    state = baro.init_state()
    key = jax.random.PRNGKey(0)
    xs, st = jax.jit(baro.move)(key, x, state)
    assert np.isfinite(np.asarray(xs)).all()
    assert int(st[2]) == 1                      # attempted
    # intramolecular geometry is preserved exactly (centers scale)
    mol = molecule_map(s)
    w0 = np.where(mol == mol[-1])[0]            # last water
    d0 = np.asarray(x)[w0[0]] - np.asarray(x)[w0[1]]
    d1 = np.asarray(xs)[w0[0]] - np.asarray(xs)[w0[1]]
    assert np.allclose(d0, d1, atol=1e-6)


@pytest.mark.slow
def test_ideal_gas_volume_statistics(water_sim):
    """Exact statistical-mechanics anchor for the acceptance rule: with
    all nonbonded interactions zeroed, center-scaled volume moves have
    dU = 0 (bonded terms are scale-invariant under molecule-center
    scaling), so the MC barostat samples the ideal-gas NPT distribution
    with <V> = (N_mol + 1) kT / P."""
    import dataclasses

    s = water_sim.system
    nz = s.charges.shape[0]
    ideal = dataclasses.replace(
        s, charges=jnp.zeros(nz), eps=jnp.zeros(nz),
        qq_scale=jnp.zeros_like(s.qq_scale),
        lj_scale=jnp.zeros_like(s.lj_scale))
    T, P_bar = 300.0, 1000.0     # high pressure keeps <V> near the start
    baro = MonteCarloBarostat(ideal, pressure=P_bar, temp=T)
    x = jnp.asarray(np.asarray(water_sim.coords).reshape(-1, 3))

    def step(carry, key):
        x, st = carry
        x, st = baro.move(key, x, st)
        return (x, st), jnp.prod(st[0])

    nmoves = 3000
    (xf, st), vols = jax.lax.scan(
        step, (x, baro.init_state()), jax.random.split(
            jax.random.PRNGKey(0), nmoves))
    vols = np.asarray(vols)
    from isokann_tpu.md.system import KB
    v_expect = (baro.nmol + 1) * KB * T / (P_bar * 0.0602214076)
    v_mean = float(vols[nmoves // 2:].mean())
    assert np.isfinite(vols).all()
    assert abs(v_mean / v_expect - 1.0) < 0.2, (v_mean, v_expect)


def test_npt_dynamics_bounded(water_sim):
    """End-to-end NPT on the (unequilibrated, over-pressurized lattice)
    water box: volume moves fire and adapt, dynamics stay finite, and the
    volume change per short run stays physical (no runaway)."""
    xf, box_f, info = npt_langevin(water_sim, key=jax.random.PRNGKey(2),
                                   steps=400, interval=20, pressure=1.0)
    assert np.isfinite(np.asarray(xf)).all()
    assert info["attempted"] == 20
    assert 0 < info["accepted"] <= info["attempted"]
    V0 = float(np.prod(water_sim.system.box))
    Vf = float(np.prod(np.asarray(box_f)))
    assert 0.6 < Vf / V0 < 1.7, (Vf, V0)


# --------------------------------------------------------------------------
# traced-box O(n) neighbor path (docs/npt_design.md round-3 item, pulled in)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sparse_sim():
    import dataclasses
    from isokann_tpu.md.system import build_system

    base = itk.MDSimulation(addwater=True, padding=0.9, steps=3)
    s = build_system(base.structure, dense_pairs=False)
    return base, s


def test_traced_box_neighbor_matches_static(sparse_sim):
    from isokann_tpu.md.neighbor import (NeighborPlan,
                                         potential_energy_neighbor)

    base, s = sparse_sim
    x = jnp.asarray(np.asarray(base.coords).reshape(-1, 3))
    plan = NeighborPlan(s, x0=np.asarray(x), box_slack=0.1)
    e0 = float(potential_energy_neighbor(s, x, plan))
    e1 = float(potential_energy_neighbor(s, x, plan,
                                         box=jnp.asarray(s.box)))
    assert abs(e0 - e1) < 1e-3 + 1e-6 * abs(e0)


@pytest.mark.slow
def test_traced_box_neighbor_matches_rebuilt(sparse_sim):
    """Scaled box through the traced argument == dense system rebuilt at
    the scaled static box (same static stencil thanks to box_slack)."""
    import dataclasses
    from isokann_tpu.md import forces as Fd
    from isokann_tpu.md.neighbor import (NeighborPlan,
                                         potential_energy_neighbor,
                                         force_neighbor)

    base, s = sparse_sim
    x = jnp.asarray(np.asarray(base.coords).reshape(-1, 3))
    plan = NeighborPlan(s, x0=np.asarray(x), box_slack=0.12)
    for f in (0.95, 1.04):
        box2 = tuple(b * f for b in s.box)
        s2 = dataclasses.replace(s, box=box2, dense_pairs=True)
        # the dense reference needs its scale matrices; rebuild fully
        from isokann_tpu.md.system import build_system
        s2 = build_system(base.structure)
        s2 = dataclasses.replace(s2, box=box2)
        e_tr = float(potential_energy_neighbor(
            s, x, plan, box=jnp.asarray(box2, jnp.float32)))
        e_ref = float(Fd.bond_energy(s2, x) + Fd.angle_energy(s2, x)
                      + Fd.dihedral_energy(s2, x)
                      + Fd.nonbonded_energy(s2, x)
                      + Fd.dispersion_correction_energy(s2))
        assert abs(e_tr - e_ref) < 2e-3 * abs(e_ref) + 1.0, (f, e_tr, e_ref)
        # analytic force under the traced box matches autodiff of the
        # traced-box energy
        f_a = np.asarray(force_neighbor(
            s, x, plan, box=jnp.asarray(box2, jnp.float32)))
        f_g = np.asarray(-jax.grad(lambda z: potential_energy_neighbor(
            s, z, plan, box=jnp.asarray(box2, jnp.float32)))(x))
        scale = np.abs(f_g).max()
        assert np.abs(f_a - f_g).max() < 5e-4 * scale + 0.5


def test_npt_on_sparse_system(sparse_sim):
    """End-to-end NPT through the O(n) neighbor path."""
    import dataclasses

    base, s = sparse_sim
    sim = base
    old = sim.system
    sim.system = s
    try:
        xf, box_f, info = npt_langevin(sim, key=jax.random.PRNGKey(3),
                                       steps=200, interval=20,
                                       pressure=1.0)
    finally:
        sim.system = old
    assert np.isfinite(np.asarray(xf)).all()
    assert info["attempted"] == 10
    V0 = float(np.prod(s.box))
    Vf = float(np.prod(np.asarray(box_f)))
    assert 0.5 < Vf / V0 < 2.0
