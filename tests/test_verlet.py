"""Verlet-list neighbor mode (md/verlet.py): list completeness, parity
with the cell-sweep/dense force path, rebuild-interval dynamics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# full validations of the opt-in (TPU-rejected) Verlet neighbor mode:
# slow tier; the fast gate keeps cells-mode coverage (test_neighbor)
pytestmark = pytest.mark.slow

import isokann_tpu as itk
from isokann_tpu.md.neighbor import NeighborPlan, force_neighbor
from isokann_tpu.md.verlet import (VerletPlan, build_lists, force_verlet,
                                   langevin_middle_verlet)


@pytest.fixture(scope="module")
def solvated():
    return itk.MDSimulation(addwater=True, padding=0.9, steps=3)


@pytest.fixture(scope="module")
def xw(solvated):
    rng = np.random.default_rng(1)
    s = solvated.system
    x = (np.asarray(solvated.coords).reshape(-1, 3)
         + rng.normal(scale=0.003, size=(s.natoms, 3)))
    box = np.asarray(s.box)
    return jnp.asarray(x - box * np.floor(x / box), jnp.float32)


@pytest.fixture(scope="module")
def vplan(solvated, xw):
    return VerletPlan(solvated.system, x0=np.asarray(xw), skin=0.1)


def test_lists_complete_and_directed(solvated, xw, vplan):
    # every in-cutoff non-hard-excluded pair appears in BOTH owners' rows
    s = solvated.system
    lists, n_over = build_lists(vplan, s, xw)
    assert int(n_over) == 0
    n = s.natoms
    L = np.asarray(lists)
    x = np.asarray(xw)
    box = np.asarray(s.box)
    rng = np.random.default_rng(2)
    have = [set(row[row < n].tolist()) for row in L]
    import collections
    hard = collections.defaultdict(set)
    eidx = np.asarray(s.excl_idx)
    soft = (np.asarray(s.excl_qq) > 0) | (np.asarray(s.excl_lj) > 0)
    for (a, b), sf in zip(eidx, soft):
        if not sf:
            hard[a].add(int(b)), hard[b].add(int(a))
    for a in rng.choice(n, 40, replace=False):
        d = x - x[a]
        d -= box * np.round(d / box)
        r2 = (d * d).sum(1)
        true = set(np.nonzero(r2 < s.cutoff ** 2)[0].tolist())
        true -= {int(a)} | hard[int(a)]
        missing = true - have[a]
        assert not missing, (a, sorted(missing)[:5])
        # directed symmetry: a in b's row for sampled b
        for b in list(true)[:5]:
            assert int(a) in have[b]


def test_force_matches_cell_sweep(solvated, xw, vplan):
    s = solvated.system
    lists, n_over = build_lists(vplan, s, xw)
    assert int(n_over) == 0
    plan = NeighborPlan(s, x0=np.asarray(xw))
    f_ref = np.asarray(force_neighbor(s, xw, plan))
    f_new = np.asarray(force_verlet(s, xw, lists))
    assert np.abs(f_ref - f_new).max() / np.abs(f_ref).max() < 1e-5


def test_overflow_detected(solvated, xw):
    s = solvated.system
    vp = VerletPlan(s, x0=np.asarray(xw), skin=0.1, K=8)
    assert vp.K == 128          # lane rounding
    vp.K = 8                    # force a too-small capacity
    _, n_over = build_lists(vp, s, xw)
    assert int(n_over) > 0


def test_langevin_middle_verlet_runs(solvated, xw, vplan):
    s = solvated.system
    sim = solvated
    B = 2
    x0 = jnp.tile(jnp.asarray(np.asarray(xw).reshape(1, -1)), (B, 1))
    v0 = jnp.zeros_like(x0)
    x, v, diag = langevin_middle_verlet(
        s, vplan, x0, v0, sim.masses3, sim.temp, sim.friction, sim.step,
        7, jax.random.PRNGKey(0), rebuild_every=3)
    assert x.shape == x0.shape
    assert np.isfinite(np.asarray(x)).all()
    assert int(diag["n_over"]) == 0
    # 7 steps of 2 fs thermal motion stay far inside the skin/2 bound
    assert float(diag["max_disp"]) < vplan.skin / 2


def test_mdsimulation_verlet_mode(solvated):
    # neighbor_mode="verlet" propagates through the list path and matches
    # the cell-sweep mode statistically (same keys, same physics)
    import pickle

    sim = itk.MDSimulation(addwater=True, padding=0.9, steps=6,
                           dense_pairs=False, neighbor_mode="verlet",
                           skin=0.1)
    x0 = np.tile(np.asarray(sim.coords)[None, :], (3, 1))
    ys = sim.propagate(x0, 2, key=jax.random.PRNGKey(0))
    assert ys.shape == (3, 2, sim.dim)
    assert np.isfinite(np.asarray(ys)).all()
    simc = itk.MDSimulation(addwater=True, padding=0.9, steps=6,
                            dense_pairs=False)
    yc = simc.propagate(x0, 2, key=jax.random.PRNGKey(0))
    dv = np.abs(np.asarray(ys) - x0[:, None]).mean()
    dc = np.abs(np.asarray(yc) - x0[:, None]).mean()
    assert abs(dv - dc) / dc < 0.3
    # constructor kwargs & pickling round-trip (plan rebuilt lazily)
    assert sim.constructor["neighbor_mode"] == "verlet"
    sim2 = pickle.loads(pickle.dumps(sim))
    y2 = sim2.propagate(x0[:1], 1, key=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(y2)).all()


def test_verlet_mode_rejects_unknown():
    with pytest.raises(ValueError):
        itk.MDSimulation(neighbor_mode="wat")


def test_verlet_walker_chunking(monkeypatch, solvated):
    # class-c mitigation: ISOKANN_VERLET_WALKER_ATOMS_PER_PROGRAM splits
    # the walker axis into per-program sub-batches (the last one padded);
    # a cap of one walker-atom forces W=1 and must still return all
    # walkers, finite and exactly batch-shaped (3 walkers, W=1 -> 3
    # chunks, no pad; then a cap forcing W=2 -> 2 chunks with 1 pad row)
    for cap in ("1", str(2 * solvated.system.natoms)):
        monkeypatch.setenv("ISOKANN_VERLET_WALKER_ATOMS_PER_PROGRAM", cap)
        sim = itk.MDSimulation(addwater=True, padding=0.9, steps=5,
                               dense_pairs=False, neighbor_mode="verlet",
                               skin=0.1)
        x0 = np.tile(np.asarray(sim.coords)[None, :], (3, 1))
        ys = sim.propagate(x0, 1, key=jax.random.PRNGKey(0))
        assert ys.shape == (3, 1, sim.dim)
        assert np.isfinite(np.asarray(ys)).all()
        # walkers actually moved and are not copies of the pad source
        yf = np.asarray(ys)[:, 0]
        assert np.abs(yf - x0).mean() > 0
        assert np.abs(yf[2] - yf[1]).max() > 0
