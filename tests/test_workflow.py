"""Full user-journey workflow test mirroring the reference
``test/workflow.jl:3-17``: sim -> trajectorydata_bursts -> Iso ->
save/load roundtrip -> train -> adaptive -> save_reactive_path.
Plus the Girsanov-weighted training path (WeightedSamples end-to-end).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isokann_tpu as itk
from isokann_tpu.data import trajectorydata_bursts, WeightedSamples


def test_full_workflow(tmp_path, key):
    sim = itk.MDSimulation(steps=10)
    data = trajectorydata_bursts(sim, 12, 2, key=key)
    assert len(data) == 12

    iso = itk.Iso(data=data, key=1, minibatch=0, opt=itk.AdamRegularized())
    iso.run(5)

    # save / load roundtrip mid-workflow
    path = str(tmp_path / "iso.pkl")
    iso.save(path)
    iso = itk.load(path)
    iso.run(10)
    assert len(iso.losses) == 15

    # adaptive sampling
    iso.run_kde(generations=1, iter=5, kde=2)
    assert len(iso.losses) == 20

    # reactive path extraction end-to-end
    out = str(tmp_path / "rp.pdb")
    ids = itk.save_reactive_path(iso, sigma=1.0, maxjump=1.0, out=out,
                                 method=itk.analysis.QuantilePath(0.2))
    if len(ids) > 0:
        assert os.path.exists(out)

    # rates on the final model
    Q = iso.rates()
    assert np.all(np.isfinite(Q))


def test_girsanov_weighted_training(key):
    """Training with a biased sim produces WeightedSamples data and the
    fused loop handles the weighted Koopman expectation."""
    bias = lambda q, t, sigma, F: 0.01 * jnp.ones_like(q)
    sim = itk.MDSimulation(steps=5, bias=bias)
    iso = itk.Iso(sim=sim, nx=8, nk=2, key=2, minibatch=0,
                  opt=itk.AdamRegularized())
    assert isinstance(iso.data.propfeatures, WeightedSamples)
    w = np.asarray(iso.data.propfeatures.weights)
    assert not np.allclose(w, 1.0)       # nonzero bias reweights
    iso.run(5)
    assert np.all(np.isfinite(iso.losses))

    # koopman expectation uses the weights
    k = np.asarray(iso.koopman())
    assert np.all(np.isfinite(k))


def test_metadynamics_workflow(key):
    """Reference test/metadynamics.jl: build from trained iso, one biased
    trajectory, one run_metadynamics generation."""
    sim = itk.MDSimulation(steps=5)
    iso = itk.Iso(sim=sim, nx=8, nk=2, key=3, minibatch=0,
                  opt=itk.AdamRegularized())
    iso.run(5)
    md = itk.MetadynamicsSimulation(iso, height=0.1, sigma=0.2)
    t = md.trajectory(steps=5, key=key)
    assert np.all(np.isfinite(np.asarray(t.values)))
    itk.run_metadynamics(iso, generations=1, iter=3, deposit=5,
                         height=0.1, sigma=0.2)
    assert len(iso.losses) == 8


def test_optcontrol_bias_workflow(key):
    """chi-derived optimal-control importance sampling: train, build the
    optcontrol bias, run Girsanov-weighted sampling with it
    (reference ``optcontrol``, ``src/simulators/openmm.jl:640-667``)."""
    from isokann_tpu.md.integrators import optcontrol

    sim = itk.MDSimulation(steps=10)
    iso = itk.Iso(sim=sim, nx=16, nk=2, key=5, minibatch=0,
                  opt=itk.AdamRegularized())
    iso.run(30)
    try:
        bias = optcontrol(iso, forcescale=0.1)
    except itk.DomainError:
        pytest.skip("Koopman slope >= 1 on this tiny run (q>0)")
    ws = sim.langevin_girsanov(steps=10, bias=bias, key=key)
    w = np.asarray(ws.weights)
    assert np.all(np.isfinite(w)) and np.all(w > 0)
    assert not np.allclose(w, 1.0)     # bias actually reweights


def test_shift_and_scale():
    from isokann_tpu.md.integrators import shift_and_scale
    xs = np.linspace(0, 1, 50)
    ys = 0.2 + 0.5 * xs
    bias, scale, limit = shift_and_scale(xs, ys)
    assert bias == pytest.approx(0.2, abs=1e-8)
    assert scale == pytest.approx(0.5, abs=1e-8)
    assert limit == pytest.approx(0.4, abs=1e-6)


def test_run_girsanov_workflow():
    """Koopman-weighted adaptive loop: optcontrol bias refresh + biased
    resampling produce WeightedSamples data that trains through the
    weighted fused loop."""
    import numpy as np
    import isokann_tpu as itk
    from isokann_tpu.data import WeightedSamples

    sim = itk.MDSimulation(steps=20)
    iso = itk.Iso(sim=sim, nx=12, nk=2, key=0, opt=itk.AdamRegularized())
    iso.run(10)
    itk.run_girsanov(iso, generations=2, iter=5, kde=2)
    assert len(iso.data) == 16
    assert np.all(np.isfinite(iso.losses))
    # once any generation sampled biased, propfeatures carry weights
    pf = iso.data.propfeatures
    if isinstance(pf, WeightedSamples):
        w = np.asarray(pf.weights)
        assert np.all(np.isfinite(w)) and np.all(w >= 0)
    assert sim.bias is None      # restored
    # telemetry rows are recorded per generation, carry the ESS and
    # accumulate on the iso across calls
    rows = iso.girsanov_telemetry
    assert len(rows) == 2
    assert {"gen", "biased", "forcescale", "ess", "nk", "n_new",
            "n_data", "loss"} <= set(rows[0])
    assert [r["gen"] for r in rows] == [0, 1]
    for r in rows:
        if r["biased"] and r["n_new"] > 0:
            assert r["ess"] is not None and 0 < r["ess"] <= r["nk"]
    extra = []
    itk.run_girsanov(iso, generations=1, iter=2, kde=2, telemetry=extra)
    assert len(iso.girsanov_telemetry) == 3 and len(extra) == 1
    assert extra[0]["gen"] == 2


def test_run_girsanov_auto_forcescale(monkeypatch):
    """Two consecutive degenerate-ESS biased generations halve the
    forcescale (floored at min_forcescale)."""
    import isokann_tpu as itk
    from isokann_tpu.data import WeightedSamples

    sim = itk.Doublewell(sigma=1.0)
    iso = itk.Iso(sim=sim, nx=40, nk=5, key=0, opt=itk.AdamRegularized())
    iso.run(80)      # contract so optcontrol produces a bias

    # force the degenerate regime: every ESS reads as collapsed
    monkeypatch.setattr(WeightedSamples, "ess",
                        lambda self: np.zeros(len(self.values)) + 0.1)
    with pytest.warns(UserWarning, match="degenerating"):
        itk.run_girsanov(iso, generations=5, iter=2, kde=3,
                         forcescale=1.0, auto_forcescale=True,
                         min_forcescale=0.25)
    rows = iso.girsanov_telemetry
    biased = [r for r in rows if r["biased"]]
    assert biased, "optcontrol never produced a bias"
    fscales = [r["forcescale"] for r in rows]
    # tempering fired: strictly decreasing steps 1.0 -> 0.5 -> 0.25,
    # never below the floor
    assert fscales[0] == 1.0
    assert 0.5 in fscales and min(fscales) >= 0.25
    halvings = [r for r in rows if "forcescale_next" in r]
    assert halvings and halvings[0]["forcescale_next"] == 0.5
