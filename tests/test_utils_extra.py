"""Telemetry, GUI server, simplex plot, exportdata, integrator wrappers."""

import io
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isokann_tpu as itk


@pytest.fixture(scope="module")
def md_iso():
    sim = itk.MDSimulation(steps=5)
    iso = itk.Iso(sim=sim, nx=8, nk=2, key=0, minibatch=0,
                  opt=itk.AdamRegularized())
    iso.run(5)
    return iso


def test_timers():
    from isokann_tpu.utils import Timers
    t = Timers()
    with t("phase", work=100):
        time.sleep(0.01)
    assert t.total["phase"] >= 0.01
    assert t.rate("phase") > 0
    assert "phase" in t.report()


def test_throughput_logger():
    from isokann_tpu.utils import ThroughputLogger
    iso = itk.Iso(sim=itk.Doublewell(), nx=16, nk=2, key=1, minibatch=0,
                  opt=itk.AdamRegularized())
    tl = ThroughputLogger(logevery=5)
    iso.loggers.append(tl)
    iso.run(20)
    assert len(tl.rates) >= 1
    assert tl.diagnostic()[1] > 0


def test_simplex_plot(tmp_path):
    iso = itk.Iso(sim=itk.Triplewell(), nx=32, nk=2, nout=3, key=2,
                  minibatch=0, opt=itk.AdamRegularized())
    from isokann_tpu.utils import scatter_chi_simplex
    scatter_chi_simplex(iso, out=str(tmp_path / "simplex.png"))
    assert (tmp_path / "simplex.png").exists()


def test_dashboard_server(md_iso):
    from isokann_tpu.utils import serve_dashboard
    srv = serve_dashboard(md_iso, port=18731)
    try:
        html = urllib.request.urlopen(
            "http://127.0.0.1:18731/", timeout=10).read().decode()
        assert "isokann_tpu" in html
        png = urllib.request.urlopen(
            "http://127.0.0.1:18731/training.png", timeout=30).read()
        assert png[:4] == b"\x89PNG"
    finally:
        srv.shutdown()


def test_exportdata(md_iso, tmp_path):
    from isokann_tpu.data import exportdata, exportsorted
    path = str(tmp_path / "data.pdb")
    out = exportdata(md_iso.data.coords, md_iso.chicoords, md_iso.data.sim,
                     path)
    assert out.shape[1] == 66
    import os
    assert os.path.exists(path)
    p2 = exportsorted(md_iso, str(tmp_path / "sorted.pdb"))
    assert os.path.exists(p2)


def test_integrator_wrappers(md_iso, key):
    sim = md_iso.data.sim
    x = sim.integrate_langevin(steps=5, key=key)
    assert x.shape == (1, 66) and np.all(np.isfinite(np.asarray(x)))
    bias = lambda q, t, sigma, F: jnp.zeros_like(q)
    xg, logw = sim.integrate_girsanov(steps=5, bias=bias, key=key)
    assert np.allclose(np.asarray(logw), 0.0)
    ws = sim.langevin_girsanov(steps=6, saveevery=2, bias=bias, key=key)
    assert ws.values.shape == (3, 66)
    assert np.allclose(np.asarray(ws.weights), 1.0)


def test_profile_smoke(tmp_path):
    from isokann_tpu.utils import profile
    with profile(str(tmp_path / "trace")):
        jnp.sum(jnp.ones((8, 8))).block_until_ready()
    # trace directory was created
    assert (tmp_path / "trace").exists()


def test_interactive_gui_controls():
    """The interactive control panel builds/trains from form submissions
    (reference GUI sliders, ext/MakieExt.jl:18-80)."""
    import time
    import urllib.request
    import urllib.parse
    from isokann_tpu.utils.gui import InteractiveGui

    gui = InteractiveGui(steps=10, nx=8, nk=2, chunk=5)
    srv = gui.serve(port=0)
    port = srv.server_address[1]
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10).read().decode()
        assert "Apply" in page and "nx" in page
        data = urllib.parse.urlencode(dict(
            pdb="", steps=10, temp=310.0, nx=8, nk=2, opt="adam",
            lr=1e-3, reg=1e-4, kde=0, action="apply")).encode()
        r = urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/control", data=data), timeout=30)
        assert r.status == 200
        for _ in range(200):
            if gui.iso is not None and gui.iso.losses:
                break
            time.sleep(0.5)
        assert gui.iso is not None and len(gui.iso.losses) >= 5
        # pause toggle
        data = urllib.parse.urlencode(dict(action="toggle")).encode()
        urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/control", data=data), timeout=10)
        assert not gui.running
    finally:
        gui.shutdown()
