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
        # posts without the per-session CSRF token are rejected
        data = urllib.parse.urlencode(dict(action="toggle")).encode()
        import urllib.error
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/control", data=data), timeout=10)
            assert False, "tokenless POST must be rejected"
        except urllib.error.HTTPError as e:
            assert e.code == 403
        import re
        token = re.search(r'name="token" value="([^"]+)"', page).group(1)
        data = urllib.parse.urlencode(dict(
            pdb="", steps=10, temp=310.0, nx=8, nk=2, opt="adam",
            lr=1e-3, reg=1e-4, kde=0, action="apply",
            token=token)).encode()
        r = urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/control", data=data), timeout=30)
        assert r.status == 200
        for _ in range(200):
            if gui.iso is not None and gui.iso.losses:
                break
            time.sleep(0.5)
        assert gui.iso is not None and len(gui.iso.losses) >= 5
        # pause toggle
        data = urllib.parse.urlencode(dict(action="toggle",
                                           token=token)).encode()
        urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/control", data=data), timeout=10)
        assert not gui.running
        # 3-D molecule panel (reference plotmol, ext/MakieExt.jl:209-310):
        # viewer page + frames/bonds/chi JSON
        import json
        mol = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/mol", timeout=10).read().decode()
        assert "canvas" in mol and "mol.json" in mol
        d = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/mol.json", timeout=30).read())
        assert len(d["frames"]) == len(d["chi"]) > 0
        assert len(d["frames"][0]) == 22 and len(d["bonds"]) == 21
    finally:
        gui.shutdown()


def test_dcd_roundtrip(tmp_path):
    """Native DCD writer/reader roundtrip (nm <-> Angstrom, cell record),
    cross-validated frame-exactly against mdtraj when available."""
    from isokann_tpu.utils.save import save_trajectory, load_trajectory

    rng = np.random.default_rng(0)
    traj = rng.normal(scale=0.5, size=(7, 66)).astype(np.float32) + 2.0
    p = str(tmp_path / "t.dcd")
    save_trajectory(p, traj, box=(2.5, 2.5, 3.0))
    back = load_trajectory(p)
    assert back.shape == traj.shape
    assert np.abs(back - traj).max() < 1e-5
    from isokann_tpu.native import dcd_read_native
    xyz, boxes = dcd_read_native(p)
    assert boxes is not None and np.allclose(boxes[0], [2.5, 2.5, 3.0])
    # no-cell variant
    p2 = str(tmp_path / "t2.dcd")
    save_trajectory(p2, traj)
    xyz2, boxes2 = dcd_read_native(p2)
    assert boxes2 is None and np.abs(xyz2.reshape(7, -1) - traj).max() < 1e-5
    # independent byte-level check of the on-disk format (Fortran
    # records, CORD magic, Angstrom scaling) with a hand-rolled parser
    import struct
    with open(p, "rb") as f:
        raw = f.read()
    n0 = struct.unpack_from("<i", raw, 0)[0]
    assert n0 == 84 and raw[4:8] == b"CORD"
    icntl = struct.unpack_from("<20i", raw, 8)
    assert icntl[0] == 7 and icntl[10] == 1 and icntl[19] == 24
    off = 4 + 84 + 4
    tlen = struct.unpack_from("<i", raw, off)[0]
    off += 4 + tlen + 4                               # title
    assert struct.unpack_from("<i", raw, off + 4)[0] == 22   # natoms
    off += 4 + 4 + 4
    # first frame: cell record then X block
    assert struct.unpack_from("<i", raw, off)[0] == 48
    cell = struct.unpack_from("<6d", raw, off + 4)
    assert abs(cell[0] - 25.0) < 1e-9 and abs(cell[5] - 30.0) < 1e-9
    off += 4 + 48 + 4
    assert struct.unpack_from("<i", raw, off)[0] == 22 * 4
    x0 = struct.unpack_from("<f", raw, off + 4)[0]
    assert abs(x0 - traj[0, 0] * 10.0) < 1e-4          # Angstrom
    try:
        from mdtraj.formats import DCDTrajectoryFile
    except ImportError:
        return
    with DCDTrajectoryFile(p) as f:
        xyz_md, cell_len, cell_ang = f.read()
    assert np.abs(xyz_md / 10.0 - traj.reshape(7, 22, 3)).max() < 1e-5
    assert np.allclose(cell_len[0] / 10.0, [2.5, 2.5, 3.0])
    assert np.allclose(cell_ang[0], 90.0)


def test_bench_emits_driver_json():
    """bench.py's last stdout line must be one JSON object with the driver
    contract keys (metric/value/unit/vs_baseline).  Static check of the
    emission site — running the bench needs the TPU."""
    import os, re
    src = open(os.path.join(os.path.dirname(__file__), "..",
                            "bench.py")).read()
    assert '"metric"' in src and '"vs_baseline"' in src
    m = re.search(r'json\.dumps\(', src)
    assert m, "bench.py must emit its result via json.dumps"
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in src


def test_dcd_bigendian_read(tmp_path):
    """The native DCD reader detects a byte-swapped record marker (84 with
    reversed bytes) and byte-swaps opposite-endian (big-endian CHARMM)
    files transparently."""
    from isokann_tpu.native import dcd_read_native
    from isokann_tpu.utils.save import save_trajectory

    rng = np.random.default_rng(3)
    traj = rng.normal(scale=0.5, size=(3, 30)).astype(np.float32) + 1.0
    p = str(tmp_path / "le.dcd")
    save_trajectory(p, traj, box=(2.0, 2.5, 3.0))

    # convert the little-endian file to big-endian record by record
    raw = open(p, "rb").read()
    out = bytearray()
    off = 0

    def swap4(b):
        return np.frombuffer(b, "<u4").astype(">u4").tobytes()

    def swap8(b):
        return np.frombuffer(b, "<u8").astype(">u8").tobytes()

    rec = 0
    import struct
    while off < len(raw):
        n = struct.unpack_from("<i", raw, off)[0]
        payload = raw[off + 4:off + 4 + n]
        if rec == 0:                       # header: magic + 20 i32
            payload = payload[:4] + swap4(payload[4:])
        elif rec == 1:                     # title: i32 count + text
            payload = swap4(payload[:4]) + payload[4:]
        elif n == 48:                      # unit cell: 6 f64
            payload = swap8(payload)
        else:                              # natoms / coordinate blocks
            payload = swap4(payload)
        m = struct.pack(">i", n)
        out += m + payload + m
        off += 4 + n + 4
        rec += 1
    pbe = str(tmp_path / "be.dcd")
    open(pbe, "wb").write(bytes(out))

    xyz_le, box_le = dcd_read_native(p)
    xyz_be, box_be = dcd_read_native(pbe)
    assert np.abs(xyz_be - xyz_le).max() == 0.0
    assert np.allclose(box_be, box_le)
