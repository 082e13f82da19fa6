"""bench.py robustness: the retry wrapper must survive transient backend
failures (VERDICT r2: BENCH_r02 died on the first jax.devices() when the
axon tunnel was momentarily unavailable), and the failure path must still
emit a parseable JSON metric line."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps = []

    def monotonic(self):
        return self.t

    def sleep(self, s):
        self.sleeps.append(s)
        self.t += s


def test_retry_survives_first_call_runtimeerror():
    clock = FakeClock()
    calls = {"n": 0, "resets": 0}

    def get_devices():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError(
                "Unable to initialize backend 'axon': UNAVAILABLE")
        return ["TPU0"]

    logs = []
    out = bench.wait_for_devices(
        get_devices=get_devices,
        reset=lambda log: calls.__setitem__("resets", calls["resets"] + 1),
        sleep=clock.sleep, monotonic=clock.monotonic,
        log=lambda *a: logs.append(" ".join(map(str, a))))
    assert out == ["TPU0"]
    assert calls["n"] == 2
    assert calls["resets"] == 1, "must clear jax's cached backend error"
    assert clock.sleeps == [2.0]
    assert any("retrying" in l for l in logs)


def test_retry_backs_off_and_eventually_raises():
    clock = FakeClock()
    attempts = []

    def get_devices():
        attempts.append(clock.t)
        raise RuntimeError("UNAVAILABLE")

    with pytest.raises(RuntimeError):
        bench.wait_for_devices(
            get_devices=get_devices, reset=lambda log: None,
            sleep=clock.sleep, monotonic=clock.monotonic,
            log=lambda *a: None, max_wait=480.0)
    # exponential backoff capped at 60s, total bounded by the deadline
    assert clock.sleeps[:5] == [2.0, 4.0, 8.0, 16.0, 32.0]
    assert max(clock.sleeps) == 60.0
    assert clock.t <= 480.0
    assert len(attempts) >= 10


def test_failure_json_is_parseable_metric_line():
    line = bench.failure_json(RuntimeError("UNAVAILABLE: tunnel down"))
    rec = json.loads(line)
    assert rec["metric"] == bench.METRIC
    assert rec["value"] is None
    assert rec["unit"] == "s"
    assert "UNAVAILABLE" in rec["error"]
    assert rec["error"].startswith("RuntimeError")


def test_reset_jax_backends_clears_cached_error():
    # clear_backends() invalidates live jax state, so exercise the real
    # reset in a subprocess: seed a cached backend-init failure, reset,
    # verify the error cache is empty and jax still comes back up
    import subprocess
    code = """
import sys
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_platforms", "cpu")   # before ANY backend init:
# the axon plugin hijacks the JAX_PLATFORMS env var at startup (CLAUDE.md)
import bench
from jax._src import xla_bridge as xb
with xb._backend_lock:
    xb._backend_errors["__fake__"] = RuntimeError("cached failure")
bench._reset_jax_backends(log=lambda *a: None)
assert "__fake__" not in xb._backend_errors
import jax
assert jax.devices()[0].platform == "cpu", jax.devices()
print("reset-ok")
""".format(root=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert "reset-ok" in out.stdout


# --------------------------------------------------------------------------
# hang-safe discovery (subprocess probes)
# --------------------------------------------------------------------------

def test_hang_safe_probes_then_waits():
    import subprocess

    calls = []

    def probe(timeout):
        calls.append("probe")
        if len(calls) < 3:
            raise subprocess.TimeoutExpired("python", timeout)
        return 1

    waited = {}

    def wait(max_wait):
        waited["budget"] = max_wait
        return ["dev0"]

    clock = [0.0]

    def monotonic():
        return clock[0]

    def sleep(s):
        clock[0] += s

    devs = bench.wait_for_devices_hang_safe(
        max_wait=480.0, probe=probe, wait=wait,
        sleep=sleep, monotonic=monotonic, log=lambda *a: None)
    assert devs == ["dev0"]
    assert calls == ["probe"] * 3          # two hangs, then success
    assert 60.0 <= waited["budget"] <= 480.0


def test_hang_safe_gives_up():
    import subprocess

    def probe(timeout):
        raise subprocess.TimeoutExpired("python", timeout)

    clock = [0.0]

    def sleep(s):
        clock[0] += s

    with pytest.raises(subprocess.TimeoutExpired):
        bench.wait_for_devices_hang_safe(
            max_wait=20.0, probe=probe, wait=lambda max_wait: ["x"],
            sleep=sleep, monotonic=lambda: clock[0],
            log=lambda *a: None)


def test_real_subprocess_probe_times_out_on_hang():
    # a probe that genuinely hangs is killed at the timeout
    import subprocess

    def fake_probe(timeout):
        return subprocess.run(
            [sys.executable, "-c", "import time; time.sleep(60)"],
            capture_output=True, timeout=timeout, text=True)

    with pytest.raises(subprocess.TimeoutExpired):
        fake_probe(1.0)


def test_watchdog_emits_failure_record():
    # run bench.py with a 1-second watchdog and a guaranteed-hanging
    # main (device probe against nothing): the process must still print
    # a parseable metric line and exit
    import subprocess
    code = (
        "import bench, json, sys, time\n"
        "bench._watchdog(1.0)\n"
        "time.sleep(30)\n")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=25,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == 2
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["value"] is None and "hung" in rec["error"]
