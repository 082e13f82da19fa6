"""Budget guard of the production campaign loop
(tools/run_trpcage_production.campaign): stops early once the measured
per-generation cost says the wall budget would be exceeded, never
before 10 generations, and reports the generations actually run."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tools"))

from run_trpcage_production import campaign  # noqa: E402


class StubData(list):
    pass


class StubIso:
    def __init__(self):
        self.losses = [0.1]
        self.data = StubData(range(100))

    def run(self, iters):
        import time
        time.sleep(0.05)           # 0.05 s per generation
        self.losses.append(self.losses[-1] * 0.9)

    def resample_strat(self, n):
        self.data = StubData(list(self.data) + list(range(n)))


def test_budget_stop_after_measured_cost():
    iso = StubIso()
    telemetry = []
    wall, done = campaign(iso, generations=1000, iters=1, resamples=1,
                          cutoff=10**9, telemetry=telemetry,
                          budget_s=1.0)
    assert 10 <= done < 1000
    assert len(telemetry) == done
    assert wall < 5.0


def test_no_budget_runs_all():
    iso = StubIso()
    telemetry = []
    wall, done = campaign(iso, generations=12, iters=1, resamples=1,
                          cutoff=10**9, telemetry=telemetry)
    assert done == 12


def test_cutoff_trims_data():
    iso = StubIso()
    campaign(iso, generations=3, iters=1, resamples=5, cutoff=101,
             telemetry=[])
    assert len(iso.data) == 101
