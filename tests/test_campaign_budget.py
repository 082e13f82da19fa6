"""Budget guard of the production campaign loop
(tools/run_trpcage_production.campaign): stops before the NEXT
generation would exceed the wall budget — predicted from the last
generation's measured cost, active from generation 1 so a long-lag
recommendation cannot blow the stage timeout — and reports the
generations actually run."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tools"))

from run_trpcage_production import campaign  # noqa: E402


class StubData(list):
    pass


class StubIso:
    def __init__(self, s_per_gen=0.05):
        self.losses = [0.1]
        self.data = StubData(range(100))
        self.s_per_gen = s_per_gen

    def run(self, iters):
        import time
        time.sleep(self.s_per_gen)
        self.losses.append(self.losses[-1] * 0.9)

    def resample_strat(self, n):
        self.data = StubData(list(self.data) + list(range(n)))


def test_budget_stop_after_measured_cost():
    iso = StubIso()
    telemetry = []
    wall, done = campaign(iso, generations=1000, iters=1, resamples=1,
                          cutoff=10**9, telemetry=telemetry,
                          budget_s=1.0)
    assert 1 <= done < 1000
    assert len(telemetry) == done
    assert wall < 5.0


def test_budget_stops_expensive_gens_immediately():
    # one generation costs ~40% of the budget: the guard must stop
    # after at most a few generations, well before a 10-gen floor would
    iso = StubIso(s_per_gen=0.2)
    telemetry = []
    wall, done = campaign(iso, generations=1000, iters=1, resamples=1,
                          cutoff=10**9, telemetry=telemetry,
                          budget_s=0.5)
    assert done <= 3
    assert wall < 2.0


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
