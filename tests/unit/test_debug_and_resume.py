import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np
import pytest

import jax.numpy as jnp

from turbotpu.decoder.turbo import DecoderConfig
from turbotpu.harness.ber import SimConfig, simulate_ber
from turbotpu.harness.debug import assert_finite, checked


def test_checked_catches_nan():
    import jax

    def bad(x):
        return jnp.log(x)  # NaN for negative input

    f = checked(jax.jit(bad))
    f(jnp.asarray([1.0]))  # fine
    with pytest.raises(Exception):
        f(jnp.asarray([-1.0]))


def test_assert_finite():
    assert_finite({"a": jnp.ones(3)})
    with pytest.raises(AssertionError):
        assert_finite(jnp.asarray([jnp.inf]))


def test_fault_injection_resume(tmp_path):
    """Kill-and-restart semantics: a sweep interrupted after one grid point
    resumes from the results file and completes the remaining points
    without recomputing the first (SURVEY.md section 6 failure recovery)."""
    path = tmp_path / "r.jsonl"
    cfg = SimConfig(name="fi", K=40, B=16,
                    ebn0_db_grid=(8.0, 9.0, 10.0),
                    decoder=DecoderConfig(K=40, n_iters=2), use_crc=False,
                    min_frame_errors=1, max_frames=32, seed=3)
    # "Crash" after the first point: simulate by sweeping a 1-point grid.
    first = SimConfig(**{**cfg.__dict__, "ebn0_db_grid": (8.0,)})
    simulate_ber(first, results_path=path, verbose=False)
    lines_before = path.read_text().splitlines()
    assert len(lines_before) == 1
    # Restart with the full grid: point 1 must be resumed verbatim.
    out = simulate_ber(cfg, results_path=path, verbose=False)
    lines_after = path.read_text().splitlines()
    assert len(lines_after) == 3
    assert json.loads(lines_after[0]) == json.loads(lines_before[0])
    assert [r["ebn0_db"] for r in out] == [8.0, 9.0, 10.0]


def test_resume_skips_torn_trailing_line(tmp_path):
    """A writer killed mid-write leaves a truncated final JSONL record;
    resume must skip it and recompute that point instead of crashing."""
    path = tmp_path / "r.jsonl"
    cfg = SimConfig(name="torn", K=40, B=16, ebn0_db_grid=(8.0, 9.0),
                    decoder=DecoderConfig(K=40, n_iters=2), use_crc=False,
                    min_frame_errors=1, max_frames=32, seed=5)
    first = SimConfig(**{**cfg.__dict__, "ebn0_db_grid": (8.0,)})
    simulate_ber(first, results_path=path, verbose=False)
    intact = path.read_text()
    with path.open("a") as f:
        f.write('{"config": "torn", "ebn0_db": 9.0, "ber"')  # torn record
    out = simulate_ber(cfg, results_path=path, verbose=False)
    assert [r["ebn0_db"] for r in out] == [8.0, 9.0]
    assert path.read_text().startswith(intact)
    recs = []
    for line in path.read_text().splitlines():
        try:
            recs.append(json.loads(line))
        except json.JSONDecodeError:
            pass
    assert sorted(r["ebn0_db"] for r in recs) == [8.0, 9.0]


_SWEEP_WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from turbotpu.decoder.turbo import DecoderConfig
from turbotpu.harness.ber import SimConfig, simulate_ber
cfg = SimConfig(name="fi_kill", K=320, B=64,
                ebn0_db_grid=tuple(x / 4 for x in range(12)),
                decoder=DecoderConfig(K=320, n_iters=4), use_crc=False,
                min_frame_errors=1, max_frames=64, seed=7)
simulate_ber(cfg, results_path=sys.argv[1], verbose=False)
"""


def test_process_kill_resume(tmp_path):
    """Hard fault injection (SURVEY.md section 6): SIGKILL a sweep process
    mid-grid by exact PID, re-launch, and assert the survivor resumes from
    the results file — intact points preserved verbatim, grid completed."""
    path = tmp_path / "r.jsonl"
    worker = tmp_path / "sweep.py"
    worker.write_text(_SWEEP_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = str(pathlib.Path(__file__).parents[2]) + os.pathsep + \
        env.get("PYTHONPATH", "")
    p = subprocess.Popen([sys.executable, str(worker), str(path)], env=env,
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    deadline = time.time() + 240
    while time.time() < deadline and p.poll() is None:
        if path.exists() and path.read_text().count("\n") >= 1:
            break
        time.sleep(0.05)
    p.kill()  # SIGKILL the exact PID we started (never by pattern)
    p.wait(timeout=30)
    before = path.read_text()
    intact_before = []
    for line in before.splitlines():
        try:
            intact_before.append(json.loads(line))
        except json.JSONDecodeError:
            pass
    assert intact_before, "worker never completed a grid point"

    cfg = SimConfig(name="fi_kill", K=320, B=64,
                    ebn0_db_grid=tuple(x / 4 for x in range(12)),
                    decoder=DecoderConfig(K=320, n_iters=4), use_crc=False,
                    min_frame_errors=1, max_frames=64, seed=7)
    out = simulate_ber(cfg, results_path=path, verbose=False)
    assert [r["ebn0_db"] for r in out] == [x / 4 for x in range(12)]
    # Intact pre-kill records are resumed verbatim, not recomputed.
    for rec in intact_before:
        assert out[int(rec["ebn0_db"] * 4)] == rec
