import json

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
