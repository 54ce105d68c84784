"""Sweep-level compaction (harness/ber.py compact_stage1 mode; SURVEY.md
section 8 hard part 6's named integration point): `cli ber --compact N`
must produce the IDENTICAL BER/FER curve to the non-compact sweep on the
same seeds -- same frames, same bit/frame error counts -- because the
compacted decode is bit-identical to the full-cap decode and the compact
path replicates the fused step's key-split tree exactly.
"""

import json

import numpy as np
import pytest

from turbotpu.decoder.turbo import DecoderConfig
from turbotpu.harness.ber import SimConfig, simulate_ber, simulate_point


def _cfg(**kw):
    base = dict(
        name="compact_sweep_test", K=112, B=16,
        ebn0_db_grid=(-1.0, 1.5),
        decoder=DecoderConfig(K=112, n_iters=6, mode="maxlog",
                              ext_scale=0.75, early_term="crc",
                              siso="scan"),
        use_crc=True, min_frame_errors=8, max_frames=128,
        steps_per_check=2, seed=7)
    base.update(kw)
    return SimConfig(**base)


def test_compact_sweep_counts_identical():
    cfg = _cfg()
    plain = simulate_ber(cfg, results_path=None, verbose=False)
    comp = simulate_ber(cfg, results_path=None, verbose=False,
                        compact_stage1=2)
    assert len(plain) == len(comp) == 2
    for p, c in zip(plain, comp):
        assert p["frames"] == c["frames"]
        assert p["bit_errs"] == c["bit_errs"]
        assert p["frame_errs"] == c["frame_errs"]
        assert p["ber"] == c["ber"] and p["fer"] == c["fer"]
        # Device-work fields exist on both sides of the comparison.
        assert "iter_batches" in p and "iter_batches" in c
        assert c["compact_stage1"] == 2


def test_compact_low_snr_defers_and_saves_units():
    """At -1 dB with a stage-1 cap of 2 vs full cap 6, frames defer and
    the compacted schedule must not exceed the single-stage realized
    device work by more than its pipeline-fill overhead."""
    cfg = _cfg(ebn0_db_grid=(-1.0,))
    p = simulate_point(cfg, -1.0)
    c = simulate_point(cfg, -1.0, compact_stage1=2)
    assert c["deferred_frac"] > 0 and c["n_stage2_batches"] > 0
    assert c["bit_errs"] == p["bit_errs"]


def test_compact_resume_keys_do_not_cross(tmp_path):
    """A compacted point must not resume from a non-compact record."""
    cfg = _cfg(ebn0_db_grid=(1.5,))
    path = tmp_path / "r.jsonl"
    simulate_ber(cfg, results_path=path, verbose=False)
    comp = simulate_ber(cfg, results_path=path, verbose=False,
                        compact_stage1=2)
    assert comp[0]["compact_stage1"] == 2          # ran fresh, not resumed
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert len(lines) == 2                          # both records persisted
    # And the compact run resumes itself.
    again = simulate_ber(cfg, results_path=path, verbose=False,
                         compact_stage1=2)
    assert again[0] == comp[0]


def test_compact_rejects_mixed_k_and_no_crc():
    with pytest.raises(ValueError, match="mixed-K"):
        simulate_point(_cfg(K_mix=(48, 112), max_frames=32), 1.5,
                       compact_stage1=2)
    bad = _cfg(decoder=DecoderConfig(K=112, n_iters=6, mode="maxlog",
                                     ext_scale=0.75, early_term="sign",
                                     siso="scan"))
    with pytest.raises(ValueError, match="crc"):
        simulate_point(bad, 1.5, compact_stage1=2)


def test_compact_cross_group_flush_counts_identical():
    """compact_flush=R accumulates failures across check groups; with a
    fixed frame budget (flush-at-end guaranteed) the counts must still
    equal the non-compact sweep exactly, with fewer or equal stage-2
    batches than the per-check mode (denser packing)."""
    cfg = _cfg(ebn0_db_grid=(-1.0,), min_frame_errors=1 << 30,
               max_frames=128)
    p = simulate_point(cfg, -1.0)
    c0 = simulate_point(cfg, -1.0, compact_stage1=2)
    c8 = simulate_point(cfg, -1.0, compact_stage1=2, compact_flush=8)
    for c in (c0, c8):
        assert (c["frames"], c["bit_errs"], c["frame_errs"]) == \
               (p["frames"], p["bit_errs"], p["frame_errs"])
    assert c8["n_stage2_batches"] <= c0["n_stage2_batches"]
    assert c8["compact_flush_batches"] == 8
