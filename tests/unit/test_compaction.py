"""Convergence-compaction equivalence (harness/compact.py): the
two-stage compacted decode must return bit-identical hard decisions and
error counts to the single-stage full-cap decoder on the same frames.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbotpu.decoder.turbo import DecoderConfig, turbo_decode
from turbotpu.harness.compact import decode_compacted, make_crc_batches

K, B, N_SUPER = 112, 16, 3


def _single_stage(inputs_list, bits_list, cfg):
    bit_t = frame_t = 0
    hards = []
    for inp, bits in zip(inputs_list, bits_list):
        hard, iters, _ = turbo_decode(*inp, cfg)
        errs = np.asarray(hard != bits)
        bit_t += int(errs.sum())
        frame_t += int((errs.sum(axis=1) > 0).sum())
        hards.append(np.asarray(hard))
    return bit_t, frame_t, hards


@pytest.mark.parametrize("ebn0_db", [-2.0, 1.0, 4.0])
def test_compaction_matches_single_stage(ebn0_db):
    """-2 dB: nearly every frame defers; 1 dB: mixed; 4 dB: none defer."""
    cfg = DecoderConfig(K=K, n_iters=6, mode="maxlog", ext_scale=0.75,
                        early_term="crc", siso="scan")
    inputs_list, bits_list = make_crc_batches(K, B, N_SUPER, ebn0_db,
                                              seed=3, n_base=8)
    bit_s, frame_s, hard_s = _single_stage(inputs_list, bits_list, cfg)
    bit_c, frame_c, _, n2, hard_c, n_def = decode_compacted(
        inputs_list, bits_list, cfg, stage1_iters=2, keep_hard=True)

    assert bit_c == bit_s
    assert frame_c == frame_s
    for hc, hs in zip(hard_c, hard_s):
        np.testing.assert_array_equal(hc, hs)
    if ebn0_db <= -2.0:
        assert n_def > 0          # the deferred path actually executed
    if ebn0_db >= 4.0:
        assert n_def == 0 and n2 == 0


def test_compaction_lazy_flat_concat_unused_when_no_deferral():
    """flat=None with zero deferred frames must not build the 5-stream
    concatenation (stage2 never runs)."""
    cfg = DecoderConfig(K=K, n_iters=6, mode="maxlog", ext_scale=0.75,
                        early_term="crc", siso="scan")
    inputs_list, bits_list = make_crc_batches(K, B, 1, 6.0, seed=0,
                                              n_base=4)
    bit_c, frame_c, _, n2, _, n_def = decode_compacted(
        inputs_list, bits_list, cfg, stage1_iters=3)
    assert (bit_c, frame_c, n2, n_def) == (0, 0, 0, 0)
