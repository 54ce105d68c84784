"""Device-side transport-block Monte-Carlo (harness/tb.py).

Golden anchoring: the device-side segmentation + per-block encode is
cross-checked bit-for-bit against the host numpy spec pipeline
(spec.segmentation.segment + golden.numpy_ref.turbo_encode), then the
fused step is validated end-to-end: clean at high SNR (mother rate,
rate-matched, HARQ), honest TBLER/CRC counters at low SNR.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbotpu.golden import numpy_ref as npr
from turbotpu.harness.tb import (TBConfig, make_tb_step, simulate_tb_point,
                                 tb_encode_blocks)
from turbotpu.spec.crc import CRC24A_POLY, crc_attach
from turbotpu.spec.qpp import qpp_perm
from turbotpu.spec.segmentation import segment, segment_params

# A=8940: B=8964 -> C=2 blocks, K-=4480 (x1), K+=4544 (x1), F=12 --
# exercises two distinct sizes AND nonzero filler in one cheap config.
A_SEG = 8940


def test_seg_shape_assumptions():
    seg = segment_params(A_SEG + 24)
    assert seg.C == 2 and seg.F == 12
    assert seg.sizes == (4480, 4544)


def test_device_segmentation_matches_spec():
    """tb_encode_blocks' static chunk layout + CRC-24B + fillers equals
    the literal host-side spec segmentation, and the per-block encoded
    d-streams equal the golden numpy encoder's."""
    rng = np.random.default_rng(0)
    info = rng.integers(0, 2, A_SEG).astype(np.int8)
    tb = crc_attach(info, CRC24A_POLY)
    seg = segment_params(len(tb))
    host_blocks = segment(tb)
    dev = tb_encode_blocks(jnp.asarray(tb[None, :]), seg)
    assert len(dev) == len(host_blocks) == seg.C
    for (blk_dev, d_dev), blk_host in zip(dev, host_blocks):
        np.testing.assert_array_equal(np.asarray(blk_dev)[0], blk_host)
        d_host = np.concatenate(npr.lte_mux(
            *npr.turbo_encode(blk_host, qpp_perm(len(blk_host)))))
        np.testing.assert_array_equal(np.asarray(d_dev)[0], d_host)


def _cfg(**kw):
    d = dict(name="tbt", A=A_SEG, n_tb=2, ebn0_db_grid=(3.0,),
             n_iters=4, mode="logmap", siso="scan", min_tb_errors=1,
             max_tbs=2, seed=1)
    d.update(kw)
    return TBConfig(**d)


def test_tb_mother_rate_clean_at_high_snr():
    rec = simulate_tb_point(_cfg(), 3.0)
    assert rec["C"] == 2 and rec["F"] == 12
    assert rec["bit_errs"] == 0 and rec["tb_errs"] == 0
    assert rec["crc24a_fails"] == 0
    # CRC-24B early termination engaged (2 blocks x 2 TBs, cap 4 iters).
    assert rec["avg_iters"] < 4


def test_tb_rate_matched_clean():
    # G = 2.2 * A: aggregate rate ~0.45 (punctured from 1/3... i.e. each
    # block's E_r < 3K+12), clean at 3.5 dB.
    rec = simulate_tb_point(_cfg(G=int(2.2 * A_SEG), ebn0_db_grid=(3.5,)),
                            3.5)
    assert rec["bit_errs"] == 0 and rec["tb_errs"] == 0


def test_tb_harq_ir_clean():
    # Heavy single-shot puncture (rate ~0.7) combined over 2 rvs.
    rec = simulate_tb_point(
        _cfg(G=int(1.45 * A_SEG), rv_sequence=(0, 2),
             ebn0_db_grid=(3.0,)), 3.0)
    assert rec["tb_errs"] == 0


def test_tb_single_block_path():
    rec = simulate_tb_point(_cfg(A=1000, ebn0_db_grid=(4.0,)), 4.0)
    assert rec["C"] == 1 and rec["tb_errs"] == 0


def test_tb_low_snr_counters_are_honest():
    rec = simulate_tb_point(_cfg(A=1000, ebn0_db_grid=(-2.0,),
                                 min_tb_errors=2, max_tbs=4), -2.0)
    assert rec["tb_errs"] > 0 and rec["bit_errs"] > 0
    # The receiver's CRC verdict must agree with the true error state
    # (up to the 2^-24 false-pass probability, never seen at this scale).
    assert rec["crc24a_fails"] == rec["tb_errs"]
