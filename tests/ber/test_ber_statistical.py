"""Statistical BER conformance (SURVEY.md section 5; slow-marked).

The accuracy bar is "BER/FER within 0.05 dB of the reference" -- since all
correct log-MAP decoders of the same code produce identical curves, this is
validated against (a) noiseless exactness, (b) published operating points,
(c) internal consistency across SISO implementations.
"""

import numpy as np
import pytest

from turbotpu.decoder.turbo import DecoderConfig
from turbotpu.harness.ber import SimConfig, simulate_point


def _cfg(K, siso="scan", mode="logmap", iters=8, B=64, **kw):
    scale = 0.75 if mode == "maxlog" else 1.0
    return SimConfig(name=f"t{K}{siso}{mode}", K=K, B=B,
                     decoder=DecoderConfig(K=K, n_iters=iters, mode=mode,
                                           ext_scale=scale, siso=siso),
                     use_crc=False, **kw)


def test_noiseless_error_free():
    rec = simulate_point(_cfg(104, min_frame_errors=1, max_frames=128), 30.0)
    assert rec["bit_errs"] == 0


@pytest.mark.slow
def test_k1024_logmap_operating_point():
    """Rate-1/3 K=1024 turbo, 8 iters log-MAP: literature puts BER < 1e-3
    at 1.0 dB and < ~3e-5 at 1.4 dB; check the 1.0 dB point generously."""
    cfg = _cfg(1024, min_frame_errors=20, max_frames=4096)
    rec = simulate_point(cfg, 1.0)
    assert rec["ber"] < 2e-3, rec


@pytest.mark.slow
def test_maxlog_penalty_small():
    """max-log + 0.75 extrinsic scaling within ~0.1 dB of log-MAP: compare
    BER at the same operating point; allow 3x BER ratio (~0.1 dB on the
    waterfall)."""
    ml = simulate_point(_cfg(512, mode="maxlog", min_frame_errors=40,
                             max_frames=16384), 1.4)
    lm = simulate_point(_cfg(512, mode="logmap", min_frame_errors=40,
                             max_frames=16384), 1.4)
    assert ml["ber"] < max(lm["ber"] * 3.5, 1e-4), (ml["ber"], lm["ber"])


@pytest.mark.slow
def test_pallas_matches_scan_ber():
    """The Pallas kernel path must match the scan path statistically
    (identical inputs, same seeds -> nearly identical error counts).

    Pallas interpret mode runs ~3 frames/s on CPU (vs ~900 for scan), so
    this compares error counts at a high-FER operating point where a few
    hundred frames carry plenty of errors; the bit-level Pallas==scan
    agreement on identical inputs is covered by tests/unit fast tests,
    and the full waterfall match is validated on hardware (RESULTS.md)."""
    a = simulate_point(_cfg(512, siso="scan", min_frame_errors=25,
                            max_frames=256), 0.9)
    b = simulate_point(_cfg(512, siso="pallas", min_frame_errors=25,
                            max_frames=256), 0.9)
    assert abs(a["bit_errs"] - b["bit_errs"]) <= 0.2 * max(a["bit_errs"], 1), (a, b)


@pytest.mark.slow
def test_early_termination_preserves_ber():
    base = _cfg(104, iters=8, min_frame_errors=50, max_frames=16384)
    et = SimConfig(**{**base.__dict__,
                      "decoder": DecoderConfig(K=104, n_iters=8,
                                               early_term="crc"),
                      "use_crc": True})
    noet = SimConfig(**{**base.__dict__,
                        "decoder": DecoderConfig(K=104, n_iters=8),
                        "use_crc": True})
    a = simulate_point(et, 2.0)
    b = simulate_point(noet, 2.0)
    # CRC-terminated runs must not be (statistically) worse.
    assert a["ber"] <= b["ber"] * 1.5 + 1e-4
    assert a["avg_iters"] < b["avg_iters"]
