import json

import numpy as np
import pytest

from turbotpu.decoder.turbo import DecoderConfig
from turbotpu.harness.ber import SimConfig, make_step, simulate_ber, simulate_point


def _fast_cfg(**kw):
    defaults = dict(name="t", K=40, B=32, ebn0_db_grid=(6.0,),
                    decoder=DecoderConfig(K=40, n_iters=2),
                    use_crc=False, min_frame_errors=1, max_frames=64, seed=1)
    defaults.update(kw)
    return SimConfig(**defaults)


def test_high_snr_is_error_free():
    cfg = _fast_cfg(ebn0_db_grid=(10.0,))
    rec = simulate_point(cfg, 10.0)
    assert rec["bit_errs"] == 0


def test_rate_matched_step_runs():
    cfg = _fast_cfg(E=100, ebn0_db_grid=(8.0,))  # punctured rate ~0.4
    rec = simulate_point(cfg, 8.0)
    assert rec["frames"] > 0


def test_qpsk_step_runs():
    cfg = _fast_cfg(modulation="qpsk", ebn0_db_grid=(10.0,))
    rec = simulate_point(cfg, 10.0)
    assert rec["bit_errs"] == 0


def test_harq_rv_sequence_step_runs_and_gains():
    # Heavy puncture (rate ~0.8 single-shot) at low SNR: 1 transmission has
    # frame errors, the 4-rv IR combination decodes clean at the same
    # per-transmission Es/N0 (esn0 passed directly to bypass the per-config
    # Eb/N0 normalization, which differs between the two configs).
    import jax.numpy as jnp
    esn0 = jnp.float32(0.0)
    cfg1 = _fast_cfg(E=50, B=64, decoder=DecoderConfig(K=40, n_iters=4))
    cfg4 = _fast_cfg(E=50, B=64, rv_sequence=(0, 2, 3, 1),
                     decoder=DecoderConfig(K=40, n_iters=4))
    import jax.random
    key = jax.random.key(0)
    be1, fe1, _, _ = make_step(cfg1)(key, esn0)
    be4, fe4, _, _ = make_step(cfg4)(key, esn0)
    assert int(fe1) > 0
    assert int(fe4) < int(fe1)


def test_mixed_k_pad_to_bucket():
    """K_mix batch: TRUE codewords of sizes (40, 72, 104), each with its
    own interleaver and mother-rate length, embedded into the K=104 bucket
    and decoded in one call; error-free at high SNR and BER accounting
    uses true (non-filler) bits only."""
    cfg = _fast_cfg(K=104, K_mix=(40, 72, 104), B=12,
                    decoder=DecoderConfig(K=104, n_iters=3,
                                          early_term="crc"),
                    use_crc=True, ebn0_db_grid=(8.0,))
    assert cfg.mean_true_k == pytest.approx((40 + 72 + 104) / 3)
    rec = simulate_point(cfg, 8.0)
    assert rec["bit_errs"] == 0
    assert rec["k_mix"] == [40, 72, 104]
    assert rec["bits"] == rec["frames"] * 72  # mean true K


def test_mixed_k_rejects_oversize():
    with pytest.raises(ValueError):
        _fast_cfg(K=104, K_mix=(40, 200), B=4).filler_lengths()


def test_mixed_k_with_rate_matching():
    """K_mix + per-group rate matching (round-2 VERDICT item 4): each
    group punctured to its proportional E_g (aggregate rate preserved),
    de-rate-matched per group, one embedded decode; clean at high SNR."""
    cfg = _fast_cfg(K=104, K_mix=(40, 104), B=8, E=208,   # rate ~1/2
                    decoder=DecoderConfig(K=104, n_iters=4,
                                          early_term="crc"),
                    use_crc=True, ebn0_db_grid=(8.0,))
    assert cfg.e_mix_resolved() == (80, 208)
    rec = simulate_point(cfg, 8.0)
    assert rec["bit_errs"] == 0
    assert rec["frame_errs"] == 0


def test_mixed_k_explicit_e_mix_and_harq():
    """Explicit per-group E_mix composes with HARQ rv_sequence."""
    cfg = _fast_cfg(K=104, K_mix=(40, 104), B=8, E_mix=(64, 160),
                    rv_sequence=(0, 2),
                    decoder=DecoderConfig(K=104, n_iters=4), use_crc=False)
    rec = simulate_point(cfg, 8.0)
    assert rec["bit_errs"] == 0


def test_mixed_k_rate_match_validation():
    with pytest.raises(ValueError):
        _fast_cfg(K=104, K_mix=(40, 104), E_mix=(64,)).e_mix_resolved()
    from turbotpu.harness.ber import make_step
    with pytest.raises(ValueError):
        # HARQ needs every group rate-matched.
        make_step(_fast_cfg(K=104, K_mix=(40, 104), B=4,
                            rv_sequence=(0, 2),
                            decoder=DecoderConfig(K=104, n_iters=2)))


def test_mixed_k_rate_matched_tracks_homogeneous():
    """A mixed (K, E) batch's per-group error statistics must be
    consistent with the same groups run homogeneously at equal Es/N0
    (same channel conventions, independent noise): compare total errors
    at a mid-waterfall point with loose statistical margins."""
    import jax
    import jax.numpy as jnp
    esn0 = jnp.float32(0.0)
    mixed = _fast_cfg(K=104, K_mix=(64, 104), B=64, E=312,
                      decoder=DecoderConfig(K=104, n_iters=3),
                      use_crc=False)
    be_m = fe_m = 0
    step = make_step(mixed)
    for s in range(6):
        b, f, _, _ = step(jax.random.key(s), esn0)
        be_m, fe_m = be_m + int(b), fe_m + int(f)
    fe_h = 0
    for K_g, E_g in ((64, 192), (104, 312)):
        homo = _fast_cfg(K=K_g, B=32, E=E_g,
                         decoder=DecoderConfig(K=K_g, n_iters=3),
                         use_crc=False)
        hstep = make_step(homo)
        # Undo the homogeneous path's static rate folding; apply the
        # group rate by hand so both runs see identical Es/N0.
        esn0_g = jnp.float32(10 * np.log10(K_g / E_g))
        for s in range(6):
            _, f, _, _ = hstep(jax.random.key(100 + s), esn0_g)
            fe_h += int(f)
    assert fe_m > 0 and fe_h > 0          # mid-waterfall, both see errors
    assert 0.4 < fe_m / fe_h < 2.5        # same operating point


def test_qam_rate_counts_pad_bits():
    # E=50 at qam64 pads to 54 channel bits/tx; the Eb/N0 label must count
    # them (ADVICE round-1 item 2).
    cfg = _fast_cfg(E=50, modulation="qam64")
    assert cfg.rate == pytest.approx(40 / 54)
    cfg = _fast_cfg(E=50, modulation="qam64", rv_sequence=(0, 2))
    assert cfg.rate == pytest.approx(40 / 108)


def test_resume_skips_completed_points(tmp_path):
    path = tmp_path / "r.jsonl"
    cfg = _fast_cfg(ebn0_db_grid=(9.0, 10.0))
    out1 = simulate_ber(cfg, results_path=path, verbose=False)
    assert len(path.read_text().splitlines()) == 2
    out2 = simulate_ber(cfg, results_path=path, verbose=False)
    assert len(path.read_text().splitlines()) == 2  # nothing re-run
    assert [r["ebn0_db"] for r in out2] == [9.0, 10.0]


def test_crc_config_decodes_own_payload():
    cfg = _fast_cfg(use_crc=True,
                    decoder=DecoderConfig(K=40, n_iters=4, early_term="crc"),
                    ebn0_db_grid=(8.0,))
    rec = simulate_point(cfg, 8.0)
    assert rec["bit_errs"] == 0
    assert rec["avg_iters"] <= 2.5  # CRC early exit kicks in at high SNR
