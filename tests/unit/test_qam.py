"""Gray QAM modulation + generic max-log demapper (turbotpu/tx/qam.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from turbotpu.tx import chain, qam


@pytest.mark.parametrize("m", [2, 4, 6])
def test_constellation_unit_energy_and_gray(m):
    pts, bits = qam.constellation(m)
    M = 1 << m
    assert pts.shape == (M,) and bits.shape == (M, m)
    # Unit average energy.
    assert np.mean(np.abs(pts) ** 2) == pytest.approx(1.0, rel=1e-12)
    # All points distinct.
    assert len({complex(p) for p in pts}) == M
    # Gray property: nearest neighbors differ in exactly one bit.
    dmin = min(abs(a - b) for i, a in enumerate(pts)
               for b in pts[i + 1:])
    for i in range(M):
        for j in range(i + 1, M):
            if abs(pts[i] - pts[j]) < dmin * 1.001:
                assert int(np.sum(bits[i] != bits[j])) == 1


def test_ts36211_spot_values():
    # TS 36.211 Table 7.1.3-1: 16QAM label 0000 -> (1+j)/sqrt(10);
    # 0010 -> (3+j)/sqrt(10) (b2 flips I amplitude 1 -> 3).
    pts, bits = qam.constellation(4)
    lut = {tuple(b): p for b, p in zip(bits, pts)}
    s10 = np.sqrt(10.0)
    assert lut[(0, 0, 0, 0)] == pytest.approx((1 + 1j) / s10)
    assert lut[(0, 0, 1, 0)] == pytest.approx((3 + 1j) / s10)
    assert lut[(1, 1, 1, 1)] == pytest.approx((-3 - 3j) / s10)
    # TS 36.211 Table 7.1.4-1: 64QAM label 000000 -> (3+3j)/sqrt(42).
    pts, bits = qam.constellation(6)
    lut = {tuple(b): p for b, p in zip(bits, pts)}
    s42 = np.sqrt(42.0)
    assert lut[(0, 0, 0, 0, 0, 0)] == pytest.approx((3 + 3j) / s42)
    assert lut[(0, 0, 1, 0, 1, 0)] == pytest.approx((7 + 3j) / s42)
    assert lut[(0, 0, 0, 0, 1, 0)] == pytest.approx((1 + 3j) / s42)


@pytest.mark.parametrize("m", [2, 4, 6])
def test_mod_demap_roundtrip_noiseless(m):
    rng = np.random.default_rng(m)
    bits = jnp.asarray(rng.integers(0, 2, (4, 24 * m)), jnp.int8)
    y = qam.modulate_qam(bits, m)
    llr = qam.demap_qam(y, 10.0, m)
    hard = (llr < 0).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(hard), np.asarray(bits))


def test_generic_qpsk_matches_closed_form():
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (3, 64)), jnp.int8)
    x1 = qam.modulate_qam(bits, 2)
    x2 = chain.modulate_qpsk(bits)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-6)
    y = chain.awgn_complex(jax.random.key(1), x2, 3.0)
    l_gen = qam.demap_qam(y, 3.0, 2)
    l_cf = chain.demap_qpsk(y, 3.0)
    np.testing.assert_allclose(np.asarray(l_gen), np.asarray(l_cf),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("m", [4, 6])
def test_demap_llr_sign_mostly_correct_at_high_snr(m):
    rng = np.random.default_rng(7)
    bits = jnp.asarray(rng.integers(0, 2, (8, 60 * m)), jnp.int8)
    x = qam.modulate_qam(bits, m)
    esn0_db = 25.0
    y = chain.awgn_complex(jax.random.key(2), x, esn0_db)
    llr = qam.demap_qam(y, esn0_db, m)
    hard = (llr < 0).astype(jnp.int8)
    ber = float(jnp.mean(hard != bits))
    assert ber < 1e-3


def _qfunc(x):
    from math import erfc, sqrt
    return 0.5 * erfc(x / sqrt(2.0))


def test_uncoded_qpsk_awgn_matches_closed_form():
    """Uncoded Gray QPSK over AWGN: BER = Q(sqrt(2*Eb/N0)) exactly.

    This is the anchor that pins the awgn_complex noise convention (it
    caught a round-1 bug where complex noise was injected at half power,
    making every QPSK/QAM curve 3 dB optimistic)."""
    ebn0_db = 4.0
    g = 10 ** (ebn0_db / 10)
    expected = _qfunc(np.sqrt(2 * g))  # 0.0125
    n = 400_000
    kb, kc = jax.random.split(jax.random.key(11))
    bits = jax.random.bernoulli(kb, 0.5, (1, n)).astype(jnp.int8)
    x = chain.modulate_qpsk(bits)
    esn0_db = ebn0_db + 10 * np.log10(2)
    y = chain.awgn_complex(kc, x, esn0_db)
    ber = float(jnp.mean((chain.demap_qpsk(y, esn0_db) < 0) != (bits == 1)))
    assert abs(ber - expected) < 6e-4, (ber, expected)  # ~3.4 sigma at n=400k


def test_uncoded_qam16_awgn_matches_closed_form():
    """Uncoded Gray 16QAM over AWGN, exact per-bit BER (per-rail 4-PAM
    boundary analysis, Cho & Yoon 2002 class of closed forms):

        Pb = 3/4*Q(a) + 1/2*Q(3a) - 1/4*Q(5a),  a = sqrt(0.8*Eb/N0).
    """
    ebn0_db = 8.0
    g = 10 ** (ebn0_db / 10)
    a = np.sqrt(0.8 * g)
    expected = 0.75 * _qfunc(a) + 0.5 * _qfunc(3 * a) - 0.25 * _qfunc(5 * a)
    n_sym = 100_000
    kb, kc = jax.random.split(jax.random.key(12))
    bits = jax.random.bernoulli(kb, 0.5, (1, 4 * n_sym)).astype(jnp.int8)
    x = qam.modulate_qam(bits, 4)
    esn0_db = ebn0_db + 10 * np.log10(4)
    y = chain.awgn_complex(kc, x, esn0_db)
    ber = float(jnp.mean((qam.demap_qam(y, esn0_db, 4) < 0) != (bits == 1)))
    # ~3700 expected errors -> 3 sigma ~ 4.6e-4; allow approximation slack.
    assert abs(ber - expected) < 8e-4, (ber, expected)


def test_coded_qam16_end_to_end_decodes():
    """Turbo-coded 16QAM through the BER harness beats uncoded easily."""
    from turbotpu.decoder.turbo import DecoderConfig
    from turbotpu.harness.ber import SimConfig, simulate_point

    cfg = SimConfig(name="qam16", K=424, B=32, modulation="qam16",
                    decoder=DecoderConfig(K=424, n_iters=4), use_crc=True,
                    min_frame_errors=1, max_frames=64, seed=5)
    rec = simulate_point(cfg, ebn0_db=6.0)
    assert rec["ber"] < 1e-2
