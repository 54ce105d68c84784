"""Rayleigh flat-fading channel + perfect-CSI demapping.

External anchor: uncoded coherent BPSK over Rayleigh fading with perfect
CSI has the closed-form bit error rate

    Pb = 1/2 * (1 - sqrt(g / (1 + g))),   g = average Es/N0

(Proakis, Digital Communications, eq. 13.3-7 class of results) -- a
published formula neither the channel model nor the demapper was derived
from, so agreement breaks the self-consistency loop for the fading path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbotpu.tx import chain, qam


def test_rayleigh_amplitude_statistics():
    key = jax.random.key(0)
    x = jnp.ones((64, 1024), jnp.float32)
    _, a = chain.rayleigh_fading(key, x, 100.0)  # ~noiseless
    a = np.asarray(a)
    # E[a^2] = 1 (unit average channel gain) and E[a] = sqrt(pi)/2 for a
    # Rayleigh amplitude with unit second moment.
    assert abs(float((a ** 2).mean()) - 1.0) < 0.02
    assert abs(float(a.mean()) - np.sqrt(np.pi) / 2) < 0.01


def test_unit_gain_csi_demap_reduces_to_awgn():
    key = jax.random.key(1)
    y = jax.random.normal(key, (4, 32), jnp.float32)
    ones = jnp.ones_like(y)
    np.testing.assert_allclose(
        np.asarray(chain.demap_bpsk_csi(y, ones, 2.0)),
        np.asarray(chain.demap_bpsk(y, 2.0)), rtol=1e-6)
    yc = (y[..., :16] + 1j * y[..., 16:]).astype(jnp.complex64)
    np.testing.assert_allclose(
        np.asarray(chain.demap_qpsk_csi(yc, jnp.ones(yc.shape), 2.0)),
        np.asarray(chain.demap_qpsk(yc, 2.0)), rtol=1e-6)
    for m in (2, 4, 6):
        np.testing.assert_allclose(
            np.asarray(qam.demap_qam(yc, 2.0, m, amp=jnp.ones(yc.shape))),
            np.asarray(qam.demap_qam(yc, 2.0, m)), rtol=1e-6)


def test_noiseless_fading_is_sign_exact():
    """At very high Es/N0 the CSI demap recovers every bit regardless of
    the per-symbol fade depth (z = a*x, L proportional to a^2 * x)."""
    key = jax.random.key(2)
    bits = jax.random.bernoulli(key, 0.5, (8, 512)).astype(jnp.int8)
    x = chain.modulate_bpsk(bits)
    z, a = chain.rayleigh_fading(jax.random.key(3), x, 120.0)
    llr = chain.demap_bpsk_csi(z, a, 120.0)
    assert np.array_equal(np.asarray(llr < 0), np.asarray(bits) == 1)


def test_uncoded_bpsk_rayleigh_matches_closed_form():
    g = 4.0  # average Es/N0 (linear); 6.02 dB
    expected = 0.5 * (1.0 - np.sqrt(g / (1.0 + g)))  # = 0.05279
    key = jax.random.key(4)
    kb, kc = jax.random.split(key)
    n = 400_000
    bits = jax.random.bernoulli(kb, 0.5, (1, n)).astype(jnp.int8)
    x = chain.modulate_bpsk(bits)
    esn0_db = 10 * np.log10(g)
    z, a = chain.rayleigh_fading(kc, x, esn0_db)
    llr = chain.demap_bpsk_csi(z, a, esn0_db)
    ber = float(jnp.mean((llr < 0) != (bits == 1)))
    # 3 sigma of the binomial sampling error at n = 400k is ~1.1e-3.
    assert abs(ber - expected) < 1.5e-3, (ber, expected)


def test_qam_csi_demap_matches_bruteforce():
    """Independent float64 numpy max-log over the scaled constellation."""
    rng = np.random.default_rng(5)
    for m in (2, 4, 6):
        pts, bit_table = qam.constellation(m)
        y = (rng.normal(size=(2, 8)) + 1j * rng.normal(size=(2, 8)))
        amp = rng.rayleigh(scale=np.sqrt(0.5), size=(2, 8))
        esn0 = 10 ** (1.7 / 10)
        got = np.asarray(qam.demap_qam(
            jnp.asarray(y, jnp.complex64), 1.7, m,
            amp=jnp.asarray(amp, jnp.float32)))
        want = np.empty((2, 8, m))
        for b in range(2):
            for i in range(8):
                d2 = np.abs(y[b, i] - amp[b, i] * pts) ** 2
                for j in range(m):
                    d1 = d2[bit_table[:, j] == 1].min()
                    d0 = d2[bit_table[:, j] == 0].min()
                    want[b, i, j] = esn0 * (d1 - d0)
        np.testing.assert_allclose(got, want.reshape(2, 8 * m),
                                   rtol=2e-3, atol=1e-4)


def test_qpsk_csi_rails_match_generic_maxlog():
    """The closed-form QPSK CSI rails equal the generic max-log demapper
    with the same per-symbol amplitudes (max-log is exact for QPSK)."""
    rng = np.random.default_rng(6)
    y = jnp.asarray(rng.normal(size=(3, 16)) + 1j * rng.normal(size=(3, 16)),
                    jnp.complex64)
    a = jnp.asarray(rng.rayleigh(scale=np.sqrt(0.5), size=(3, 16)),
                    jnp.float32)
    np.testing.assert_allclose(
        np.asarray(chain.demap_qpsk_csi(y, a, 0.5)),
        np.asarray(qam.demap_qam(y, 0.5, 2, amp=a)), rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("modulation", ["bpsk", "qam16"])
def test_coded_fading_end_to_end(modulation):
    """Full chain over Rayleigh decodes cleanly at a comfortably high
    average Eb/N0 (the turbo code + CSI demap absorb the per-symbol fades)."""
    from turbotpu.decoder.turbo import DecoderConfig
    from turbotpu.harness.ber import SimConfig, make_step

    cfg = SimConfig(name="fade", K=440, B=16, channel="rayleigh",
                    modulation=modulation, use_crc=True,
                    decoder=DecoderConfig(K=440, n_iters=6, mode="logmap",
                                          early_term="crc"))
    step = make_step(cfg)
    be, fe, _, _ = step(jax.random.key(7), jnp.float32(14.0))
    assert int(fe) == 0 and int(be) == 0
