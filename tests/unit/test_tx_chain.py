import numpy as np
import pytest

import jax
import jax.numpy as jnp

from turbotpu.golden import numpy_ref as npr
from turbotpu.spec.crc import CRC24A_POLY, crc_check
from turbotpu.spec.qpp import qpp_perm
from turbotpu.tx import chain


def test_encoder_matches_golden():
    K, B = 64, 3
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (B, K)).astype(np.int8)
    perm = qpp_perm(K)
    out = chain.turbo_encode(jnp.asarray(bits), perm)
    for b in range(B):
        ref = npr.turbo_encode(bits[b], perm)
        for x, y in zip(out, ref):
            assert (np.asarray(x)[b] == y).all()


def test_crc_attach_batch():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, (4, 80)).astype(np.int8)
    out = np.asarray(chain.crc_attach_batch(jnp.asarray(bits), CRC24A_POLY))
    for row in out:
        assert crc_check(row, CRC24A_POLY)


def test_bpsk_awgn_demap_statistics():
    key = jax.random.key(0)
    bits = chain.gen_payload(key, 8, 1000)
    x = chain.modulate_bpsk(bits)
    y = chain.awgn(jax.random.key(1), x, esn0_db=3.0)
    llr = chain.demap_bpsk(y, 3.0)
    # Hard decisions on LLR at 3 dB: BER < 5%.
    hard = (np.asarray(llr) < 0).astype(np.int8)
    assert (hard != np.asarray(bits)).mean() < 0.05
    # LLR magnitude: E[LLR | bit] = +-4 Es/N0 (consistency of demapper).
    esn0 = 10 ** 0.3
    signed = np.asarray(llr) * (1 - 2 * np.asarray(bits))
    assert abs(signed.mean() - 4 * esn0) < 0.5


def test_qpsk_rails_match_bpsk():
    key = jax.random.key(2)
    bits = chain.gen_payload(key, 4, 512)
    x = chain.modulate_qpsk(bits)
    # noiseless demap recovers signs exactly
    llr = chain.demap_qpsk(x, 0.0)
    hard = (np.asarray(llr) < 0).astype(np.int8)
    assert (hard == np.asarray(bits)).all()
    # noisy QPSK behaves like BPSK per rail at the same Es/N0 per bit
    y = chain.awgn_complex(jax.random.key(3), x, 10.0)
    llr = chain.demap_qpsk(y, 10.0)
    assert ((np.asarray(llr) < 0) == np.asarray(bits)).mean() > 0.95
