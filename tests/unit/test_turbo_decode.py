import numpy as np
import pytest

import jax.numpy as jnp

from turbotpu.decoder.turbo import DecoderConfig, turbo_decode
from turbotpu.golden import numpy_ref as npr
from turbotpu.spec.crc import CRC24A_POLY, crc_attach
from turbotpu.spec.qpp import qpp_inv, qpp_perm
from turbotpu.spec.umts import umts_inv, umts_perm


def _encode_noisy(K, B, seed, ebn0_db, interleaver="lte", with_crc=False):
    rng = np.random.default_rng(seed)
    perm = qpp_perm(K) if interleaver == "lte" else umts_perm(K)
    bits = np.empty((B, K), np.int8)
    parts = {k: [] for k in range(5)}
    for b in range(B):
        if with_crc:
            payload = rng.integers(0, 2, K - 24).astype(np.int8)
            row = crc_attach(payload, CRC24A_POLY)
        else:
            row = rng.integers(0, 2, K).astype(np.int8)
        bits[b] = row
        enc = npr.turbo_encode(row, perm)
        for i, x in enumerate(enc):
            parts[i].append(x)
    arrs = [np.stack(parts[i]).astype(np.float64) for i in range(5)]
    sigma = np.sqrt(1 / (2 * 10 ** (ebn0_db / 10) / 3))
    noisy = []
    for a in arrs:
        y = (1 - 2 * a) + sigma * rng.normal(size=a.shape)
        noisy.append((2 * y / sigma ** 2))
    return bits, noisy


@pytest.mark.parametrize("mode", ["logmap", "maxlog"])
@pytest.mark.parametrize("interleaver", ["lte", "umts"])
def test_matches_golden(mode, interleaver):
    K, B = 40, 2
    bits, noisy = _encode_noisy(K, B, seed=3, ebn0_db=1.0,
                                interleaver=interleaver)
    perm = qpp_perm(K) if interleaver == "lte" else umts_perm(K)
    inv = qpp_inv(K) if interleaver == "lte" else umts_inv(K)
    scale = 0.75 if mode == "maxlog" else 1.0
    cfg = DecoderConfig(K=K, n_iters=4, mode=mode, ext_scale=scale,
                        interleaver=interleaver)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    hard, iters, L = turbo_decode(*[f32(x) for x in noisy], cfg)
    for b in range(B):
        hg, _, Lg = npr.turbo_decode(*[x[b] for x in noisy], perm, inv,
                                     n_iters=4, mode=mode, ext_scale=scale)
        assert (np.asarray(hard)[b] == hg).all()
    assert (np.asarray(iters) == 4).all()


def test_noiseless_decodes_clean():
    K, B = 104, 3
    bits, noisy = _encode_noisy(K, B, seed=4, ebn0_db=30.0)
    cfg = DecoderConfig(K=K, n_iters=2)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    hard, _, _ = turbo_decode(*[f32(x) for x in noisy], cfg)
    assert (np.asarray(hard) == bits).all()


def test_crc_early_termination():
    K, B = 104, 4
    bits, noisy = _encode_noisy(K, B, seed=5, ebn0_db=3.0, with_crc=True)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    cfg = DecoderConfig(K=K, n_iters=8, early_term="crc")
    hard, iters, _ = turbo_decode(*[f32(x) for x in noisy], cfg)
    assert (np.asarray(hard) == bits).all()
    # At 3 dB everything converges well before 8 iterations.
    assert (np.asarray(iters) < 8).all()
    # Early termination must not change the output vs full iterations.
    cfg_full = DecoderConfig(K=K, n_iters=8)
    hard_full, iters_full, _ = turbo_decode(*[f32(x) for x in noisy], cfg_full)
    assert (np.asarray(hard_full) == np.asarray(hard)).all()
    assert (np.asarray(iters_full) == 8).all()


def test_ext_scale_resolution():
    """VERDICT round-1 item 8: DecoderConfig(mode='maxlog') must resolve to
    ext_scale 0.75 without the caller passing it, through ONE resolution
    point, and behave identically to an explicit 0.75."""
    assert DecoderConfig(K=40, mode="maxlog").resolved_ext_scale() == 0.75
    assert DecoderConfig(K=40, mode="logmap").resolved_ext_scale() == 1.0
    assert DecoderConfig(K=40, mode="maxlog",
                         ext_scale=0.6).resolved_ext_scale() == 0.6
    K, B = 104, 2
    bits, noisy = _encode_noisy(K, B, seed=9, ebn0_db=0.5)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    h_default, _, L_default = turbo_decode(
        *[f32(x) for x in noisy], DecoderConfig(K=K, n_iters=4, mode="maxlog"))
    h_explicit, _, L_explicit = turbo_decode(
        *[f32(x) for x in noisy],
        DecoderConfig(K=K, n_iters=4, mode="maxlog", ext_scale=0.75))
    np.testing.assert_array_equal(np.asarray(L_default),
                                  np.asarray(L_explicit))
    # And it is NOT the unscaled decode (scale really is applied).
    _, _, L_unscaled = turbo_decode(
        *[f32(x) for x in noisy],
        DecoderConfig(K=K, n_iters=4, mode="maxlog", ext_scale=1.0))
    assert not np.array_equal(np.asarray(L_default), np.asarray(L_unscaled))


def test_sign_early_termination():
    K, B = 40, 2
    bits, noisy = _encode_noisy(K, B, seed=6, ebn0_db=4.0)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    cfg = DecoderConfig(K=K, n_iters=8, early_term="sign")
    hard, iters, _ = turbo_decode(*[f32(x) for x in noisy], cfg)
    assert (np.asarray(hard) == bits).all()
    assert (np.asarray(iters) < 8).all()
